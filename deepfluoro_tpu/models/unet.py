"""Joint segmentation + landmark-heatmap U-Net as a Flax module (NHWC).

Mirrors every architectural flag of the reference model (train_test_code/
unet.py:41-260) while being TPU-first:

- NHWC layout so XLA tiles convs straight onto the MXU;
- configurable compute dtype (bfloat16 by default-capable) with float32
  params and float32 softmax/loss math;
- the whole forward is a single fused XLA program under ``jit`` — conv +
  ReLU + BatchNorm blocks fuse without hand-scheduling.

Flag map (reference unet.py:41-45):
  depth             -> number of encoder levels
  wf                -> first level has 2**wf features
  padding           -> SAME-style conv padding (int(padding) in torch)
  pad_mode          -> 'zeros' | 'circular'
  batch_norm        -> BatchNorm after ReLU (order per unet.py:213-215)
  up_mode           -> 'upconv' (ConvTranspose 2x2 s2) | 'upsample'
                       (bilinear resize + 1x1 conv), unet.py:239-244
  max_pool          -> 2x2 max pool vs learned 2x2 strided conv
                       (unet.py:92-93,168-171)
  num_lands         -> adds the landmark-heatmap head (unet.py:106-159)
  do_res            -> residual 1x1 shortcut per conv block (unet.py:206-232)
  block_depth       -> convs per block
  lands_block_depth -> optional 3x3 conv stack halving channels
                       (unet.py:113-137)
  lands_num_1x1     -> number of bias-free 1x1 convs in the landmark head
                       (unet.py:141-159)
  do_soft_max       -> apply Softmax over classes (unet.py:103-104,178-181)

The landmark head concatenates its features with the *pre-softmax* seg
logits center-cropped to match (unet.py:187).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import image as jimage

from deepfluoro_tpu.ops.image import center_crop


def _conv_padding(padding: bool, pad_mode: str, k: int):
    """Torch pads by int(padding) pixels per side with the given mode."""
    if not padding:
        return "VALID"
    p = 1 if k == 3 else 0
    if pad_mode == "circular":
        return "CIRCULAR"
    return [(p, p), (p, p)]


class UNetConvBlock(nn.Module):
    """[Conv3x3 -> ReLU -> (BN)] x block_depth with optional residual 1x1
    shortcut (reference unet.py:196-233; BN after ReLU per unet.py:213-215)."""

    out_size: int
    padding: bool
    batch_norm: bool
    pad_mode: str = "zeros"
    do_res: bool = True
    block_depth: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.block_depth > 0
        pad = _conv_padding(self.padding, self.pad_mode, 3)
        out = x
        for d in range(self.block_depth):
            out = nn.Conv(
                self.out_size,
                kernel_size=(3, 3),
                padding=pad,
                dtype=self.dtype,
                name=f"conv_{d}",
            )(out)
            out = nn.relu(out)
            if self.batch_norm:
                out = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    name=f"bn_{d}",
                )(out)

        if self.do_res:
            res = nn.Conv(
                self.out_size,
                kernel_size=(1, 1),
                padding="VALID",
                dtype=self.dtype,
                name="res_conv1x1",
            )(x)
            # With VALID 3x3 convs the block output is smaller than the input;
            # the reference adds the residual only when padding=True (shapes
            # match there). Center-crop the shortcut for the VALID case so the
            # flag combination (do_res=True, padding=False) is well-defined.
            if res.shape[1:3] != out.shape[1:3]:
                res = center_crop(res, (out.shape[1], out.shape[2]))
            out = out + res
        return out


class UNetUpBlock(nn.Module):
    """Upsample, concat the center-cropped skip, then a conv block
    (reference unet.py:236-260; concat order [up, bridge] per :257)."""

    out_size: int
    up_mode: str
    padding: bool
    batch_norm: bool
    pad_mode: str = "zeros"
    do_res: bool = True
    block_depth: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bridge, train: bool = False):
        assert self.up_mode in ("upconv", "upsample")
        if self.up_mode == "upconv":
            up = nn.ConvTranspose(
                self.out_size,
                kernel_size=(2, 2),
                strides=(2, 2),
                padding="VALID",
                dtype=self.dtype,
                name="up_conv",
            )(x)
        else:
            b, h, w, c = x.shape
            up = jimage.resize(x, (b, h * 2, w * 2, c), method="bilinear")
            up = nn.Conv(
                self.out_size,
                kernel_size=(1, 1),
                padding="VALID",
                dtype=self.dtype,
                name="up_1x1",
            )(up)
        crop = center_crop(bridge, (up.shape[1], up.shape[2]))
        out = jnp.concatenate([up, crop], axis=-1)
        out = UNetConvBlock(
            self.out_size,
            self.padding,
            self.batch_norm,
            self.pad_mode,
            do_res=self.do_res,
            block_depth=self.block_depth,
            dtype=self.dtype,
            name="conv_block",
        )(out, train=train)
        return out


class UNet(nn.Module):
    """The full joint seg + landmark U-Net (reference unet.py:40-193)."""

    n_classes: int = 2
    depth: int = 5
    wf: int = 6
    padding: bool = False
    pad_mode: str = "zeros"
    batch_norm: bool = False
    up_mode: str = "upconv"
    max_pool: bool = True
    num_lands: int = 0
    do_res: bool = True
    block_depth: int = 2
    lands_block_depth: int = 0
    lands_num_1x1: int = 2
    do_soft_max: bool = True
    dtype: Any = jnp.float32
    # Rematerialization (jax.checkpoint) per conv/up block: activations
    # inside each block are recomputed during the backward pass instead of
    # being kept live, trading ~1 extra forward of FLOPs for O(depth) less
    # activation HBM — the lever that fits 2x/full-res frames (736^2+) or
    # larger batches on one chip. Numerically equivalent to remat=False up
    # to float reassociation in the recomputed backward (~1e-8; pinned by
    # tests/test_unet.py). No reference counterpart (torch keeps all
    # activations); checkpoint-compatible (the parameter tree is unchanged).
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, in_channels). Returns seg (B, H', W', n_classes) or
        (seg, heat_maps) when num_lands > 0 (reference unet.py:183-193)."""
        assert self.up_mode in ("upconv", "upsample")
        x = x.astype(self.dtype)

        if self.remat:
            # `train` must be static for jax.checkpoint (it selects the BN
            # branch); indices count self as 0, and call sites pass it
            # positionally — static_argnums does not cover kwargs
            ConvBlock = nn.remat(UNetConvBlock, static_argnums=(2,))
            UpBlock = nn.remat(UNetUpBlock, static_argnums=(3,))
        else:
            ConvBlock, UpBlock = UNetConvBlock, UNetUpBlock

        blocks = []
        for i in range(self.depth):
            x = ConvBlock(
                2 ** (self.wf + i),
                self.padding,
                self.batch_norm,
                self.pad_mode,
                do_res=self.do_res,
                block_depth=self.block_depth,
                dtype=self.dtype,
                name=f"down_{i}",
            )(x, train)
            if i != self.depth - 1:
                blocks.append(x)
                if self.max_pool:
                    x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
                else:
                    x = nn.Conv(
                        2 ** (self.wf + i),
                        kernel_size=(2, 2),
                        strides=(2, 2),
                        padding="VALID",
                        dtype=self.dtype,
                        name=f"downsample_conv_{i}",
                    )(x)

        for j, i in enumerate(reversed(range(self.depth - 1))):
            x = UpBlock(
                2 ** (self.wf + i),
                self.up_mode,
                self.padding,
                self.batch_norm,
                self.pad_mode,
                do_res=self.do_res,
                block_depth=self.block_depth,
                dtype=self.dtype,
                name=f"up_{j}",
            )(x, blocks[-j - 1], train)

        seg_logits = nn.Conv(
            self.n_classes,
            kernel_size=(1, 1),
            use_bias=False,
            padding="VALID",
            dtype=self.dtype,
            name="seg_conv",
        )(x)

        # Softmax in float32 for numerical stability regardless of compute dtype.
        if self.do_soft_max:
            seg = nn.softmax(seg_logits.astype(jnp.float32), axis=-1)
        else:
            seg = seg_logits.astype(jnp.float32)

        if self.num_lands <= 0:
            return seg

        lands_feat = x
        if self.lands_block_depth > 0:
            # 3x3 conv stack halving the channel count (unet.py:113-137;
            # lands_use_non_lin is hardcoded False in the reference).
            chan = x.shape[-1] // 2
            pad = _conv_padding(self.padding, self.pad_mode, 3)
            for d in range(self.lands_block_depth):
                lands_feat = nn.Conv(
                    chan,
                    kernel_size=(3, 3),
                    padding=pad,
                    dtype=self.dtype,
                    name=f"lands_block_{d}",
                )(lands_feat)

        seg_crop = center_crop(
            seg_logits, (lands_feat.shape[1], lands_feat.shape[2])
        ).astype(self.dtype)
        h = jnp.concatenate([lands_feat, seg_crop], axis=-1)

        assert self.lands_num_1x1 > 0
        n_out = self.num_lands + (self.n_classes if self.lands_num_1x1 > 1 else 0)
        h = nn.Conv(
            n_out,
            kernel_size=(1, 1),
            use_bias=False,
            padding="VALID",
            dtype=self.dtype,
            name="lands_1x1_0",
        )(h)
        for i in range(self.lands_num_1x1 - 1):
            h = nn.Conv(
                self.num_lands,
                kernel_size=(1, 1),
                use_bias=False,
                padding="VALID",
                dtype=self.dtype,
                name=f"lands_1x1_{i + 1}",
            )(h)

        heat_maps = h.astype(jnp.float32)
        return seg, heat_maps
