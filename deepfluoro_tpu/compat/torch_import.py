"""Import reference (PyTorch) checkpoints into this framework.

A user of the reference stack has ``.pt`` files written by train.py:473-515:
a dict with ``model-state-dict`` (torch tensors under the reference's module
naming) plus every hyperparameter. This module converts such a checkpoint
into (TrainConfig, params, batch_stats) usable by the Flax model, enabling
checkpoint-parity testing (same weights -> same argmax maps) and drop-in
migration.

Weight-layout conversions:
  Conv2d          torch (out, in, kh, kw)  -> flax (kh, kw, in, out)
  ConvTranspose2d torch (in, out, kh, kw)  -> flax (kh, kw, in, out)
  BatchNorm2d     weight/bias -> scale/bias; running stats -> batch_stats

Reference module naming (train_test_code/unet.py):
  down_path.{i}.block.{j}            conv stack (ReLU at +1, BN at +2 when
                                     batch_norm, i.e. conv indices step by 3
                                     with BN, 2 without)
  down_path.{i}.res_conv1x1          residual shortcut
  downsample_convs.{i}               learned 2x2 stride-2 downsampling
                                     (the deepest level's conv exists but is
                                     never used by forward, unet.py:92,163-171)
  up_path.{k}.up                     ConvTranspose2d ('upconv' mode)
  up_path.{k}.conv_block.block.{j}, .conv_block.res_conv1x1
  seg_conv                           1x1 class head (no bias)
  lands_block.{j}, lands_1x1.{j}     landmark head
"""

from __future__ import annotations

import numpy as np

from deepfluoro_tpu.train.config import TrainConfig


def _conv_w(t):
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def _convT_w(t):
    # flax ConvTranspose (lax.conv_transpose, transpose_kernel=False) expects
    # the spatially-flipped torch kernel: (in,out,kh,kw) -> flip(kh,kw,in,out)
    return np.ascontiguousarray(np.transpose(np.asarray(t), (2, 3, 0, 1))[::-1, ::-1])


def import_torch_state_dict(state_dict: dict, cfg: TrainConfig):
    """Convert a reference model-state-dict (name -> array-like) into
    (params, batch_stats) nested dicts matching models/unet.py."""
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in state_dict.items() if "num_batches_tracked" not in k}

    params: dict = {}
    stats: dict = {}

    conv_stride = 3 if cfg.batch_norm else 2

    def take_conv(dst: dict, name: str, src_prefix: str, bias: bool = True):
        entry = {"kernel": _conv_w(sd[src_prefix + ".weight"])}
        if bias:
            entry["bias"] = sd[src_prefix + ".bias"]
        dst[name] = entry

    def take_block(dst_params: dict, dst_stats: dict, flax_name: str, src_prefix: str):
        blk_p: dict = {}
        blk_s: dict = {}
        for d in range(cfg.block_depth):
            conv_idx = d * conv_stride
            take_conv(blk_p, f"conv_{d}", f"{src_prefix}.block.{conv_idx}")
            if cfg.batch_norm:
                bn_idx = conv_idx + 2
                blk_p[f"bn_{d}"] = {
                    "scale": sd[f"{src_prefix}.block.{bn_idx}.weight"],
                    "bias": sd[f"{src_prefix}.block.{bn_idx}.bias"],
                }
                blk_s[f"bn_{d}"] = {
                    "mean": sd[f"{src_prefix}.block.{bn_idx}.running_mean"],
                    "var": sd[f"{src_prefix}.block.{bn_idx}.running_var"],
                }
        if cfg.use_res:
            take_conv(blk_p, "res_conv1x1", f"{src_prefix}.res_conv1x1")
        dst_params[flax_name] = blk_p
        if blk_s:
            dst_stats[flax_name] = blk_s

    for i in range(cfg.depth):
        take_block(params, stats, f"down_{i}", f"down_path.{i}")
        if cfg.no_max_pool and i != cfg.depth - 1:
            take_conv(params, f"downsample_conv_{i}", f"downsample_convs.{i}")
        # NOTE: the reference allocates downsample_convs.{depth-1} but never
        # uses it (unet.py:92-93,163-171); we intentionally drop it.

    for k in range(cfg.depth - 1):
        up_p: dict = {}
        up_s: dict = {}
        up_p["up_conv"] = {
            "kernel": _convT_w(sd[f"up_path.{k}.up.weight"]),
            "bias": sd[f"up_path.{k}.up.bias"],
        }
        take_block(up_p, up_s, "conv_block", f"up_path.{k}.conv_block")
        params[f"up_{k}"] = up_p
        if up_s:
            stats[f"up_{k}"] = up_s

    params["seg_conv"] = {"kernel": _conv_w(sd["seg_conv.weight"])}

    if cfg.num_lands > 0:
        # lands_block (3x3 convs) only exists when lands_block_depth > 0;
        # the reference default (train.py) never sets it, and its depth is
        # not stored in checkpoints — infer from the state dict.
        d = 0
        while f"lands_block.{d}.weight" in sd:
            take_conv(params, f"lands_block_{d}", f"lands_block.{d}")
            d += 1
        j = 0
        while f"lands_1x1.{j}.weight" in sd:
            params[f"lands_1x1_{j}"] = {"kernel": _conv_w(sd[f"lands_1x1.{j}.weight"])}
            j += 1

    return params, stats


def import_torch_checkpoint(path: str):
    """Load a reference ``.pt`` checkpoint; returns (cfg, params, batch_stats).

    Requires the optional torch dependency (CPU is fine)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    meta = {k: v for k, v in state.items() if not k.endswith("state-dict") and k not in ("loss",)}
    cfg = TrainConfig.from_checkpoint_meta(meta)
    sd = {k: v.numpy() for k, v in state["model-state-dict"].items()}
    params, stats = import_torch_state_dict(sd, cfg)
    return cfg, params, stats
