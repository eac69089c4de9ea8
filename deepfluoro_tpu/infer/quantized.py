"""Post-training int8 quantized inference for the joint seg+landmark U-Net.

TPU v5e's MXU runs s8 x s8 -> s32 matmuls/convolutions at twice the bf16
rate, and the flagship model's MFU ceiling is conv-bound (BASELINE.md MFU
decomposition: the >=128-channel levels fill the MXU and dominate FLOPs).
This module adds an OPT-IN quantized inference path on top of any trained
checkpoint — no retraining, no reference counterpart (the reference
infers in float32, util.py:321-366):

- **w8a8 compute, float carry**: every conv's weight is quantized per
  output channel to int8; every conv *input* tensor is quantized
  per-tensor with a calibrated static scale; the conv itself runs
  s8 x s8 -> s32 on the MXU; everything between convs (ReLU, BatchNorm,
  residual adds, concats, pooling, bilinear resize, softmax) stays in
  float, so the numerics of the non-conv graph are untouched and the
  quantize/dequantize steps are cheap VPU elementwise work that XLA fuses
  into the surrounding program.
- **Symmetric quantization, no zero point**: zero padding inside a conv is
  exact (0 maps to 0), and dequantization is a single fused multiply.

The traversal below mirrors ``models/unet.py::UNet.__call__`` (itself a
port of reference train_test_code/unet.py:40-260) operating directly on
the Flax variables pytree, in one of three modes:

- ``mode='float'``      — pure float replay; bit-comparable to
                          ``model.apply`` (pinned by tests) so the mirror
                          cannot drift from the Flax module.
- ``mode='calibrate'``  — float replay that also returns the absolute max
                          of every conv-input tensor (the calibration
                          statistics).
- ``mode='quantized'``  — int8 convs using calibrated scales.

Typical use::

    scales = calibrate(model, variables, calib_projs)   # a few batches
    qvars  = quantize_weights(model, variables)
    seg, heats = quantized_apply(model, qvars, variables, scales, projs)

Supported flag surface: everything ``UNet`` supports (depth/wf/padding/
pad_mode zeros|circular/batch_norm/up_mode upconv|upsample/max_pool/
num_lands/do_res/block_depth/lands_block_depth/lands_num_1x1/do_soft_max).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import image as jimage

from deepfluoro_tpu.ops.image import center_crop

_QMAX = 127.0


def _quant_tensor(x, scale):
    """Symmetric per-tensor quantization to int8 (round-to-nearest-even,
    saturating). ``scale`` maps int units back to float: x ~ q * scale."""
    q = jnp.clip(jnp.round(x / scale), -_QMAX, _QMAX)
    return q.astype(jnp.int8)


def quantize_weight(kernel):
    """Per-output-channel symmetric int8 quantization of a conv kernel.

    Works for both layouts the model uses — Conv (kh, kw, I, O) and
    ConvTranspose (kh, kw, I, O) — the output channel is the last axis in
    both. Returns (int8 kernel, float32 per-channel scale of shape (O,)).
    """
    absmax = jnp.max(jnp.abs(kernel), axis=tuple(range(kernel.ndim - 1)))
    scale = jnp.maximum(absmax, 1e-12).astype(jnp.float32) / _QMAX
    return _quant_tensor(kernel, scale), scale


class _Engine:
    """One traversal of the U-Net graph, parameterized by mode.

    Quantization POINTS are keyed by the consuming tensor's name; a tensor
    consumed by several convs (a block input feeding both conv_0 and the
    residual 1x1) is quantized once and reused.
    """

    def __init__(
        self, model, variables, mode, scales=None, qweights=None,
        int8_points=None,
    ):
        self.model = model
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        assert mode in ("float", "calibrate", "quantized")
        self.mode = mode
        self.scales = scales or {}
        self.qweights = qweights or {}
        self.stats: dict[str, Any] = {}
        self.dtype = model.dtype
        # optional predicate key -> bool selecting which quantization
        # points actually run int8 (None = all of them). A point that opts
        # out passes the float tensor through and its conv takes the float
        # path — the mechanism behind the hybrid per-level mode (the
        # early levels' big-frame activations make the s8 conv's s32
        # accumulator traffic a net LOSS at the 2x/4x rungs, BASELINE.md
        # int8 ladder row)
        self.int8_points = int8_points

    # -- parameter access -------------------------------------------------
    def _leaf(self, tree, path):
        for part in path.split("/"):
            tree = tree[part]
        return tree

    # -- quantization point -----------------------------------------------
    def qpoint(self, key, x):
        """Mark ``x`` as a conv input. Returns a representation consumed by
        conv()/conv_transpose(): the float tensor itself (float/calibrate
        modes) or (int8 tensor, scalar scale) in quantized mode."""
        if self.mode == "calibrate":
            self.stats[key] = jnp.max(jnp.abs(x)).astype(jnp.float32)
            return x
        if self.mode == "quantized":
            if self.int8_points is not None and not self.int8_points(key):
                return x  # float pass-through: conv() takes the float path
            scale = self.scales[key]
            return (_quant_tensor(x, scale), scale)
        return x

    # -- convolutions -------------------------------------------------------
    def _float_conv(self, x, kernel, strides, padding):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            strides,
            padding,
            dimension_numbers=dn,
        )

    def conv(self, wpath, xrep, strides=(1, 1), padding="VALID", use_bias=True):
        """Conv mirroring flax.linen.Conv (kernel (kh,kw,I,O), optional
        bias) on either the float or the int8 path (an (int8, scale) tuple
        representation selects int8; a plain tensor — including a
        quantized-mode point that opted out via ``int8_points`` — runs the
        float conv from the full-precision kernels still in ``params``)."""
        if self.mode == "quantized" and isinstance(xrep, tuple):
            xq, xscale = xrep
            kq, wscale = self.qweights[wpath]
            if isinstance(padding, str) and padding == "CIRCULAR":
                kh = kq.shape[0]
                p = (kh - 1) // 2
                xq = jnp.pad(
                    xq, ((0, 0), (p, p), (p, p), (0, 0)), mode="wrap"
                )
                padding = "VALID"
            dn = jax.lax.conv_dimension_numbers(
                xq.shape, kq.shape, ("NHWC", "HWIO", "NHWC")
            )
            y = jax.lax.conv_general_dilated(
                xq, kq, strides, padding,
                dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * (xscale * wscale)
        else:
            x = xrep
            if isinstance(padding, str) and padding == "CIRCULAR":
                kh = self._leaf(self.params, wpath)["kernel"].shape[0]
                p = (kh - 1) // 2
                x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="wrap")
                padding = "VALID"
            y = self._float_conv(
                x, self._leaf(self.params, wpath)["kernel"], strides, padding
            )
        if use_bias:
            y = y + self._leaf(self.params, wpath)["bias"].astype(y.dtype)
        return y.astype(self.dtype)

    def conv_transpose(self, wpath, xrep):
        """ConvTranspose 2x2 stride 2 mirroring flax.linen.ConvTranspose."""
        if self.mode == "quantized" and isinstance(xrep, tuple):
            xq, xscale = xrep
            kq, wscale = self.qweights[wpath]
            y = jax.lax.conv_transpose(
                xq, kq, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * (xscale * wscale)
        else:
            y = jax.lax.conv_transpose(
                xrep.astype(self.dtype),
                self._leaf(self.params, wpath)["kernel"].astype(self.dtype),
                (2, 2),
                "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        y = y + self._leaf(self.params, wpath)["bias"].astype(y.dtype)
        return y.astype(self.dtype)

    # -- float-domain pieces ------------------------------------------------
    def batch_norm(self, path, x):
        """Inference-mode BatchNorm (running stats; flax epsilon 1e-5).
        Multiply order mirrors flax.linen.BatchNorm exactly (mul =
        rsqrt(var+eps) * scale first, then (x-mean) * mul + bias) so the
        float replay is bit-comparable to ``model.apply``."""
        p = self._leaf(self.params, path)
        s = self._leaf(self.batch_stats, path)
        mul = jax.lax.rsqrt(s["var"].astype(self.dtype) + 1e-5) * p[
            "scale"
        ].astype(self.dtype)
        return (
            (x - s["mean"].astype(self.dtype)) * mul
            + p["bias"].astype(self.dtype)
        ).astype(self.dtype)

    # -- blocks ---------------------------------------------------------------
    def _conv_padding(self, k):
        m = self.model
        if not m.padding:
            return "VALID"
        p = 1 if k == 3 else 0
        if m.pad_mode == "circular":
            return "CIRCULAR"
        return [(p, p), (p, p)]

    def conv_block(self, name, x):
        m = self.model
        pad = self._conv_padding(3)
        out = x
        in_rep = None
        for d in range(m.block_depth):
            rep = self.qpoint("{}/x{}".format(name, d), out)
            if d == 0:
                in_rep = rep  # the residual 1x1 consumes the same tensor
            out = self.conv("{}/conv_{}".format(name, d), rep, padding=pad)
            out = jax.nn.relu(out)
            if m.batch_norm:
                out = self.batch_norm("{}/bn_{}".format(name, d), out)
        if m.do_res:
            res = self.conv("{}/res_conv1x1".format(name), in_rep)
            if res.shape[1:3] != out.shape[1:3]:
                res = center_crop(res, (out.shape[1], out.shape[2]))
            out = out + res
        return out

    def up_block(self, name, x, bridge):
        m = self.model
        if m.up_mode == "upconv":
            rep = self.qpoint("{}/up_in".format(name), x)
            up = self.conv_transpose("{}/up_conv".format(name), rep)
        else:
            b, h, w, c = x.shape
            up = jimage.resize(
                x.astype(self.dtype), (b, h * 2, w * 2, c), method="bilinear"
            )
            rep = self.qpoint("{}/up_in".format(name), up)
            up = self.conv("{}/up_1x1".format(name), rep)
        crop = center_crop(bridge, (up.shape[1], up.shape[2]))
        out = jnp.concatenate([up, crop], axis=-1)
        return self.conv_block("{}/conv_block".format(name), out)

    # -- full forward ---------------------------------------------------------
    def forward(self, x):
        import flax.linen as nn

        m = self.model
        x = x.astype(self.dtype)

        blocks = []
        for i in range(m.depth):
            x = self.conv_block("down_{}".format(i), x)
            if i != m.depth - 1:
                blocks.append(x)
                if m.max_pool:
                    x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
                else:
                    rep = self.qpoint("downsample_{}/x".format(i), x)
                    x = self.conv(
                        "downsample_conv_{}".format(i),
                        rep,
                        strides=(2, 2),
                        padding="VALID",
                    )

        for j, _ in enumerate(reversed(range(m.depth - 1))):
            x = self.up_block("up_{}".format(j), x, blocks[-j - 1])

        rep = self.qpoint("seg/x", x)
        seg_logits = self.conv("seg_conv", rep, use_bias=False)

        if m.do_soft_max:
            seg = jax.nn.softmax(seg_logits.astype(jnp.float32), axis=-1)
        else:
            seg = seg_logits.astype(jnp.float32)

        if m.num_lands <= 0:
            return seg

        lands_feat = x
        if m.lands_block_depth > 0:
            pad = self._conv_padding(3)
            for d in range(m.lands_block_depth):
                rep = self.qpoint("lands_block/x{}".format(d), lands_feat)
                lands_feat = self.conv(
                    "lands_block_{}".format(d), rep, padding=pad
                )

        seg_crop = center_crop(
            seg_logits, (lands_feat.shape[1], lands_feat.shape[2])
        ).astype(self.dtype)
        h = jnp.concatenate([lands_feat, seg_crop], axis=-1)

        rep = self.qpoint("lands_1x1_0/x", h)
        h = self.conv("lands_1x1_0", rep, use_bias=False)
        for i in range(m.lands_num_1x1 - 1):
            rep = self.qpoint("lands_1x1_{}/x".format(i + 1), h)
            h = self.conv("lands_1x1_{}".format(i + 1), rep, use_bias=False)

        return seg, h.astype(jnp.float32)


# -- public API ---------------------------------------------------------------


def make_level_filter(float_levels: int, depth: int):
    """``int8_points`` predicate keeping the FINEST ``float_levels`` U-Net
    levels in float — the hybrid mode for the big-frame rungs, where the
    early levels' activations are so large that the s8 conv's s32
    accumulator write+read (4 B/elem vs the bf16 conv's 2 B) swamps the MXU
    savings (BASELINE.md int8 ladder row: 0.49x/0.60x at 2x/4x). Level ℓ
    halves H,W and doubles channels, so only the deep MXU-bound levels keep
    int8. Returns None (= quantize everything) for ``float_levels <= 0``.

    Point-name -> level mapping mirrors _Engine.forward's key scheme:
    ``down_i``/``downsample_i`` run at level i, ``up_j`` produces level
    depth-2-j, and the seg/landmark heads run at the finest level 0.
    """
    if float_levels <= 0:
        return None

    def level_of(key: str) -> int:
        head = key.split("/", 1)[0]
        if head.startswith("downsample_"):
            return int(head[len("downsample_"):])
        if head.startswith("down_"):
            return int(head[len("down_"):])
        if head.startswith("up_"):
            return depth - 2 - int(head[len("up_"):])
        return 0  # seg head / lands head operate at the finest level

    return lambda key: level_of(key) >= float_levels


def float_apply(model, variables, x):
    """Pure-float replay of the traversal — must match
    ``model.apply(variables, x, train=False)`` exactly (pinned by
    tests/test_quantized.py); exists so the quantized graph's structure is
    verifiable against the Flax module."""
    return _Engine(model, variables, "float").forward(x)


def calibration_stats(model, variables, x):
    """One calibration forward: returns (outputs, {point: absmax})."""
    eng = _Engine(model, variables, "calibrate")
    out = eng.forward(x)
    return out, eng.stats


def calibrate(model, variables, batches, stats_fn=None):
    """Run the float model over calibration batches, returning the static
    per-tensor activation scales {point: float32 scale}. ``batches`` is an
    iterable of prepared (B, H, W, 1) inputs (z-normed, padded — the same
    tensors the float model consumes). ``stats_fn`` optionally supplies a
    pre-jitted (variables, x) -> stats function so ensemble calibration
    compiles the program once, not once per member."""
    fwd = stats_fn or jax.jit(lambda v, x: calibration_stats(model, v, x)[1])
    agg: dict[str, Any] = {}
    for x in batches:
        stats = fwd(variables, x)
        for k, v in stats.items():
            agg[k] = jnp.maximum(agg[k], v) if k in agg else v
    return {
        k: (jnp.maximum(v, 1e-12) / _QMAX).astype(jnp.float32)
        for k, v in agg.items()
    }


def quantize_weights(model, variables):
    """Quantize every conv kernel per output channel to int8. Returns
    {param_path: (int8 kernel, float32 per-channel scale)}; biases and
    BatchNorm parameters stay float and are read from ``variables``."""
    qweights = {}

    def visit(tree, prefix):
        for name, sub in tree.items():
            path = "{}/{}".format(prefix, name) if prefix else name
            if isinstance(sub, dict) or hasattr(sub, "items"):
                if "kernel" in sub:
                    qweights[path] = quantize_weight(sub["kernel"])
                else:
                    visit(sub, path)

    visit(variables["params"], "")
    return qweights


def quantized_apply(model, qweights, variables, scales, x, int8_points=None):
    """int8 inference forward. ``variables`` supplies the float leftovers
    (biases, BatchNorm); ``scales`` comes from :func:`calibrate`;
    ``qweights`` from :func:`quantize_weights`; ``int8_points`` optionally
    restricts which points quantize (:func:`make_level_filter`)."""
    return _Engine(
        model, variables, "quantized", scales=scales, qweights=qweights,
        int8_points=int8_points,
    ).forward(x)


def quantized_member_apply(model, member, proj, int8_points=None):
    """Forward one stacked-axis slice of a quantized ensemble tree: a
    (variables, qweights, scales) triple as produced (and K-stacked) by
    :func:`prepare_quantized_ensemble`."""
    variables, qweights, scales = member
    return quantized_apply(
        model, qweights, variables, scales, proj, int8_points=int8_points
    )


def prepare_quantized_ensemble(models_and_vars, calib_inputs):
    """Calibrate and weight-quantize every ensemble member.

    ``calib_inputs``: prepared (B, H, W, 1) tensors (z-normed, padded —
    exactly what the float ensemble forward consumes). Returns the
    ``qargs`` pytree for :func:`make_quantized_ensemble_forward`: a single
    (variables, qweights, scales) tree whose leaves carry a leading
    K (net) axis — the int8 analogue of infer/ensemble.py::stack_variables,
    so map_over_nets and the 'ensemble'-axis sharding in
    parallel/sharding.py apply to it unchanged. All members must share one
    architecture (cli/test_ensemble enforces this at load time), so the
    jitted calibration program is built once and reused across members."""
    model = models_and_vars[0][0]
    stats_fn = jax.jit(lambda v, x: calibration_stats(model, v, x)[1])
    qargs = []
    for m, variables in models_and_vars:
        scales = calibrate(m, variables, calib_inputs, stats_fn=stats_fn)
        qargs.append((variables, quantize_weights(m, variables), scales))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *qargs)


def make_quantized_ensemble_forward(model, num_lands, orig_hw, float_levels=0):
    """Jitted ``fwd(qargs, proj) -> (avg_seg, avg_heats|None, labels)`` —
    the int8 analogue of infer/ensemble.py::make_ensemble_forward with
    identical averaging semantics (per-net crop + per-image heatmap min-max
    before the mean — reference util.py:345-356 — and the argmax epilogue),
    so cli/test_ensemble swaps it in behind ``--int8``. All members share
    ``model``'s architecture (the CLI enforces this at load time); the net
    axis goes through the float path's map_over_nets (unrolled for typical
    K, lax.map beyond _UNROLL_NET_LIMIT to bound compile time)."""
    from deepfluoro_tpu.infer.ensemble import map_over_nets, postprocess_net_output

    int8_points = make_level_filter(float_levels, model.depth)

    @jax.jit
    def fwd(qargs, proj):
        def one_net(member):
            out = quantized_member_apply(
                model, member, proj, int8_points=int8_points
            )
            return postprocess_net_output(out, orig_hw, num_lands)

        if num_lands > 0:
            segs, heats = map_over_nets(one_net, qargs)
        else:
            segs = map_over_nets(lambda m: one_net(m)[0], qargs)
            heats = None
        avg_seg = jnp.mean(segs, axis=0)
        avg_heats = jnp.mean(heats, axis=0) if num_lands > 0 else None
        labels = jnp.argmax(avg_seg, axis=-1).astype(jnp.uint8)
        return avg_seg, avg_heats, labels

    return fwd
