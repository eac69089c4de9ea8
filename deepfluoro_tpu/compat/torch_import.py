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


def _load_reference_checkpoint(path: str):
    """torch.load a reference train.py checkpoint and derive the pieces
    every consumer needs: (raw state, meta, cfg, numpy state-dict, params,
    batch_stats). The single home of the meta-exclusion rule and of the
    live-LR recovery: reference checkpoints do not store init-lr as a meta
    key (only native ones do), so the optimizer param-group LR — which the
    reference's own resume restores via optimizer.load_state_dict
    (train.py:355) — is surfaced as meta['init-lr'] (for 'cos'/'plateau'
    the restored scheduler state overrides it anyway; for 'none' and
    adam/rmsprop it IS the live LR)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    meta = {
        k: v for k, v in state.items()
        if not k.endswith("state-dict") and k not in ("loss",)
    }
    groups = (state.get("optimizer-state-dict") or {}).get("param_groups", [])
    if "init-lr" not in meta and groups and groups[0].get("lr") is not None:
        meta["init-lr"] = float(groups[0]["lr"])
    cfg = TrainConfig.from_checkpoint_meta(meta)
    sd = {k: v.numpy() for k, v in state["model-state-dict"].items()}
    params, stats = import_torch_state_dict(sd, cfg)
    return state, meta, cfg, sd, params, stats


def import_torch_checkpoint(path: str):
    """Load a reference ``.pt`` checkpoint; returns (cfg, params, batch_stats).

    Requires the optional torch dependency (CPU is fine)."""
    _, _, cfg, _, params, stats = _load_reference_checkpoint(path)
    return cfg, params, stats


_BUFFER_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")

# per-optimizer torch state fields that map onto optax state trees
# (train/step.py::make_optimizer builds the matching chains):
#   sgd     momentum_buffer -> trace      (b = m*b + (g + wd*p))
#   adam    exp_avg/exp_avg_sq -> mu/nu   (+ shared step count)
#   rmsprop square_avg -> nu; momentum_buffer -> trace
_OPT_MOMENT_FIELDS = {
    "sgd": ("momentum_buffer",),
    "adam": ("exp_avg", "exp_avg_sq"),
    "rmsprop": ("square_avg", "momentum_buffer"),
}


def _import_torch_opt_moments(state: dict, cfg: TrainConfig, sd: dict):
    """torch optimizer moments -> params-shaped trees for the optax states.

    torch's optimizer-state-dict keys per-param state by a flat index;
    param_groups list those indices in ``net.parameters()`` order, which is
    the model-state-dict key order with the BN buffers removed (both follow
    module registration order). Each moment tensor has its parameter's
    shape, so it goes through the same layout conversion as the weight it
    accompanies. Params torch has not stepped yet (lazy state init) map to
    zeros — torch's first step computes the same value optax reaches from
    its zero-initialized state.

    Returns {"kind", <field trees...>, "count"} or None when the layout is
    not the expected single-trajectory shape (caller must warn: the
    checkpoint DOES hold optimizer state we could not map)."""
    osd = state.get("optimizer-state-dict") or {}
    if not osd:
        return None
    fields = _OPT_MOMENT_FIELDS.get(cfg.optim_type, ())
    if cfg.optim_type in ("sgd", "rmsprop") and cfg.momentum <= 0:
        fields = tuple(f for f in fields if f != "momentum_buffer")
    if not fields:
        return None
    param_keys = [
        k for k in state["model-state-dict"] if not k.endswith(_BUFFER_SUFFIXES)
    ]
    order: list = []
    for g in osd.get("param_groups", []):
        order.extend(g["params"])
    if len(order) != len(param_keys):  # unexpected layout
        return None

    out = {"kind": cfg.optim_type}
    opt_state = osd.get("state", {})
    for field in fields:
        buf_sd = dict(sd)  # keep BN running stats for the importer's reads
        for slot, k in zip(order, param_keys):
            buf = opt_state.get(slot, {}).get(field)
            buf_sd[k] = np.zeros_like(sd[k]) if buf is None else buf.numpy()
        out[field], _ = import_torch_state_dict(buf_sd, cfg)

    # adam bias correction runs on a step count (identical across params;
    # torch stores it per param, optax as one scalar)
    steps = [
        int(opt_state[slot]["step"])
        for slot in order
        if slot in opt_state and "step" in opt_state[slot]
    ]
    out["count"] = max(steps) if steps else 0
    return out


def _import_torch_sched_state(state: dict, cfg: TrainConfig) -> dict:
    """Map the torch scheduler state (reference WarmRestartLR.__dict__ or
    torch ReduceLROnPlateau.state_dict()) onto this framework's scheduler
    state-dict fields (train/schedules.py; field names intentionally match
    warm_restarts_lr.py's attributes)."""
    sched = state.get("scheduler-state-dict") or {}
    if not sched:
        return {}
    osd = state.get("optimizer-state-dict") or {}
    out: dict = {}
    if cfg.lr_sched_meth == "cos":
        for k in (
            "lr_min", "cur_run_period_epochs", "next_restart_epoch",
            "last_restart_epoch", "period_growth_factor", "cur_epoch_ratio",
            "just_restarted", "last_epoch",
        ):
            if k in sched:
                out[k] = sched[k]
        if sched.get("base_lrs"):
            out["base_lr"] = float(sched["base_lrs"][0])
    elif cfg.lr_sched_meth == "plateau":
        for k in (
            "factor", "patience", "cooldown", "threshold", "best",
            "num_bad_epochs", "cooldown_counter",
        ):
            if k in sched:
                out[k] = sched[k]
        if sched.get("min_lrs"):
            out["min_lr"] = float(sched["min_lrs"][0])
        groups = osd.get("param_groups", [])
        if groups and groups[0].get("lr") is not None:
            out["lr"] = float(groups[0]["lr"])
    return out


def _idx_list(v):
    if v is None:
        return []
    return [int(i) for i in np.asarray(v).reshape(-1)]


def torch_checkpoint_to_native(path: str) -> dict:
    """Load a reference train.py checkpoint (train.py:473-515) as the SAME
    payload structure train.checkpoint.load_checkpoint returns, so fit()
    resumes training from a reference user's .pt file: weights + BN stats
    (layout-converted), the optimizer's moment trees (under the extra
    ``torch-opt-moments`` key — grafted into the optax state by the loop:
    SGD/RMSprop momentum -> trace, Adam exp_avg/exp_avg_sq/step -> mu/nu/
    count, RMSprop square_avg -> nu), LR-scheduler state, epoch /
    best-valid-loss / restart count, live LR, and the train/valid split
    indices."""
    state, meta, cfg, sd, params, stats = _load_reference_checkpoint(path)

    bvl = state.get("best-valid-loss")
    bvl = np.nan if bvl is None else float(bvl)
    loss = state.get("loss")
    try:
        loss = -1.0 if loss is None else float(loss)
    except (TypeError, ValueError):  # e.g. a non-scalar tensor
        loss = -1.0

    return {
        "meta": meta,
        "epoch": int(state.get("epoch", 0)),
        "loss": loss,
        "best-valid-loss": bvl,
        "lrs-num-restarts": int(state.get("lrs-num-restarts", 0)),
        "model-state-dict": {"params": params, "batch_stats": stats or {}},
        # not representable in the native optax serialized form; the loop
        # rebuilds opt_state from torch-opt-moments instead
        "optimizer-state-dict": {},
        "torch-opt-moments": _import_torch_opt_moments(state, cfg, sd),
        # distinguishes "nothing to import" from "import failed" for the
        # loop's logging (a torch checkpoint always has SOME optimizer
        # state unless saved before any step)
        "torch-opt-present": bool(
            (state.get("optimizer-state-dict") or {}).get("state")
        ),
        "scheduler-state-dict": _import_torch_sched_state(state, cfg),
        "train-idx": _idx_list(state.get("train-idx")),
        "valid-idx": _idx_list(state.get("valid-idx")),
    }
