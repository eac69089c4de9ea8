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


# ---------------------------------------------------------------------------
# export: this framework's checkpoints -> reference .pt files
# ---------------------------------------------------------------------------

def _conv_w_inv(k):
    return np.ascontiguousarray(np.transpose(np.asarray(k), (3, 2, 0, 1)))


def _convT_w_inv(k):
    # inverse of _convT_w: unflip spatial, (kh,kw,in,out) -> (in,out,kh,kw)
    return np.ascontiguousarray(
        np.transpose(np.asarray(k)[::-1, ::-1], (2, 3, 0, 1))
    )


def _export_entries(cfg: TrainConfig, params: dict):
    """Yield (torch_name_prefix, kind, flax_path) in the reference UNet's
    module REGISTRATION order (unet.py:79-159: downsample_convs assigned
    before down_path; res_conv1x1 before block within UNetConvBlock) — the
    order torch's state_dict() and parameters() both follow, which the
    optimizer param indices key into.

    kinds: conv (weight+bias), conv_nobias, convT, bn, dead_conv (the
    never-used deepest downsample conv the reference allocates,
    unet.py:92-93 — synthesized as zeros on export since import drops it).
    """
    stride = 3 if cfg.batch_norm else 2

    def block_entries(torch_prefix, flax_prefix):
        if cfg.use_res:
            yield ("{}.res_conv1x1".format(torch_prefix), "conv",
                   flax_prefix + ("res_conv1x1",))
        for d in range(cfg.block_depth):
            ci = d * stride
            yield ("{}.block.{}".format(torch_prefix, ci), "conv",
                   flax_prefix + ("conv_{}".format(d),))
            if cfg.batch_norm:
                yield ("{}.block.{}".format(torch_prefix, ci + 2), "bn",
                       flax_prefix + ("bn_{}".format(d),))

    if cfg.no_max_pool:
        for i in range(cfg.depth):
            if i < cfg.depth - 1:
                yield ("downsample_convs.{}".format(i), "conv",
                       ("downsample_conv_{}".format(i),))
            else:
                yield ("downsample_convs.{}".format(i), "dead_conv", None)
    for i in range(cfg.depth):
        yield from block_entries("down_path.{}".format(i), ("down_{}".format(i),))
    for k in range(cfg.depth - 1):
        yield ("up_path.{}.up".format(k), "convT", ("up_{}".format(k), "up_conv"))
        yield from block_entries(
            "up_path.{}.conv_block".format(k), ("up_{}".format(k), "conv_block")
        )
    yield ("seg_conv", "conv_nobias", ("seg_conv",))
    if cfg.num_lands > 0:
        d = 0
        while "lands_block_{}".format(d) in params:
            yield ("lands_block.{}".format(d), "conv",
                   ("lands_block_{}".format(d),))
            d += 1
        j = 0
        while "lands_1x1_{}".format(j) in params:
            yield ("lands_1x1.{}".format(j), "conv_nobias",
                   ("lands_1x1_{}".format(j),))
            j += 1


def _tree_get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def export_torch_state_dict(cfg: TrainConfig, params: dict, batch_stats: dict):
    """(params, batch_stats) -> a reference-named torch state dict (numpy
    values; caller tensors them) plus the ordered parameter paths (the
    ``net.parameters()`` order, for optimizer-state export)."""
    sd: dict = {}
    param_paths: list = []  # (flax_path, transform) per torch PARAMETER

    for prefix, kind, path in _export_entries(cfg, params):
        if kind == "dead_conv":
            c = 2 ** (cfg.init_feats_exp + cfg.depth - 1)
            sd[prefix + ".weight"] = np.zeros((c, c, 2, 2), np.float32)
            sd[prefix + ".bias"] = np.zeros((c,), np.float32)
            param_paths.append(None)
            param_paths.append(None)
        elif kind in ("conv", "conv_nobias"):
            leaf = _tree_get(params, path)
            sd[prefix + ".weight"] = _conv_w_inv(leaf["kernel"])
            param_paths.append((path + ("kernel",), _conv_w_inv))
            if kind == "conv":
                sd[prefix + ".bias"] = np.asarray(leaf["bias"])
                param_paths.append((path + ("bias",), np.asarray))
        elif kind == "convT":
            leaf = _tree_get(params, path)
            sd[prefix + ".weight"] = _convT_w_inv(leaf["kernel"])
            sd[prefix + ".bias"] = np.asarray(leaf["bias"])
            param_paths.append((path + ("kernel",), _convT_w_inv))
            param_paths.append((path + ("bias",), np.asarray))
        elif kind == "bn":
            leaf = _tree_get(params, path)
            stats = _tree_get(batch_stats, path)
            sd[prefix + ".weight"] = np.asarray(leaf["scale"])
            sd[prefix + ".bias"] = np.asarray(leaf["bias"])
            sd[prefix + ".running_mean"] = np.asarray(stats["mean"])
            sd[prefix + ".running_var"] = np.asarray(stats["var"])
            # count unknown (torch only consults it with momentum=None;
            # the reference uses the default momentum)
            sd[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)
            param_paths.append((path + ("scale",), np.asarray))
            param_paths.append((path + ("bias",), np.asarray))
    return sd, param_paths


def _export_torch_opt_state(cfg, opt_state, param_paths, lr):
    """Typed optax opt_state -> a torch optimizer state dict the reference's
    ``optimizer.load_state_dict`` accepts (train.py:355), with each moment
    converted through its parameter's layout transform."""
    import optax

    moment_map: dict = {}  # torch field -> params-shaped tree

    def collect(s):
        if isinstance(s, optax.TraceState):
            moment_map["momentum_buffer"] = s.trace
        elif isinstance(s, optax.ScaleByAdamState):
            moment_map["exp_avg"] = s.mu
            moment_map["exp_avg_sq"] = s.nu
            moment_map["step"] = int(s.count)
        elif isinstance(s, optax.ScaleByRmsState):
            moment_map["square_avg"] = s.nu
        elif isinstance(s, tuple) and hasattr(s, "_fields"):  # NamedTuple
            for f in s._fields:
                collect(getattr(s, f))
        elif isinstance(s, tuple):
            for x in s:
                collect(x)

    collect(opt_state)
    step = moment_map.pop("step", None)

    state: dict = {}
    for idx, pp in enumerate(param_paths):
        if pp is None:  # the dead downsample conv: no optimizer state
            continue
        path, transform = pp
        entry = {}
        for field, tree in moment_map.items():
            entry[field] = transform(_tree_get(tree, path[:-1])[path[-1]])
        if entry and cfg.optim_type in ("adam", "rmsprop"):
            # torch's Adam/RMSprop __setstate__ dereferences per-param
            # 'step' for every non-empty state entry; RMSprop tracks it but
            # never reads it in the update (no bias correction), so 0 is
            # functionally identical when optax carries no count.
            entry["step"] = step if step is not None else 0
        if entry:
            state[idx] = entry

    group = {
        "lr": float(lr),
        "weight_decay": float(cfg.wgt_decay),
        "params": list(range(len(param_paths))),
    }
    if cfg.optim_type == "sgd":
        group.update(momentum=float(cfg.momentum), dampening=0.0,
                     nesterov=bool(cfg.nesterov))
    elif cfg.optim_type == "adam":
        group.update(betas=(0.9, 0.999), eps=1e-8, amsgrad=False)
    else:
        group.update(alpha=0.99, eps=1e-8, momentum=float(cfg.momentum),
                     centered=False)
    return {"state": state, "param_groups": [group]}


def _export_torch_sched_state(cfg: TrainConfig, sched: dict, lr: float):
    """Inverse of _import_torch_sched_state; torch schedulers load via
    __dict__.update so our field names (== warm_restarts_lr.py attributes)
    carry over, plus the torch-side list-valued fields."""
    if not sched:
        # {} (not None): train.py:355 load_state_dicts unconditionally when a
        # scheduler exists, and __dict__.update({}) is a harmless no-op while
        # update(None) raises. Light (params-only) checkpoints hit this.
        return {}
    out = dict(sched)
    if cfg.lr_sched_meth == "cos":
        out["base_lrs"] = [float(out.pop("base_lr", cfg.init_lr))]
    elif cfg.lr_sched_meth == "plateau":
        out["min_lrs"] = [float(out.pop("min_lr", 0.0))]
        out.pop("lr", None)
        out.setdefault("mode", "min")
        out.setdefault("threshold_mode", "rel")
        out.setdefault("mode_worse", float("inf"))
        out.setdefault("eps", 1e-8)
        out.setdefault("last_epoch", 0)
    return out


def export_torch_checkpoint(native, out_path: str, sample_hw: int | None = None):
    """Write a checkpoint the REFERENCE stack loads as its own: test_ensemble
    rebuilds the net from it (test_ensemble.py:61-107) and train.py RESUMES
    from it (train.py:191-361) — model weights/BN stats in reference naming
    and layouts, optimizer moments (reverse of the import mapping),
    scheduler state, and every save_net meta key (train.py:473-515).

    ``native``: path to a native checkpoint file, or its loaded payload.
    Requires torch (CPU is fine)."""
    import torch

    from deepfluoro_tpu.train.checkpoint import load_checkpoint, restore_tree
    from deepfluoro_tpu.train.step import make_train_state
    import jax

    payload = load_checkpoint(native) if isinstance(native, str) else native
    cfg = TrainConfig.from_checkpoint_meta(payload["meta"])
    params = payload["model-state-dict"]["params"]
    stats = payload["model-state-dict"].get("batch_stats") or {}

    sd, param_paths = export_torch_state_dict(cfg, params, stats)

    sched = payload.get("scheduler-state-dict") or {}
    # live LR: from the scheduler where it tracks one, else the last LR the
    # optimizer ran with (inject_hyperparams stores it), else init-lr
    lr = cfg.init_lr
    if cfg.lr_sched_meth == "plateau" and "lr" in sched:
        lr = float(sched["lr"])

    if payload.get("optimizer-state-dict"):
        # rebuild the typed opt_state structure to walk its states; eval_shape
        # gives the same pytree for free (no init forward on the host)
        dim = sample_hw or max(int(cfg.proj_unet_dim), 2 ** (cfg.depth + 2))
        tmpl_opt = jax.eval_shape(
            lambda: make_train_state(cfg, jax.random.PRNGKey(0), (dim, dim))[1].opt_state
        )
        opt_state = restore_tree(tmpl_opt, payload["optimizer-state-dict"])
        try:
            lr = float(opt_state.hyperparams["learning_rate"])
        except (AttributeError, KeyError, TypeError):
            pass
        opt_sd = _export_torch_opt_state(cfg, opt_state, param_paths, lr)
    else:
        opt_sd = _export_torch_opt_state(cfg, None, param_paths, lr)

    bvl = payload.get("best-valid-loss")
    ck = dict(cfg.to_checkpoint_meta())
    # native-only meta keys would confuse nothing (the reference reads by
    # key), but drop the ones whose names it never defined anyway
    for k in ("light-best-nets", "compute-dtype", "remat", "dup-lr-flip"):
        ck.pop(k, None)
    ck.update({
        "epoch": int(payload.get("epoch", 0)),
        # copy=True: msgpack-restored arrays are read-only views and torch
        # tensors must own writable memory
        "model-state-dict": {k: torch.from_numpy(np.array(v, copy=True))
                             for k, v in sd.items()},
        "optim-type": cfg.optim_type,
        "optimizer-state-dict": {
            "state": {
                i: {f: (torch.tensor(float(v)) if f == "step"
                        else torch.from_numpy(np.array(v, copy=True)))
                    for f, v in e.items()}
                for i, e in opt_sd["state"].items()
            },
            "param_groups": opt_sd["param_groups"],
        },
        "scheduler-state-dict": _export_torch_sched_state(cfg, sched, lr),
        # the reference stores the live loss TENSOR and calls .item() on it
        # when loading (test_ensemble.py:92)
        "loss": torch.tensor(float(payload.get("loss", -1.0))),
        "best-valid-loss": (float("inf") if bvl is None or np.isnan(bvl)
                            else float(bvl)),
        "lrs-num-restarts": int(payload.get("lrs-num-restarts", 0)),
        "train-idx": list(payload.get("train-idx") or []),
        "valid-idx": list(payload.get("valid-idx") or []),
    })
    tmp = "{}.tmp".format(out_path)
    torch.save(ck, tmp)
    import shutil

    shutil.move(tmp, out_path)
    return out_path
