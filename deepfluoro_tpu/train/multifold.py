"""Simultaneous leave-one-specimen-out fold training — the FULL paper recipe.

The reference's 6-fold ensemble is produced by six sequential complete
training runs (train_test_code/Readme.md:14-17: plateau LR, best-valid
checkpointing, resume, up to 500 epochs — one train.py invocation per
held-out specimen, train.py:376-577). On TPU all K folds instead update in
one compiled program per step, combined with ``lax.map`` over the fold axis
(measured faster than a fold-axis vmap: per-fold weights make the convs
grouped, which the MXU tiles badly — see BASELINE.md's combinator study),
and the fold axis can additionally be sharded across devices over an
'ensemble' mesh axis (shard_map; folds are independent so no collectives
are needed).

TPU-first memory design: all K folds gather from ONE shared device-resident
copy of the archive (the union of all specimens). Each fold's identity lives
purely in its index sets — which global indices it may train/validate on —
so K folds cost one dataset upload instead of K overlapping copies, and a
training step is a single device dispatch: (K, B) index gather + device-side
augmentation + K-fold fused update (matching step.py::make_fused_train_step).

``fit_multifold`` mirrors ``loop.fit`` exactly: per-fold train/valid split,
plateau/cos/none LR scheduling (K host state machines feeding a (K,) LR
vector), per-fold best-valid + periodic checkpoints (standard self-describing
files consumable by test_ensemble), full resume, wall-clock budget, SIGTERM
graceful exit.

Documented divergence from K sequential runs: folds train in lockstep, so
the per-epoch step count is shared — ceil(max_k n_k / batch) full batches
per epoch, with smaller folds drawing from reshuffled wrap-around streams
(every fold sees at least one full pass per epoch; sequential reference runs
instead end each epoch exactly at their own dataset boundary).
"""

from __future__ import annotations

import os
import signal
import time

import numpy as np
import jax
import jax.numpy as jnp

from deepfluoro_tpu.data.augment import AugmentConfig, prepare_batch
from deepfluoro_tpu.data.hdf5 import FluoroData, load_dataset, specimen_counts
from deepfluoro_tpu.data.pipeline import prefetch_sequence
from deepfluoro_tpu.train.checkpoint import (
    AsyncCheckpointer,
    load_checkpoint,
    restore_tree,
)
from deepfluoro_tpu.train.config import TrainConfig, build_model
from deepfluoro_tpu.train.schedules import ReduceLROnPlateau, WarmRestartLR
from deepfluoro_tpu.train.step import (
    TrainState,
    grad_and_update,
    make_eval_losses_fn,
    make_loss_fn,
    make_optimizer,
    make_train_state,
)
from deepfluoro_tpu.utils.io import RunningFloatWriter


def make_multifold_state(cfg: TrainConfig, num_folds: int, rng_key, sample_shape):
    """K independently initialized TrainStates stacked along a fold axis."""
    keys = jax.random.split(rng_key, num_folds)
    model = build_model(cfg)
    states = []
    for k in range(num_folds):
        _, st = make_train_state(cfg, keys[k], sample_shape)
        states.append(st)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    return model, stacked


@jax.jit
def _fold_slice(stacked_state, k):
    return jax.tree.map(lambda x: x[k], stacked_state)


def fold_state(stacked_state, k: int):
    """Extract fold k's variables from the stacked state (for checkpointing
    each fold as a standard self-describing checkpoint). One jitted dispatch
    for the whole tree — an eager per-leaf x[k] is hundreds of round trips,
    which matters on remote-device transports."""
    return _fold_slice(stacked_state, jnp.int32(k))


def _make_fold_extractor(mesh):
    """Fold extraction for checkpointing on a multi-PROCESS mesh: fold k's
    shard may live entirely on another process's devices, so a plain jitted
    slice would hand the (process-0) writer an array it cannot fetch. This
    variant pins replicated out_shardings — the slice compiles to a gather
    that every process dispatches in lockstep, after which each host holds
    a local replica and the writer's host fetch is collective-free (the
    same replicated-read contract AsyncCheckpointer.save documents)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    sl = jax.jit(
        lambda s, k: jax.tree.map(lambda x: x[k], s), out_shardings=repl
    )
    return lambda stacked, k: sl(stacked, jnp.int32(k))


def _shard_over_folds(mesh, fn, in_folded, num_outputs: int, replicate_outputs=None):
    """Wrap a multifold step/eval function in a shard_map over the
    'ensemble' mesh axis. Folds are fully independent, so each device simply
    runs its K/n folds' lax.map program — the only collective is the tiny
    loss all-gather below. (GSPMD alone mispartitions the grouped convs a
    vmapped ensemble lowers to; see parallel/sharding.py — shard_map
    sidesteps that.)

    ``in_folded``: one bool per positional argument — True means the
    argument carries a leading (K,) fold axis and is sharded over
    'ensemble'; False means it is replicated (the shared union dataset
    arrays). A None argument (archive without lands) is an EMPTY pytree, so
    its spec maps over zero leaves and the shard_map boundary passes it
    through — pinned by tests/test_multifold.py (the lands-free sharded
    run).

    ``replicate_outputs``: one bool per output — True all-gathers that
    output's leading fold axis over 'ensemble' inside the program, so the
    full (K, ...) value lands replicated on every device. The loss vectors
    take this path: the host loop reads them each step, and under
    jax.distributed a fold-sharded array would not be addressable on the
    processes that do not own the fold (loop.fit's losses are replicated by
    construction; this keeps multifold's drain pattern identical on a pod).
    Cost: a (K,)-element ICI gather per step — noise next to the conv work.
    Outputs default to fold-sharded."""
    from jax.sharding import PartitionSpec as P

    fold_spec = P("ensemble")
    in_specs = tuple(fold_spec if f else P() for f in in_folded)
    if replicate_outputs is None:
        replicate_outputs = (False,) * num_outputs
    assert len(replicate_outputs) == num_outputs

    if any(replicate_outputs):
        inner = fn

        def fn(*args):
            outs = inner(*args)
            if num_outputs == 1:
                outs = (outs,)
            outs = tuple(
                jax.lax.all_gather(o, "ensemble", axis=0, tiled=True) if r else o
                for o, r in zip(outs, replicate_outputs)
            )
            return outs if num_outputs > 1 else outs[0]

    specs = tuple(P() if r else fold_spec for r in replicate_outputs)
    out_specs = specs if num_outputs > 1 else specs[0]
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )


def make_fused_multifold_step(cfg: TrainConfig, model, tx, aug_cfg, mesh=None):
    """One-dispatch-per-step K-fold training.

    Returns step(stacked_state, projs_all, segs_all, lands_all,
    idx (K, B) int32, step_seeds (K,) int32, lr_vec (K,) float32)
    -> (stacked_state, losses (K,)).

    The dataset arrays are the SHARED union archive; each fold's (B,) index
    row selects its own batch. Gather + augmentation + value_and_grad +
    optax update all fuse into one XLA program mapped over folds.
    """
    loss_fn = make_loss_fn(cfg, model)

    def step_impl(stacked_state, projs_all, segs_all, lands_all, idx, step_seeds, lr_vec):
        def one_fold(args):
            state, fold_idx, seed, lr = args
            projs = jnp.take(projs_all, fold_idx, axis=0)
            segs = jnp.take(segs_all, fold_idx, axis=0) if segs_all is not None else None
            lands = jnp.take(lands_all, fold_idx, axis=0) if lands_all is not None else None
            key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), seed)
            prepared = prepare_batch(aug_cfg, key, projs, segs, lands)
            return grad_and_update(
                loss_fn, tx, state,
                prepared["proj"], prepared.get("seg"), prepared.get("heats"), lr,
            )

        # lax.map, NOT vmap: per-fold weights turn vmapped convs into grouped
        # convolutions, which the MXU tiles poorly — measured on v5e at the
        # paper config (K=6, batch 5): vmap ~150 ms/step vs lax.map ~112-135
        # ms (tunnel-noise band), the latter matching K separate single-fold
        # dispatches. lax.map keeps the one-dispatch / shardable stacked
        # design at sequential-dispatch speed; sharding folds across chips
        # (1 local fold = plain convs) multiplies throughput from there.
        return jax.lax.map(one_fold, (stacked_state, idx, step_seeds, lr_vec))

    if mesh is not None:
        # stacked_state + 3 replicated dataset arrays + idx/seeds/lrs per
        # fold; losses replicated so every host can drain them
        step_impl = _shard_over_folds(
            mesh, step_impl, (True, False, False, False, True, True, True), 2,
            replicate_outputs=(False, True),
        )
    return jax.jit(step_impl, donate_argnums=(0,))


def make_multifold_eval_step(cfg: TrainConfig, model, aug_cfg, num_lands_for_loss=None, mesh=None):
    """Vmapped K-fold validation: eval(stacked_state, projs_all, segs_all,
    lands_all, idx (K, B)) -> (K, B) per-sample losses (padded entries are
    the caller's to mask)."""
    eval_losses = make_eval_losses_fn(cfg, model, num_lands_for_loss)

    def eval_impl(stacked_state, projs_all, segs_all, lands_all, idx):
        def one_fold(args):
            state, fold_idx = args
            projs = jnp.take(projs_all, fold_idx, axis=0)
            segs = jnp.take(segs_all, fold_idx, axis=0) if segs_all is not None else None
            lands = jnp.take(lands_all, fold_idx, axis=0) if lands_all is not None else None
            prepared = prepare_batch(aug_cfg, jax.random.PRNGKey(0), projs, segs, lands)
            return eval_losses(
                state, prepared["proj"], prepared.get("seg"), prepared.get("heats")
            )

        # lax.map for the same grouped-conv reason as the train step
        return jax.lax.map(one_fold, (stacked_state, idx))

    if mesh is not None:
        eval_impl = _shard_over_folds(
            mesh, eval_impl, (True, False, False, False, True), 1,
            replicate_outputs=(True,),
        )
    return jax.jit(eval_impl)


def _fold_axis_xs(stacked_state, projs_b, segs_b, lands_b, extra: dict):
    """Assemble the lax.map xs dict from possibly-None batch arrays: every
    entry carries a leading (K,) fold axis; None arrays are simply absent
    (dict pytrees keep lax.map/shard_map happy without positional Nones)."""
    xs = {"state": stacked_state, "projs": projs_b}
    if segs_b is not None:
        xs["segs"] = segs_b
    if lands_b is not None:
        xs["lands"] = lands_b
    xs.update(extra)
    return xs


def make_streaming_multifold_step(cfg: TrainConfig, model, tx, aug_cfg, mesh=None):
    """K-fold train step for HOST-resident union archives (too large for
    HBM: 2x / full-res multifold training). Consumes pre-assembled (K, B,
    ...) batches instead of gathering from device-resident arrays; matches
    :func:`make_fused_multifold_step` bit-for-bit otherwise (same lax.map
    fold combinator, same per-fold PRNG fold-in), so streaming and
    device-resident multifold runs share one training trajectory.

    step(stacked_state, projs_b (K,B,H,W), segs_b, lands_b,
    step_seeds (K,), lr_vec (K,)) -> (stacked_state, losses (K,)).
    """
    loss_fn = make_loss_fn(cfg, model)

    def step_impl(stacked_state, projs_b, segs_b, lands_b, step_seeds, lr_vec):
        def one_fold(args):
            key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), args["seed"])
            prepared = prepare_batch(
                aug_cfg, key, args["projs"], args.get("segs"), args.get("lands")
            )
            return grad_and_update(
                loss_fn, tx, args["state"],
                prepared["proj"], prepared.get("seg"), prepared.get("heats"),
                args["lr"],
            )

        xs = _fold_axis_xs(
            stacked_state, projs_b, segs_b, lands_b,
            {"seed": step_seeds, "lr": lr_vec},
        )
        return jax.lax.map(one_fold, xs)

    if mesh is not None:
        # every positional arg carries the leading fold axis (streamed
        # batches are per-fold too) — shard them all over 'ensemble'
        step_impl = _shard_over_folds(
            mesh, step_impl, (True,) * 6, 2, replicate_outputs=(False, True)
        )
    return jax.jit(step_impl, donate_argnums=(0,))


def make_streaming_multifold_eval_step(
    cfg: TrainConfig, model, aug_cfg, num_lands_for_loss=None, mesh=None
):
    """Streaming counterpart of :func:`make_multifold_eval_step`:
    eval(stacked_state, projs_b (K,B,...), segs_b, lands_b) -> (K, B)
    per-sample losses."""
    eval_losses = make_eval_losses_fn(cfg, model, num_lands_for_loss)

    def eval_impl(stacked_state, projs_b, segs_b, lands_b):
        def one_fold(args):
            prepared = prepare_batch(
                aug_cfg, jax.random.PRNGKey(0),
                args["projs"], args.get("segs"), args.get("lands"),
            )
            return eval_losses(
                args["state"], prepared["proj"], prepared.get("seg"),
                prepared.get("heats"),
            )

        xs = _fold_axis_xs(stacked_state, projs_b, segs_b, lands_b, {})
        return jax.lax.map(one_fold, xs)

    if mesh is not None:
        eval_impl = _shard_over_folds(
            mesh, eval_impl, (True,) * 4, 1, replicate_outputs=(True,)
        )
    return jax.jit(eval_impl)


def save_fold_checkpoints(
    cfg: TrainConfig,
    stacked_state,
    paths: list[str],
    epoch: int = 0,
    last_losses=None,
) -> None:
    """Write each fold as a standard self-describing checkpoint, loadable by
    test_ensemble / load_net_from_checkpoint."""
    from deepfluoro_tpu.train.checkpoint import save_checkpoint

    for k, path in enumerate(paths):
        st = fold_state(stacked_state, k)
        save_checkpoint(
            path,
            meta=cfg.to_checkpoint_meta(),
            params=st.params,
            batch_stats=st.batch_stats,
            opt_state=st.opt_state,
            epoch=epoch,
            last_loss=None if last_losses is None else float(last_losses[k]),
        )


class _FoldStream:
    """Infinite shuffled index stream over a fold's training indices.
    Reshuffles on exhaustion so lockstep epochs can draw full batches past
    the fold's own dataset boundary (wrap-around)."""

    def __init__(self, indices: np.ndarray, seed: int):
        self._indices = np.asarray(indices, np.int32)
        self._rng = np.random.default_rng(seed)
        self._perm = self._rng.permutation(self._indices)
        self._pos = 0

    def take(self, n: int) -> np.ndarray:
        out = []
        while n > 0:
            avail = len(self._perm) - self._pos
            if avail == 0:
                self._perm = self._rng.permutation(self._indices)
                self._pos = 0
                avail = len(self._perm)
            grab = min(n, avail)
            out.append(self._perm[self._pos : self._pos + grab])
            self._pos += grab
            n -= grab
        return np.concatenate(out)


def _split_pool(pool: np.ndarray, split: float, seed: int):
    """Random train/valid split of a fold's index pool — delegates to the
    SHARED split core (data.hdf5.split_indices) so fit() and fit_multifold
    can never drift apart in split semantics."""
    from deepfluoro_tpu.data.hdf5 import split_indices

    t, v = split_indices(len(pool), split, seed)
    return pool[t], pool[v]


def fit_multifold(
    data_file_path: str,
    pats: list[int],
    cfg: TrainConfig,
    checkpoint_prefix: str = "zz_fold_checkpoint",
    best_prefix: str = "zz_fold_best",
    train_loss_txt_prefix: str | None = None,
    valid_loss_txt_prefix: str | None = None,
    mesh=None,
    stream_data: bool = False,
    verbose: bool = True,
):
    """Train all K = len(pats) leave-one-specimen-out folds simultaneously
    with the complete reference recipe (train.py:376-577 per fold).

    Fold k holds out pats[k] and trains on the remaining specimens, with its
    own cfg.train_valid_split validation split. Writes, per fold:
      <checkpoint_prefix>_specXX.pt   periodic + on-exit checkpoint
      <best_prefix>_specXX.pt         best-validation network
      <cfg.save_restart_net_prefix>_specXX_RR.pt  pre-warm-restart snapshot
        RR (cos schedule; gated by cfg.save_after_n_restarts — reference
        train.py:533-542)
    all standard self-describing checkpoints. Resume restores every fold
    (all-or-nothing: all fold checkpoints must exist and agree on the epoch).

    ``stream_data=True`` keeps the union archive in host memory and streams
    prefetched per-fold (K, B) batches to the device — for archives too
    large for HBM (2x / full-res multifold); the training trajectory matches
    the device-resident mode exactly (same index streams, seeds, and fused
    program modulo the gather).

    Returns dict(model=..., stacked_state=..., cfg=..., epoch=...,
    best_valid_losses=(K,), fold_pats=pats).
    """

    def log(msg):
        if verbose and jax.process_index() == 0:
            print(msg, flush=True)

    k_folds = len(pats)
    assert k_folds >= 2, "need at least two specimens for leave-one-out"
    assert 0.0 < cfg.train_valid_split < 1.0, (
        "fit_multifold validates on a per-fold split of the training pool "
        "(the held-out specimen is the TEST set); set cfg.train_valid_split"
    )
    multiproc = jax.process_count() > 1
    if multiproc:
        # the pod path: the fold axis shards over an 'ensemble' mesh that
        # spans every process (each host trains its folds; the per-step loss
        # all-gather and the checkpoint-time fold gathers are the only
        # cross-host traffic). Same machinery loop.fit proved out: per-epoch
        # stop agreement, process-0 single-writer files, lockstep saves.
        assert mesh is not None and "ensemble" in mesh.axis_names, (
            "multi-process fit_multifold requires an 'ensemble' device mesh "
            "(cli.train_folds --ensemble-devices with --num-processes)"
        )
        procs_on_mesh = {d.process_index for d in mesh.devices.flat}
        assert len(procs_on_mesh) == jax.process_count(), (
            "the ensemble mesh spans only {} of {} processes — every process "
            "must own mesh devices (it runs the lockstep fold program)".format(
                len(procs_on_mesh), jax.process_count()
            )
        )
    if mesh is not None:
        ens_size = int(mesh.shape["ensemble"])
        assert k_folds % ens_size == 0, (
            "{} folds do not shard evenly over the {}-way 'ensemble' "
            "mesh axis".format(k_folds, ens_size)
        )

    ck_paths = ["{}_spec{:02d}.pt".format(checkpoint_prefix, p) for p in pats]
    best_paths = ["{}_spec{:02d}.pt".format(best_prefix, p) for p in pats]

    # ----- resume ---------------------------------------------------------
    have_ck = [os.path.exists(p) for p in ck_paths]
    if multiproc:
        # every process restores independently (process 0 wrote the files,
        # but ALL must see them: the restored stacked state is device_put
        # fold-sharded, which does not verify cross-process equality, and
        # the meta overrides cfg). Requires shared storage; fail loudly on
        # disagreement instead of silently split-braining (loop.fit's rule).
        from jax.experimental import multihost_utils

        seen = np.asarray(
            multihost_utils.process_allgather(
                np.asarray([1 if h else 0 for h in have_ck], np.int32)
            )
        ).reshape(jax.process_count(), k_folds)
        assert (seen == seen[0]).all(), (
            "fold checkpoints visible on some processes but not others — "
            "multi-process resume requires shared storage (per-process "
            "visibility: {})".format(seen.tolist())
        )
    resume = all(have_ck)
    if any(have_ck) and not resume:
        raise RuntimeError(
            "partial fold-checkpoint set: {} exist, {} missing — refusing a "
            "mixed resume".format(
                [p for p, h in zip(ck_paths, have_ck) if h],
                [p for p, h in zip(ck_paths, have_ck) if not h],
            )
        )

    prev = None
    if resume:
        log("loading state from {} fold checkpoints...".format(k_folds))
        prev = [load_checkpoint(p) for p in ck_paths]
        cfg = TrainConfig.from_checkpoint_meta(prev[0]["meta"], base=cfg)
        epochs = {int(ck["epoch"]) for ck in prev}
        assert len(epochs) == 1, "fold checkpoints disagree on epoch: {}".format(epochs)

    lrs_is_cos = cfg.lr_sched_meth == "cos"
    lrs_none = cfg.lr_sched_meth == "none"
    lrs_plateau = cfg.lr_sched_meth == "plateau"
    assert lrs_is_cos or lrs_none or lrs_plateau

    # ----- data: ONE device-resident union of all specimens ---------------
    log("initializing union dataset ({} specimens)".format(k_folds))
    union = load_dataset(data_file_path, pats)
    counts = specimen_counts(data_file_path, pats)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    n_orig = int(offsets[-1])
    spec_ranges = [np.arange(offsets[i], offsets[i + 1]) for i in range(k_folds)]
    if cfg.dup_lr_flip:
        # mirrored copies live at row + N of the duplicated union; they join
        # the TRAINING indices only, AFTER each fold's split — mirrors of
        # validation frames would otherwise leak into training (inflating
        # the per-fold valid metric), and the held-out specimen's mirrors
        # stay excluded because the split pool holds original rows only
        from deepfluoro_tpu.data.hdf5 import (
            get_land_names_from_dataset,
            lr_flip_duplicate,
        )

        names = None
        if union.lands is not None:
            try:
                names = get_land_names_from_dataset(data_file_path)
            except (KeyError, OSError):
                log("WARNING: archive has no readable land-names group; "
                    "flip duplication falls back to ADJACENT-PAIR landmark "
                    "swapping — verify the landmark channel order is "
                    "(X-l, X-r) pairs")
        union = lr_flip_duplicate(union, land_names=names)

    train_idx, valid_idx = [], []
    for k in range(k_folds):
        pool = np.concatenate([spec_ranges[j] for j in range(k_folds) if j != k])
        if resume:
            # stored train indices already include the mirror rows
            t = np.asarray(prev[k]["train-idx"], np.int64)
            v = np.asarray(prev[k]["valid-idx"], np.int64)
            assert len(t) and len(v)
            # stored indices are offsets into the union as laid out by the
            # ORIGINAL --pats order; a reordered resume would silently remap
            # them onto the wrong specimens (incl. the held-out one)
            allowed = {int(i) for i in pool}
            if cfg.dup_lr_flip:
                allowed |= {i + n_orig for i in allowed}
            used = {int(i) for i in t} | {int(i) for i in v}
            assert used <= allowed, (
                "fold {}: checkpoint train/valid indices fall outside this "
                "fold's specimen pool — was the run resumed with a different "
                "--pats order than it was started with?".format(k)
            )
        else:
            t, v = _split_pool(pool, cfg.train_valid_split, cfg.seed + k)
            if cfg.dup_lr_flip:
                t = np.concatenate([t, t + n_orig])
        train_idx.append(t)
        valid_idx.append(v)
        log(
            "fold {} (held-out spec {:02d}): {} train / {} valid".format(
                k, pats[k], len(train_idx[k]), len(valid_idx[k])
            )
        )

    orig_h, orig_w = union.orig_img_shape
    from deepfluoro_tpu.train.loop import _padded_dim

    pad_h = _padded_dim(orig_h, cfg.proj_unet_dim)

    aug_train = AugmentConfig(
        num_classes=cfg.num_classes,
        proj_pad_dim=cfg.proj_unet_dim,
        prob_of_aug=0.5 if cfg.data_aug else 0.0,
    )
    aug_eval = AugmentConfig(
        num_classes=cfg.num_classes, proj_pad_dim=cfg.proj_unet_dim, prob_of_aug=0.0,
        # dice-only validation never reads target heatmaps — skip
        # synthesizing K x B x L Gaussians per eval batch (same gating as
        # loop.fit and test_dataset_ensemble)
        include_heat_map=not cfg.use_dice_valid,
    )

    # ----- model / optimizer / schedules ----------------------------------
    log("creating {} fold networks".format(k_folds))
    model, stacked = make_multifold_state(
        cfg, k_folds, jax.random.PRNGKey(cfg.seed), (pad_h, pad_h)
    )
    tx = make_optimizer(cfg)

    def new_sched():
        if cfg.optim_type != "sgd":
            assert lrs_none, "adam/rmsprop only support lr-sched none (train.py:343-352)"
            return None
        if lrs_is_cos:
            return WarmRestartLR(
                cfg.init_lr,
                init_run_period_epochs=cfg.lrs_num_epochs,
                growth_factor=cfg.lrs_growth_factor,
            )
        if lrs_plateau:
            return ReduceLROnPlateau(
                cfg.init_lr, factor=0.1, patience=cfg.lr_patience, cooldown=cfg.lr_cooldown
            )
        return None

    scheds = [new_sched() for _ in range(k_folds)]

    epoch = 0
    best_valid = [None] * k_folds
    num_restarts = 0
    if resume:
        per_fold = []
        for k in range(k_folds):
            st = fold_state(stacked, k)
            per_fold.append(
                TrainState(
                    params=restore_tree(st.params, prev[k]["model-state-dict"]["params"]),
                    batch_stats=restore_tree(
                        st.batch_stats, prev[k]["model-state-dict"]["batch_stats"]
                    ),
                    # a light snapshot (params only) keeps the fresh optimizer
                    opt_state=st.opt_state if not prev[k]["optimizer-state-dict"]
                    else restore_tree(st.opt_state, prev[k]["optimizer-state-dict"]),
                    step=st.step,
                )
            )
            if scheds[k] is not None and prev[k]["scheduler-state-dict"]:
                scheds[k].load_state_dict(prev[k]["scheduler-state-dict"])
            bvl = float(prev[k]["best-valid-loss"])
            best_valid[k] = None if np.isnan(bvl) else bvl
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_fold)
        epoch = int(prev[0]["epoch"])
        num_restarts = int(prev[0]["lrs-num-restarts"])
        del prev, per_fold

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        fold_sharding = NamedSharding(mesh, P("ensemble"))
        stacked = jax.device_put(stacked, fold_sharding)

    eval_lands = 0 if cfg.use_dice_valid else None
    if stream_data:
        # host-resident union (archives too large for HBM: 2x / full-res
        # multifold, VERDICT r2 item 4); batches stream per step with a
        # producer-thread prefetch so the H2D transfer overlaps compute
        fused_step = make_streaming_multifold_step(cfg, model, tx, aug_train, mesh=mesh)
        eval_step = make_streaming_multifold_eval_step(
            cfg, model, aug_eval, num_lands_for_loss=eval_lands, mesh=mesh
        )
        projs_all = segs_all = lands_all = None
        if mesh is None:
            place_batch = jax.device_put

            def assemble(idx):
                """(K, B) indices -> device-placed (K, B, ...) batches."""
                return (
                    place_batch(union.projs[idx]),
                    None if union.segs is None else place_batch(union.segs[idx]),
                    None if union.lands is None else place_batch(union.lands[idx]),
                )
        else:
            # fold-sharded batches are assembled from PROCESS-LOCAL fold
            # rows (make_array_from_process_local_data): purely local
            # per-device transfers. A plain device_put(full, P('ensemble'))
            # is NOT safe here — for cross-process shardings it runs a
            # hidden assert_equal COLLECTIVE, and these batches are built on
            # the prefetch producer thread, whose collective would race the
            # main thread's step dispatch and deadlock the pod (measured;
            # each process also only slices its own folds' rows this way).
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sharding = NamedSharding(mesh, P("ensemble"))
            ens_axis = list(mesh.axis_names).index("ensemble")
            per = k_folds // int(mesh.shape["ensemble"])
            local_coords = sorted({
                idx[ens_axis]
                for idx, d in np.ndenumerate(mesh.devices)
                if d.process_index == jax.process_index()
            })
            local_folds = np.concatenate(
                [np.arange(c * per, (c + 1) * per) for c in local_coords]
            )

            def place_batch(rows_by_fold):
                """(K_local, B, ...) local rows -> global (K, B, ...)."""
                return jax.make_array_from_process_local_data(
                    batch_sharding,
                    np.ascontiguousarray(rows_by_fold),
                    (k_folds,) + rows_by_fold.shape[1:],
                )

            def assemble(idx):
                """(K, B) indices -> fold-sharded (K, B, ...) batches; only
                this process's folds' rows are sliced and transferred."""
                lidx = idx[local_folds]
                return (
                    place_batch(union.projs[lidx]),
                    None if union.segs is None else place_batch(union.segs[lidx]),
                    None if union.lands is None else place_batch(union.lands[lidx]),
                )
    else:
        fused_step = make_fused_multifold_step(cfg, model, tx, aug_train, mesh=mesh)
        eval_step = make_multifold_eval_step(
            cfg, model, aug_eval, num_lands_for_loss=eval_lands, mesh=mesh
        )
        if mesh is None:
            place_union = jnp.asarray
        else:
            # replicate the union across the mesh explicitly: a bare
            # jnp.asarray commits it to ONE device and the shard_map'd step
            # would re-broadcast the whole archive every dispatch (loop.fit
            # places its resident dataset the same way). Collective-free
            # placement: a plain device_put to a cross-process sharding
            # would assert_equal-allgather the ENTIRE archive over DCN
            from deepfluoro_tpu.parallel.multihost import replicated_from_local
            from deepfluoro_tpu.train.loop import _replicated_sharding

            repl = _replicated_sharding(mesh)
            place_union = lambda x: replicated_from_local(repl, x)
        projs_all = place_union(union.projs)
        segs_all = None if union.segs is None else place_union(union.segs)
        lands_all = None if union.lands is None else place_union(union.lands)

    streams = [_FoldStream(train_idx[k], cfg.seed + 101 * (k + 1)) for k in range(k_folds)]
    steps_per_epoch = -(-max(len(t) for t in train_idx) // cfg.batch_size)

    # fixed padded validation index grid: (num_eval_batches * B) per fold,
    # repeating index 0 past each fold's true count; mask selects real rows
    max_valid = max(len(v) for v in valid_idx)
    n_eval_batches = -(-max_valid // cfg.batch_size)
    eval_cols = n_eval_batches * cfg.batch_size
    eval_idx = np.zeros((k_folds, eval_cols), np.int32)
    eval_mask = np.zeros((k_folds, eval_cols), bool)
    for k in range(k_folds):
        nv = len(valid_idx[k])
        eval_idx[k, :nv] = valid_idx[k]
        eval_idx[k, nv:] = valid_idx[k][0]
        eval_mask[k, :nv] = True

    # one checkpointer per fold: K fold saves submit without joining each
    # other, so the (large, serialized) state fetches of all folds overlap
    # the next epoch's training instead of blocking on submission order
    checkpointers = [AsyncCheckpointer() for _ in range(k_folds)]

    def writer_set(prefix, new_file):
        # multi-host: process 0 owns the loss-log files (checkpoint writes
        # are gated inside save_checkpoint / AsyncCheckpointer)
        if prefix is None or jax.process_index() != 0:
            return None
        return [
            RunningFloatWriter("{}_spec{:02d}.txt".format(prefix, p), new_file=new_file)
            for p in pats
        ]

    train_loss_out = writer_set(train_loss_txt_prefix, not resume)
    valid_loss_out = writer_set(valid_loss_txt_prefix, not resume)

    enforce_max_hours = cfg.max_hours > 0
    enforce_max_num_restarts = cfg.max_num_restarts > 0
    tot_time_hours = 0.0
    epochs_this_session = 0
    last_losses = np.full((k_folds,), np.nan)

    # flag-only handler: print() from signal context can re-enter stdout's
    # non-reentrant buffer lock and raise mid-loop, killing training without
    # the exit checkpoint (same hazard loop.fit documents); the message is
    # logged when the flag is observed at epoch end
    stop_requested = {"flag": False}

    def _on_sigterm(signum, frame):
        stop_requested["flag"] = True

    prev_handler = None
    try:
        prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass

    extract_fold = _make_fold_extractor(mesh) if multiproc else fold_state

    def save_fold(k, path, light=False):
        # all processes dispatch the (gathering, under multiproc) slice in
        # lockstep; only process 0's checkpointer then snapshots and writes
        st = extract_fold(stacked, k)
        checkpointers[k].save(
            path,
            meta=cfg.to_checkpoint_meta(),
            params=st.params,
            batch_stats=st.batch_stats,
            opt_state=None if light else st.opt_state,
            sched_state=None if light else (
                scheds[k].state_dict() if scheds[k] is not None else None
            ),
            epoch=epoch,
            best_valid_loss=best_valid[k],
            last_loss=None if np.isnan(last_losses[k]) else float(last_losses[k]),
            num_restarts=num_restarts,
            train_idx=train_idx[k],
            valid_idx=valid_idx[k],
        )

    log("Start Training ({} folds in lockstep)...".format(k_folds))
    completed = False
    try:
        keep_training = True
        while keep_training:
            epoch_start = time.time()
            log("Epoch: {:03d}".format(epoch))

            pending = []  # (K,) device loss vectors, drained lazily
            epoch_loss_sum = np.zeros((k_folds,), np.float64)
            epoch_loss_n = 0

            def drain():
                nonlocal last_losses, epoch_loss_sum, epoch_loss_n
                for dev in pending:
                    vals = np.asarray(dev)
                    last_losses = vals  # last-step losses: the checkpoint 'loss'
                    epoch_loss_sum += vals
                    epoch_loss_n += 1
                    if train_loss_out is not None:
                        for k in range(k_folds):
                            train_loss_out[k].write(float(vals[k]))
                pending.clear()

            batch_iter = None
            if stream_data:

                def make_batch(s, _epoch=epoch):
                    idx = np.stack([st.take(cfg.batch_size) for st in streams])
                    base = (_epoch * steps_per_epoch + s) * k_folds
                    seeds = base + np.arange(k_folds, dtype=np.int32)
                    return assemble(idx) + (jnp.asarray(seeds),)

                # producer-thread prefetch: host batch assembly + async
                # device_put of upcoming batches overlap this step's compute
                batch_iter = prefetch_sequence(make_batch, steps_per_epoch)

            for s in range(steps_per_epoch):
                if scheds[0] is not None:
                    lr_vec = np.asarray([sc.get_lr() for sc in scheds], np.float32)
                else:
                    lr_vec = np.full((k_folds,), cfg.init_lr, np.float32)

                if stream_data:
                    projs_b, segs_b, lands_b, seeds_j = next(batch_iter)
                    stacked, losses = fused_step(
                        stacked, projs_b, segs_b, lands_b, seeds_j, jnp.asarray(lr_vec)
                    )
                else:
                    idx = np.stack([st.take(cfg.batch_size) for st in streams])
                    base = (epoch * steps_per_epoch + s) * k_folds
                    seeds = base + np.arange(k_folds, dtype=np.int32)
                    stacked, losses = fused_step(
                        stacked, projs_all, segs_all, lands_all,
                        jnp.asarray(idx), jnp.asarray(seeds), jnp.asarray(lr_vec),
                    )
                pending.append(losses)

                if lrs_is_cos and scheds[0] is not None:
                    frac = (s + 1) / steps_per_epoch
                    for sc in scheds:
                        sc.intra_epoch_step(frac)

                if len(pending) >= max(1, steps_per_epoch // 4):
                    drain()

            drain()

            log("  Running validation")
            per_fold_losses = [[] for _ in range(k_folds)]
            for b in range(n_eval_batches):
                sl = slice(b * cfg.batch_size, (b + 1) * cfg.batch_size)
                if stream_data:
                    pb, sb, lb = assemble(eval_idx[:, sl])
                    batch_losses = np.asarray(eval_step(stacked, pb, sb, lb))
                else:
                    batch_losses = np.asarray(
                        eval_step(stacked, projs_all, segs_all, lands_all, jnp.asarray(eval_idx[:, sl]))
                    )
                for k in range(k_folds):
                    m = eval_mask[k, sl]
                    per_fold_losses[k].extend(batch_losses[k][m])

            avg_valid = np.array([float(np.mean(l)) for l in per_fold_losses])
            std_valid = np.array(
                [float(np.std(l, ddof=1)) if len(l) > 1 else 0.0 for l in per_fold_losses]
            )
            if valid_loss_out is not None:
                for k in range(k_folds):
                    valid_loss_out[k].write(float(avg_valid[k]))

            # true epoch means, like loop.fit and the reference (train.py:445) —
            # the last step's vector alone is a noisy single-batch value
            avg_train = epoch_loss_sum / max(1, epoch_loss_n)
            log("  Avg. Training Losses: {}".format(np.round(avg_train, 6)))
            for k in range(k_folds):
                log(
                    "  fold {} (spec {:02d}) valid: {:.6f} +/- {:.6f}".format(
                        k, pats[k], avg_valid[k], std_valid[k]
                    )
                )

            for k, sc in enumerate(scheds):
                if sc is None:
                    continue
                if lrs_plateau:
                    sc.step(float(avg_valid[k]))
                else:
                    sc.step()
            # cos restarts are config-deterministic, so all folds restart together
            if lrs_is_cos and scheds[0] is not None and scheds[0].just_restarted:
                log("  Next epoch is warm restart...")
                num_restarts += 1

            epoch += 1

            new_best = []
            for k in range(k_folds):
                if best_valid[k] is None or avg_valid[k] < best_valid[k]:
                    best_valid[k] = float(avg_valid[k])
                    new_best.append(k)

            saved_ck_this_epoch = False
            # files already written THIS epoch, reusable as copy sources by a
            # later same-epoch save of the same kind (full vs light) — the
            # checkpointer copy is ordered behind the save and avoids
            # re-fetching params over slow transports (loop.fit's copy
            # optimization; reference train.py:523-531)
            full_src: dict[int, str] = {}
            light_src: dict[int, str] = {}

            def save_or_copy(k, path, light):
                src_map = light_src if light else full_src
                if k in src_map:
                    checkpointers[k].copy(src_map[k], path)
                else:
                    save_fold(k, path, light=light)
                    src_map[k] = path

            if (epoch % cfg.checkpoint_freq) == 0:
                log("  Saving fold checkpoints")
                for k in range(k_folds):
                    save_fold(k, ck_paths[k])
                    full_src[k] = ck_paths[k]
                saved_ck_this_epoch = True

            if cfg.save_best_valid and new_best:
                log(
                    "  Saving best validation for folds {} (losses {})".format(
                        new_best, [round(best_valid[k], 6) for k in new_best]
                    )
                )
                for k in new_best:
                    save_or_copy(k, best_paths[k], cfg.light_best_nets)

            if (
                lrs_is_cos
                and scheds[0] is not None
                and scheds[0].just_restarted
                and cfg.save_restart_net_prefix
                and num_restarts >= cfg.save_after_n_restarts
            ):
                # pre-restart snapshot of every fold (reference train.py:533-542
                # saves <prefix>_XX.pt before each warm restart; cos restarts are
                # config-deterministic so all folds restart together)
                for k in range(k_folds):
                    restart_path = "{}_spec{:02d}_{:02d}.pt".format(
                        cfg.save_restart_net_prefix, pats[k], num_restarts - 1
                    )
                    if k == 0:
                        log(
                            "  Saving networks before restart {} to {}_specXX_{:02d}.pt".format(
                                num_restarts, cfg.save_restart_net_prefix, num_restarts - 1
                            )
                        )
                    save_or_copy(k, restart_path, cfg.light_best_nets)

            this_epoch_hours = (time.time() - epoch_start) / 3600.0
            log("  This epoch took {:.4f} hours!".format(this_epoch_hours))
            tot_time_hours += this_epoch_hours
            epochs_this_session += 1
            avg_epoch_time_hours = tot_time_hours / epochs_this_session

            if stop_requested["flag"]:
                keep_training = False
                log("  Exiting - termination requested!")
            if enforce_max_hours and (tot_time_hours + avg_epoch_time_hours) > cfg.max_hours:
                log("  Exiting - did not expect to complete next epoch within time limit!")
                keep_training = False
            if enforce_max_num_restarts:
                if num_restarts >= cfg.max_num_restarts:
                    keep_training = False
                    log("  Exiting - maximum number of restarts performed!")
            elif epoch >= cfg.max_num_epochs:
                keep_training = False
                log("  Exiting - maximum number of epochs performed!")

            if multiproc:
                # per-PROCESS stop inputs (local wall clock for --max-hours, a
                # SIGTERM delivered to one host) split-brain the pod: one
                # process leaves the loop while its peers block forever at the
                # next fold collective. Stop everywhere if ANY process wants
                # to stop (loop.fit's agreement rule).
                from jax.experimental import multihost_utils

                stops = np.asarray(
                    multihost_utils.process_allgather(
                        np.asarray([0 if keep_training else 1], np.int32)
                    )
                ).reshape(-1)
                if int(stops.max()) and keep_training:
                    keep_training = False
                    log("  Exiting - a peer process requested termination!")

            if not keep_training and not saved_ck_this_epoch:
                log("    saving fold checkpoints before exit!")
                for k in range(k_folds):
                    save_or_copy(k, ck_paths[k], light=False)

        log("Training Hours: {:.4f}".format(tot_time_hours))
        completed = True
    finally:
        # teardown runs on EVERY exit (an exception mid-epoch must not
        # leak the installed SIGTERM handler or abandon in-flight async
        # checkpoint writes); on the exceptional path a checkpointer
        # error must not mask the original exception
        for c in checkpointers:
            try:
                c.wait()
            except Exception:
                if completed:
                    raise
        for ws in (train_loss_out, valid_loss_out):
            if ws is not None:
                for w in ws:
                    w.close()
        if prev_handler is not None:
            try:
                signal.signal(signal.SIGTERM, prev_handler)
            except ValueError:
                pass

    return {
        "model": model,
        "stacked_state": stacked,
        "cfg": cfg,
        "epoch": epoch,
        "best_valid_losses": np.array(
            [np.nan if b is None else b for b in best_valid]
        ),
        "fold_pats": list(pats),
    }


def train_multifold(
    data_per_fold: list[FluoroData],
    cfg: TrainConfig,
    num_epochs: int,
    lr: float | None = None,
    seed: int = 0,
    verbose: bool = True,
):
    """Constant-LR K-fold training over explicit per-fold datasets (a
    throughput/demo path; use :func:`fit_multifold` for the paper recipe).

    One device dispatch per step: the K datasets are concatenated into one
    device-resident array and each fold gathers via its own index offset.
    """
    k_folds = len(data_per_fold)
    assert k_folds >= 1
    orig_h, orig_w = data_per_fold[0].orig_img_shape
    from deepfluoro_tpu.train.loop import _padded_dim

    pad_h = _padded_dim(orig_h, cfg.proj_unet_dim)

    model, stacked = make_multifold_state(
        cfg, k_folds, jax.random.PRNGKey(cfg.seed), (pad_h, pad_h)
    )
    tx = make_optimizer(cfg)

    aug = AugmentConfig(
        num_classes=cfg.num_classes,
        proj_pad_dim=cfg.proj_unet_dim,
        prob_of_aug=0.5 if cfg.data_aug else 0.0,
    )
    fused = make_fused_multifold_step(cfg, model, tx, aug)

    has_segs = data_per_fold[0].segs is not None
    has_lands = data_per_fold[0].lands is not None
    projs_all = jnp.asarray(np.concatenate([d.projs for d in data_per_fold]))
    segs_all = (
        jnp.asarray(np.concatenate([d.segs for d in data_per_fold])) if has_segs else None
    )
    lands_all = (
        jnp.asarray(np.concatenate([d.lands for d in data_per_fold])) if has_lands else None
    )
    offsets = np.concatenate([[0], np.cumsum([len(d) for d in data_per_fold])])

    streams = [
        _FoldStream(np.arange(offsets[k], offsets[k + 1]), seed + k)
        for k in range(k_folds)
    ]
    steps_per_epoch = min(len(d) // cfg.batch_size for d in data_per_fold)
    assert steps_per_epoch > 0, "batch size exceeds the smallest fold"

    lr_vec = jnp.full((k_folds,), cfg.init_lr if lr is None else lr, jnp.float32)
    losses_hist = []
    for epoch in range(num_epochs):
        for s in range(steps_per_epoch):
            idx = np.stack([st.take(cfg.batch_size) for st in streams])
            base = (epoch * steps_per_epoch + s) * k_folds
            seeds = base + np.arange(k_folds, dtype=np.int32)
            stacked, losses = fused(
                stacked, projs_all, segs_all, lands_all,
                jnp.asarray(idx), jnp.asarray(seeds), lr_vec,
            )
        losses_hist.append(np.asarray(losses))
        if verbose:
            print(
                "multifold epoch {:03d}: losses {}".format(
                    epoch, np.round(losses_hist[-1], 4)
                )
            )
    return model, stacked, losses_hist
