"""The training loop: epochs, validation, LR scheduling, checkpoint kinds,
time-budget exit, and full resume.

Orchestration mirrors reference train.py:104-578 while the per-iteration work
is a single jitted device program (step.py) fed by the device-side
augmentation pipeline (data/augment.py). Host responsibilities are reduced
to: index shuffling, LR state machines, loss logging, and checkpoint I/O.

Checkpoint kinds (train.py:517-542):
  * periodic checkpoint every ``checkpoint_freq`` epochs;
  * best-validation model (copy when already saved this epoch);
  * pre-warm-restart snapshots ``<prefix>_XX.pt`` gated by
    ``save_after_n_restarts``.
Stop criteria (train.py:557-567): wall-clock budget with predicted-next-epoch
check; max restarts (overriding max epochs when enabled); max epochs. Always
checkpoints on exit (train.py:569-576).
"""

from __future__ import annotations

import math
import os
import signal
import time

import numpy as np
import jax
import jax.numpy as jnp

from deepfluoro_tpu.data.augment import AugmentConfig, prepare_batch
from deepfluoro_tpu.data.hdf5 import FluoroData, load_dataset, split_train_valid
from deepfluoro_tpu.data.pipeline import BatchIterator
from deepfluoro_tpu.ops.image import calc_pad_amount
from deepfluoro_tpu.train.checkpoint import (
    AsyncCheckpointer,
    load_checkpoint,
    restore_tree,
)
from deepfluoro_tpu.train.config import TrainConfig
from deepfluoro_tpu.train.schedules import ReduceLROnPlateau, WarmRestartLR
from deepfluoro_tpu.train.step import (
    make_eval_step,
    make_fused_train_step,
    make_optimizer,
    make_train_state,
)
from deepfluoro_tpu.utils.io import RunningFloatWriter


def _padded_dim(orig_dim: int, pad_dim: int) -> int:
    if pad_dim > orig_dim:
        return orig_dim + 2 * calc_pad_amount(pad_dim, orig_dim)
    return orig_dim


def _replicated_sharding(mesh):
    """Fully-replicated NamedSharding over ``mesh`` (None passes through)."""
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P())


def evaluate(eval_step, state, data, aug_cfg, batch_size, key, iterator=None, mesh=None):
    """Per-image losses over a dataset -> (mean, std). Matches the reference's
    batch-1 no-grad loop (util.py:116-165) but batched on device; std follows
    torch.std's N-1 normalization.

    Pass a pre-built (device-resident) BatchIterator via ``iterator`` when
    calling repeatedly — building one here re-uploads the dataset each call.

    With ``mesh``: on a SINGLE-host mesh with a 'data' axis each batch is
    placed batch-sharded (uneven tails padded with row-0 duplicates and
    masked after), so the prepare+eval programs auto-partition over the
    axis — d-way faster validation with bit-identical per-sample losses
    (they are row-local). Under jax.distributed (or meshes without a
    'data' axis, e.g. pure TP) batches are placed fully replicated and every
    device/process evaluates redundantly — identical results everywhere,
    exact reference semantics for arbitrary validation-set sizes; the
    sharded variant is skipped there because the host loss fetch needs
    every row addressable. All processes must call this in lockstep.
    """
    repl = _replicated_sharding(mesh)
    place = None
    data_axis = 0
    if mesh is not None:
        from deepfluoro_tpu.parallel.multihost import replicated_from_local

        if jax.process_count() == 1 and "data" in mesh.axis_names:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_axis = int(mesh.shape["data"])
            data_sharded = NamedSharding(mesh, P("data"))

            def place(x, pad):
                x = np.asarray(x)
                if pad:
                    x = np.concatenate([x, np.repeat(x[:1], pad, axis=0)])
                return jax.device_put(x, data_sharded)
        else:
            # collective-free replication: a plain device_put would
            # assert_equal-allgather every batch across the pod
            place = lambda x, pad: replicated_from_local(repl, x)
    losses = []
    it = iterator if iterator is not None else BatchIterator(data, batch_size=batch_size, shuffle=False)
    for bi, (projs, segs, lands) in enumerate(it.epoch()):
        # independent key per batch — reusing one key would correlate the
        # augmentation draws across batches if anyone evaluates with aug on
        bkey = jax.random.fold_in(key, bi)
        n_real = int(np.asarray(projs).shape[0])
        if place is not None:
            pad = (-n_real) % data_axis if data_axis > 1 else 0
            projs = place(projs, pad)
            segs = None if segs is None else place(segs, pad)
            lands = None if lands is None else place(lands, pad)
        prepared = prepare_batch(aug_cfg, bkey, projs, segs, lands)
        per_sample = eval_step(
            state, prepared["proj"], prepared["seg"], prepared.get("heats")
        )
        losses.append(np.asarray(per_sample)[:n_real])
    losses = np.concatenate(losses)
    std = float(losses.std(ddof=1)) if losses.size > 1 else 0.0
    return float(losses.mean()), std


def fit(
    data_file_path: str,
    train_pats,
    cfg: TrainConfig,
    valid_pats=None,
    checkpoint_filename: str = "zz_checkpoint.pt",
    best_valid_filename: str = "zz_best_valid.pt",
    train_loss_txt: str = "train_iter_loss.txt",
    valid_loss_txt: str = "valid_loss.txt",
    verbose: bool = True,
    stream_data: bool = False,
    mesh=None,
    shard_spatial: bool = False,
):
    """Train a network; returns dict(state=..., cfg=..., best_valid_loss=...).

    ``cfg.num_lands`` should already reflect the dataset (the CLI reads it
    from the archive like train.py:174-178).

    ``stream_data=True`` keeps the dataset in HOST memory and double-buffers
    batches to the device (data.pipeline.PrefetchIterator + a streaming
    variant of the fused step) — for archives too large for HBM (full-res /
    2x training). The default device-resident mode is faster when the data
    fits: one dispatch per step with zero per-step H2D transfers.

    ``mesh`` (a jax.sharding.Mesh, e.g. parallel.make_mesh({'data': 4,
    'spatial': 2})) scales this SAME loop across chips: parameters/optimizer
    state replicate, each batch is sharded over the 'data' axis (and image
    rows over 'spatial' with ``shard_spatial=True``), and XLA emits the
    gradient all-reduce over ICI — SURVEY §2.3's primary scaling axis, wired
    into the flagship path. Losses/params match the single-device run
    exactly (tests/test_train_mesh.py). Under jax.distributed (multi-host;
    cli/train.py --num-processes) every process runs fit() in lockstep:
    batches are assembled from per-process contiguous slices
    (parallel.multihost.local_batch_slice + global_batch_from_local), so the
    global batch sequence — and therefore the training trajectory — is
    sample-identical to the single-host run; process 0 alone writes
    checkpoints and loss logs. Multi-host requires the global batch size to
    split evenly over processes; an indivisible final partial batch is
    dropped (logged once). With ``stream_data=True`` under multi-host, no
    process materializes the training union: a lazy archive reader serves
    each host only the rows of its slice of every global batch (per-host
    disjoint loading, ~N/P rows per epoch, O(batch) host memory) with the
    SAME trajectory — the mode for full-res/2x archives on pods.
    """

    def log(msg):
        if verbose and jax.process_index() == 0:
            print(msg, flush=True)

    multiproc = jax.process_count() > 1
    if multiproc:
        assert mesh is not None, (
            "multi-process fit() requires a device mesh (--dp-devices / "
            "--spatial-devices with --num-processes)"
        )
        # the explicit cross-process assembly needs the global batch to
        # split evenly over the data axis (device slices) AND over the
        # processes (make_array_from_process_local_data's host slices) —
        # the axis can be smaller than the process count on DP x spatial
        # meshes, so both constraints apply
        _mh_div = math.lcm(int(mesh.shape["data"]), jax.process_count())
        assert cfg.batch_size % _mh_div == 0, (
            "multi-host training assembles each global batch strictly evenly: "
            "batch_size {} must be divisible by lcm(data axis {}, "
            "process count {}) = {}".format(
                cfg.batch_size, int(mesh.shape["data"]), jax.process_count(),
                _mh_div,
            )
        )
    repl = _replicated_sharding(mesh)

    # ----- resume -------------------------------------------------------
    train_idx = valid_idx = None
    prev = None
    load_from_checkpoint = os.path.exists(checkpoint_filename)
    if multiproc:
        # every process restores the checkpoint independently (process 0
        # wrote it, but ALL must see it: the restored state is device_put
        # as "replicated", which does not verify cross-process equality, and
        # the checkpoint meta overrides cfg — a process that misses the file
        # would train from fresh weights with a desynced schedule). Requires
        # checkpoint_filename on storage shared by all hosts; fail loudly
        # when hosts disagree instead of silently split-braining.
        from jax.experimental import multihost_utils

        seen = np.asarray(
            multihost_utils.process_allgather(
                np.asarray([1 if load_from_checkpoint else 0], np.int32)
            )
        ).reshape(-1)
        assert int(seen.min()) == int(seen.max()), (
            "checkpoint '{}' exists on {} of {} processes — multi-host "
            "resume requires it on shared storage visible to every host".format(
                checkpoint_filename, int(seen.sum()), jax.process_count()
            )
        )
    if load_from_checkpoint:
        log("loading state from checkpoint...")
        from deepfluoro_tpu.train.checkpoint import is_torch_checkpoint

        if is_torch_checkpoint(checkpoint_filename):
            # drop-in migration: a reference train.py .pt resumes here —
            # weights/BN stats, SGD momentum, scheduler state, epoch, and
            # split indices all carry over (compat/torch_import.py); the
            # next periodic save rewrites the file in the native format
            from deepfluoro_tpu.compat.torch_import import torch_checkpoint_to_native

            log("  (reference torch checkpoint detected; importing)")
            prev = torch_checkpoint_to_native(checkpoint_filename)
        else:
            prev = load_checkpoint(checkpoint_filename)
        cfg = TrainConfig.from_checkpoint_meta(prev["meta"], base=cfg)
        if cfg.train_valid_split >= 0:
            train_idx = list(prev["train-idx"])
            valid_idx = list(prev["valid-idx"])
            assert train_idx and valid_idx

    num_restarts = int(prev["lrs-num-restarts"]) if prev else 0

    lrs_is_cos = cfg.lr_sched_meth == "cos"
    lrs_none = cfg.lr_sched_meth == "none"
    lrs_plateau = cfg.lr_sched_meth == "plateau"
    assert lrs_is_cos or lrs_none or lrs_plateau

    # ----- data ---------------------------------------------------------
    # multi-host + stream_data: per-host disjoint loading (SURVEY §2.3 DP
    # row). No process materializes the union — a lazy reader serves each
    # host exactly the rows of ITS slice of every global batch (~N/P rows
    # per epoch, O(batch) resident), from a prefetch producer thread so the
    # reads and H2D overlap compute. The global batch sequence (shuffle
    # order, split, mirror layout) is bit-identical to the resident path.
    mh_stream = multiproc and stream_data
    train_data = reader = train_rows = None
    if mh_stream:
        log("initializing training dataset (per-host streaming reader)")
        from deepfluoro_tpu.data.hdf5 import LazyFluoroReader, split_indices

        reader = LazyFluoroReader(
            data_file_path, train_pats, dup_lr_flip=cfg.dup_lr_flip
        )
        if cfg.dup_lr_flip and reader.has_lands and reader.land_names is None:
            # same diagnostic the resident path's maybe_dup emits — the two
            # feed modes must not differ in failure visibility
            log("WARNING: archive has no readable land-names group; "
                "flip duplication falls back to ADJACENT-PAIR landmark "
                "swapping — verify the landmark channel order is "
                "(X-l, X-r) pairs")
        n_pool = reader.n_base
        if cfg.train_valid_split >= 0:
            # mirror split_train_valid's guards (the resident path) so a
            # degenerate split fails HERE with the same clear message
            # instead of as a rows-out-of-range error from reader.take
            if not (0.0 < cfg.train_valid_split < 1.0):
                raise ValueError(
                    "train_valid_split={} must lie strictly in (0, 1)".format(
                        cfg.train_valid_split
                    )
                )
            if n_pool - int(math.ceil(cfg.train_valid_split * n_pool)) == 0:
                raise ValueError(
                    "train_valid_split={} leaves an empty validation set for "
                    "{} samples; lower the split or provide explicit "
                    "--valid-pats".format(cfg.train_valid_split, n_pool)
                )
            if train_idx is None or valid_idx is None:
                train_idx, valid_idx = split_indices(
                    n_pool, cfg.train_valid_split, cfg.seed
                )
            train_idx, valid_idx = list(train_idx), list(valid_idx)
            assert len(train_idx) + len(valid_idx) == n_pool, (
                "restored split indices cover {} of {} pool rows".format(
                    len(train_idx) + len(valid_idx), n_pool
                )
            )
            vp, vs, vl = reader.take(valid_idx)
            valid_data = FluoroData(
                projs=vp, segs=vs, lands=vl,
                orig_img_shape=reader.orig_img_shape,
            )
            train_rows = np.asarray(train_idx, np.int64)
        else:
            assert valid_pats is not None
            log("initializing validation dataset")
            valid_data = load_dataset(data_file_path, valid_pats)
            train_rows = np.arange(n_pool, dtype=np.int64)
        if cfg.dup_lr_flip:
            # mirrors join the TRAINING side only (virtual rows i + n_pool
            # mirror row i on read — same layout maybe_dup produces)
            train_rows = np.concatenate([train_rows, train_rows + n_pool])
        train_ds_len = int(len(train_rows))
        log("Length of training dataset: {}".format(train_ds_len))
        log("Length of validation dataset: {}".format(len(valid_data)))
    else:
        log("initializing training dataset")
        train_data = load_dataset(data_file_path, train_pats)
        if multiproc:
            # the resident pod feed replicates the UNION into every host —
            # fine for the 42 MB 8x archive, 2.5 GB/host at full res
            # (reference README.md:62-66). --stream-data is the per-host
            # disjoint path (LazyFluoroReader serves each host only its
            # slice of every global batch).
            union_mb = train_data.projs.nbytes / 1e6
            if train_data.segs is not None:
                union_mb += train_data.segs.nbytes / 1e6
            if jax.process_index() == 0:
                # not log(): a footgun warning must survive verbose=False
                print(
                    "WARNING: multi-host RESIDENT feed — every one of the {} "
                    "processes materializes the full {:.0f} MB training union "
                    "in host RAM; pass --stream-data for per-host disjoint "
                    "loading".format(jax.process_count(), union_mb),
                    flush=True,
                )

        def maybe_dup(data):
            # mirrors join the TRAINING side only, AFTER any split:
            # duplicating before a random split would put the mirror of
            # ~every validation frame into training, inflating the
            # validation metric that drives best-net selection and the
            # plateau schedule
            if not cfg.dup_lr_flip:
                return data
            from deepfluoro_tpu.data.hdf5 import (
                get_land_names_from_dataset,
                lr_flip_duplicate,
            )

            names = None
            if data.lands is not None:
                try:
                    names = get_land_names_from_dataset(data_file_path)
                except (KeyError, OSError):
                    log("WARNING: archive has no readable land-names group; "
                        "flip duplication falls back to ADJACENT-PAIR landmark "
                        "swapping — verify the landmark channel order is "
                        "(X-l, X-r) pairs")
            return lr_flip_duplicate(data, land_names=names)

        if cfg.train_valid_split >= 0:
            # split indices (stored in checkpoints) refer to the UNDUPLICATED
            # pool; the deterministic duplication is re-applied after on resume
            train_data, valid_data, train_idx, valid_idx = split_train_valid(
                train_data,
                cfg.train_valid_split,
                train_valid_idx=(train_idx, valid_idx),
                seed=cfg.seed,
            )
            train_data = maybe_dup(train_data)
        else:
            assert valid_pats is not None
            train_data = maybe_dup(train_data)
            log("initializing validation dataset")
            valid_data = load_dataset(data_file_path, valid_pats)

        train_ds_len = len(train_data)
        log("Length of training dataset: {}".format(train_ds_len))
        log("Length of validation dataset: {}".format(len(valid_data)))
    if multiproc:
        # the per-epoch loop drops an indivisible tail batch; with fewer
        # training examples than one global batch EVERY batch would be that
        # tail and an epoch would run zero steps (and divide by zero) —
        # fail at setup with a clear message instead
        assert train_ds_len >= cfg.batch_size, (
            "multi-host training needs at least one full global batch per "
            "epoch: {} training examples < batch size {}".format(
                train_ds_len, cfg.batch_size
            )
        )

    orig_h, orig_w = (
        reader.orig_img_shape if mh_stream else train_data.orig_img_shape
    )
    # init traces the model at (pad_h, pad_h) and the pad math derives the
    # width pad from H — square frames are assumed throughout (true of every
    # DeepFluoro archive); fail loudly rather than init at the wrong width
    assert orig_h == orig_w, (
        "non-square projections ({}, {}) are not supported".format(orig_h, orig_w)
    )
    pad_h = _padded_dim(orig_h, cfg.proj_unet_dim)

    aug_train = AugmentConfig(
        num_classes=cfg.num_classes,
        proj_pad_dim=cfg.proj_unet_dim,
        prob_of_aug=0.5 if cfg.data_aug else 0.0,
    )
    aug_eval = AugmentConfig(
        num_classes=cfg.num_classes,
        proj_pad_dim=cfg.proj_unet_dim,
        prob_of_aug=0.0,
        # dice-only validation never reads target heatmaps — skip
        # synthesizing B x L Gaussians per eval batch (same gating as
        # test_dataset_ensemble)
        include_heat_map=not cfg.use_dice_valid,
    )

    # ----- model / optimizer / schedules --------------------------------
    log("creating network")
    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_key = jax.random.split(rng)
    model, state = make_train_state(cfg, init_key, (pad_h, pad_h))
    tx = make_optimizer(cfg)

    lr_sched = None
    if cfg.optim_type == "sgd":
        if lrs_is_cos:
            lr_sched = WarmRestartLR(
                cfg.init_lr,
                init_run_period_epochs=cfg.lrs_num_epochs,
                growth_factor=cfg.lrs_growth_factor,
            )
        elif lrs_plateau:
            lr_sched = ReduceLROnPlateau(
                cfg.init_lr, factor=0.1, patience=cfg.lr_patience, cooldown=cfg.lr_cooldown
            )
    else:
        assert lrs_none, "adam/rmsprop only support lr-sched none (train.py:343-352)"

    best_valid_loss = None
    epoch = 0

    if prev is not None:
        if prev.get("torch-opt-moments") is not None:
            # torch optimizer moments carry over verbatim (same recurrences;
            # train/step.py::make_optimizer) — graft the imported params-
            # shaped trees into the fresh opt_state so the trajectory
            # continues seamlessly
            from deepfluoro_tpu.train.step import inject_torch_moments_into_opt_state

            moments = dict(prev["torch-opt-moments"])
            for k in ("momentum_buffer", "exp_avg", "exp_avg_sq", "square_avg"):
                if k in moments:
                    moments[k] = restore_tree(state.params, moments[k])
            log("  importing torch {} optimizer state".format(moments["kind"]))
            opt_restored = inject_torch_moments_into_opt_state(
                state.opt_state, moments
            )
        elif prev.get("torch-opt-present"):
            # the torch checkpoint DOES hold optimizer state, but the layout
            # did not map — warn loudly instead of claiming there was none
            log(
                "  WARNING: could not map the torch optimizer state "
                "(unexpected param-group layout); continuing with a FRESH "
                "optimizer — weights warm-start, momentum does not"
            )
            opt_restored = state.opt_state
        elif not prev["optimizer-state-dict"]:
            # a light best-valid / pre-restart snapshot: params only — keep
            # the fresh optimizer state (warm-starting weights, not momentum)
            log("  checkpoint stores no optimizer state; starting optimizer fresh")
            opt_restored = state.opt_state
        else:
            opt_restored = restore_tree(state.opt_state, prev["optimizer-state-dict"])
        state = state.replace(
            params=restore_tree(state.params, prev["model-state-dict"]["params"]),
            batch_stats=restore_tree(
                state.batch_stats, prev["model-state-dict"]["batch_stats"]
            ),
            opt_state=opt_restored,
        )
        if lr_sched is not None and prev["scheduler-state-dict"]:
            lr_sched.load_state_dict(prev["scheduler-state-dict"])
        bvl = float(prev["best-valid-loss"])
        best_valid_loss = None if np.isnan(bvl) else bvl
        epoch = int(prev["epoch"])
        del prev

    tp = mesh is not None and "model" in mesh.axis_names
    if tp:
        # tensor parallelism: every state leaf channel-sharded over 'model'
        # (parallel.sharding.tp_state_shardings — the same rule the step's
        # out_shardings and sharded-checkpoint restore use), composing with
        # 'data' through the mesh itself. Host reads (checkpoint snapshot,
        # loss fetch) gather transparently on a single host; across
        # processes the leaves would not be addressable, hence the guard.
        assert not multiproc, (
            "tensor parallelism shards parameters across the mesh — "
            "unsupported with multi-process fit() (checkpoint writes need "
            "every leaf host-addressable); use sharded checkpoints via the "
            "library path instead"
        )
        from deepfluoro_tpu.parallel.sharding import tp_state_shardings

        state = jax.tree.map(
            lambda x, s: jax.device_put(x, s), state, tp_state_shardings(mesh, state)
        )
    elif repl is not None:
        # replicate the (possibly restored) state onto the mesh; every
        # sharded step keeps it replicated via out_shardings
        state = jax.device_put(state, repl)

    eval_step = make_eval_step(
        cfg, model, num_lands_for_loss=0 if cfg.use_dice_valid else None
    )

    # three feed modes share the per-epoch loop below:
    #   resident  — dataset in HBM, fused gather step (fastest; default)
    #   stream    — host-resident dataset, double-buffered H2D
    #   multihost — every process feeds its contiguous slice of each global
    #               batch (the pod path: per-host H2D bandwidth scales)
    feed_mode = "multihost" if multiproc else ("stream" if stream_data else "resident")
    fused_step = stream_step = train_stream = None
    projs_all = segs_all = lands_all = None
    if feed_mode == "stream":
        from deepfluoro_tpu.data.pipeline import PrefetchIterator
        from deepfluoro_tpu.train.step import make_streaming_train_step

        stream_step = make_streaming_train_step(
            cfg, model, tx, aug_train, mesh=mesh, spatial=shard_spatial,
            state_template=state,
        )
        batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sharding = NamedSharding(
                mesh, P("data" if "data" in mesh.axis_names else None)
            )
        train_stream = PrefetchIterator(
            train_data, batch_size=cfg.batch_size, shuffle=True, seed=cfg.seed + 1,
            sharding=batch_sharding,
        )
    elif feed_mode == "multihost":
        from deepfluoro_tpu.train.step import make_streaming_train_step

        stream_step = make_streaming_train_step(
            cfg, model, tx, aug_train, mesh=mesh, spatial=shard_spatial,
            state_template=state,
        )
        shuffle_rng = np.random.default_rng(cfg.seed + 1)
    else:
        fused_step = make_fused_train_step(
            cfg, model, tx, aug_train, mesh=mesh, spatial=shard_spatial,
            state_template=state,
        )
        # dataset resident on device once; each step is ONE dispatch gathering
        # its batch by index inside the fused program. On a mesh the arrays
        # replicate so every device gathers its own batch shard locally.
        def _put(x):
            if x is None:
                return None
            return jnp.asarray(x) if repl is None else jax.device_put(np.asarray(x), repl)

        projs_all = _put(train_data.projs)
        segs_all = _put(train_data.segs)
        lands_all = _put(train_data.lands)
        shuffle_rng = np.random.default_rng(cfg.seed + 1)

    if feed_mode == "stream":
        from deepfluoro_tpu.data.pipeline import PrefetchIterator

        valid_iter = PrefetchIterator(
            valid_data, batch_size=cfg.batch_size, shuffle=False
        ) if mesh is None else BatchIterator(
            valid_data, batch_size=cfg.batch_size, shuffle=False, device_resident=False
        )
    else:
        # validation batches: device-resident upload once, except on a mesh
        # where evaluate() places each batch replicated itself
        valid_iter = BatchIterator(
            valid_data, batch_size=cfg.batch_size, shuffle=False,
            device_resident=mesh is None,
        )

    checkpointer = AsyncCheckpointer()
    # multi-host: process 0 owns every host-side file artifact (checkpoints
    # are gated inside save_checkpoint; loss logs and best-valid copies here)
    is_writer = jax.process_index() == 0
    train_loss_out = RunningFloatWriter(train_loss_txt, new_file=not load_from_checkpoint) if is_writer else None
    valid_loss_out = RunningFloatWriter(valid_loss_txt, new_file=not load_from_checkpoint) if is_writer else None

    enforce_max_hours = cfg.max_hours > 0
    enforce_max_num_restarts = cfg.max_num_restarts > 0

    tot_time_hours = 0.0
    epochs_this_session = 0
    last_loss = None

    # graceful-termination: a SIGTERM finishes the current epoch, then the
    # normal always-checkpoint-on-exit path runs (the reference only covers
    # the wall-clock budget case, train.py:557-576). The handler ONLY sets a
    # flag: print() from signal context re-enters stdout's non-reentrant
    # buffer lock and can raise at the main thread's current bytecode —
    # killing training without the checkpoint the handler exists to save.
    # The message is logged from the loop when the flag is observed.
    stop_requested = {"flag": False}

    def _on_sigterm(signum, frame):
        stop_requested["flag"] = True

    prev_handler = None
    try:
        prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # not the main thread

    log("Start Training...")
    completed = False
    mh_iter = None
    try:
        keep_training = True
        while keep_training:
            epoch_start = time.time()
            log("Epoch: {:03d}".format(epoch))

            num_batches = 0
            avg_loss = 0.0
            running_loss = 0.0
            running_loss_num_iters = max(1, int(0.05 * train_ds_len))
            running_loss_iter = 0
            num_examples_run = 0

            # Losses are fetched lazily so device dispatch runs ahead of the
            # host (the reference syncs every step via loss.item(), train.py:430).
            # Values drain at each 5%-progress boundary and at epoch end, which
            # preserves the per-iteration loss-file contract.
            pending_losses = []

            def drain_losses():
                nonlocal avg_loss, num_batches, running_loss, running_loss_iter, last_loss
                for dev_loss in pending_losses:
                    l = float(dev_loss)
                    last_loss = l
                    if train_loss_out is not None:
                        train_loss_out.write(l)
                    avg_loss += l
                    num_batches += 1
                    running_loss += l
                    running_loss_iter += 1
                    if running_loss_iter == running_loss_num_iters:
                        log("    Running Avg. Loss: {:.6f}".format(running_loss / running_loss_num_iters))
                        running_loss_iter = 0
                        running_loss = 0.0
                pending_losses.clear()

            if feed_mode == "stream":
                batches = enumerate(train_stream.epoch())
            else:
                order = np.arange(train_ds_len)
                shuffle_rng.shuffle(order)
                batches = enumerate(range(0, train_ds_len, cfg.batch_size))

            if feed_mode == "multihost":
                # assemble each global batch on a producer thread: the host
                # slice/read and the per-process device_put of batch b+1
                # overlap step b's compute. With --stream-data the rows come
                # straight off the archive via the lazy reader (per-host
                # disjoint loading); otherwise they slice the resident union.
                from deepfluoro_tpu.data.pipeline import prefetch_sequence
                from deepfluoro_tpu.parallel.multihost import (
                    global_batch_from_local,
                    local_batch_slice,
                )

                div = math.lcm(int(mesh.shape["data"]), jax.process_count())
                starts = list(range(0, train_ds_len, cfg.batch_size))

                def mh_make_batch(i):
                    item = starts[i]
                    gidx = order[item : item + cfg.batch_size]
                    bsize = int(gidx.shape[0])
                    # the explicit cross-process batch assembly
                    # (make_array_from_process_local_data) requires the
                    # global batch to split EVENLY over the whole 'data'
                    # axis AND the processes (lcm) — an indivisible final
                    # partial batch is dropped (the epoch-dependent shuffle
                    # rotates which examples)
                    if bsize % div != 0:
                        return (item, bsize, None)
                    lidx = local_batch_slice(gidx)
                    if mh_stream:
                        p_np, s_np, l_np = reader.take(train_rows[lidx])
                    else:
                        p_np = train_data.projs[lidx]
                        s_np = None if train_data.segs is None else train_data.segs[lidx]
                        l_np = None if train_data.lands is None else train_data.lands[lidx]
                    return (
                        item, bsize,
                        (
                            global_batch_from_local(mesh, p_np),
                            None if s_np is None else global_batch_from_local(mesh, s_np),
                            None if l_np is None else global_batch_from_local(mesh, l_np),
                        ),
                    )

                mh_iter = prefetch_sequence(mh_make_batch, len(starts))
                batches = enumerate(starts)

            for bi, item in batches:
                if lr_sched is not None:
                    lr = lr_sched.get_lr()
                else:
                    lr = cfg.init_lr

                if feed_mode == "stream":
                    projs_b, segs_b, lands_b = item
                    bsize = int(projs_b.shape[0])
                    state, loss = stream_step(
                        state, projs_b, segs_b, lands_b,
                        epoch * train_ds_len + bi * cfg.batch_size, lr,
                    )
                elif feed_mode == "multihost":
                    p_item, bsize, assembled = next(mh_iter)
                    assert p_item == item
                    if assembled is None:
                        # indivisible final partial batch: dropped (the
                        # epoch-dependent shuffle rotates which examples);
                        # the shared example/LR bookkeeping below still runs
                        log("    skipping {}-example tail batch (not divisible "
                            "into equal device/process slices)".format(bsize))
                        loss = None
                    else:
                        projs_b, segs_b, lands_b = assembled
                        state, loss = stream_step(
                            state, projs_b, segs_b, lands_b,
                            epoch * train_ds_len + item, lr,
                        )
                else:
                    idx = order[item : item + cfg.batch_size]
                    bsize = int(idx.shape[0])
                    state, loss = fused_step(
                        state, projs_all, segs_all, lands_all,
                        idx, epoch * train_ds_len + item, lr,
                    )
                if loss is not None:
                    pending_losses.append(loss)

                num_examples_run += bsize
                if lr_sched is not None and lrs_is_cos:
                    lr_sched.intra_epoch_step(num_examples_run / train_ds_len)

                if len(pending_losses) >= running_loss_num_iters:
                    drain_losses()

            drain_losses()
            avg_loss /= num_batches

            log("  Running validation")
            rng, vkey = jax.random.split(rng)
            avg_valid_loss, std_valid_loss = evaluate(
                eval_step, state, valid_data, aug_eval, cfg.batch_size, vkey,
                iterator=valid_iter, mesh=mesh,
            )
            if valid_loss_out is not None:
                valid_loss_out.write(avg_valid_loss)

            log("  Avg. Training Loss: {:.6f}".format(avg_loss))
            log("  Validation Loss: {:.6f} +/- {:.6f}".format(avg_valid_loss, std_valid_loss))

            if lr_sched is not None:
                if lrs_plateau:
                    lr_sched.step(avg_valid_loss)
                else:
                    lr_sched.step()
                if lrs_is_cos and lr_sched.just_restarted:
                    log("  Next epoch is warm restart...")
                    num_restarts += 1

            epoch += 1

            new_best_valid = False
            if best_valid_loss is None or avg_valid_loss < best_valid_loss:
                best_valid_loss = avg_valid_loss
                new_best_valid = True

            def save_net(net_path, light=False):
                # async: snapshot on device, write in a background thread so the
                # next epoch trains while the (large) state serializes. light
                # saves (cfg.light_best_nets) drop optimizer/scheduler state —
                # best-valid / pre-restart files are inference artifacts
                checkpointer.save(
                    net_path,
                    meta=cfg.to_checkpoint_meta(),
                    params=state.params,
                    batch_stats=state.batch_stats,
                    opt_state=None if light else state.opt_state,
                    sched_state=None if light else (
                        lr_sched.state_dict() if lr_sched is not None else None
                    ),
                    epoch=epoch,
                    best_valid_loss=best_valid_loss,
                    last_loss=last_loss,
                    num_restarts=num_restarts,
                    train_idx=train_idx,
                    valid_idx=valid_idx,
                )

            net_saved_this_epoch_path = None
            if (epoch % cfg.checkpoint_freq) == 0:
                log("  Saving checkpoint")
                save_net(checkpoint_filename)
                net_saved_this_epoch_path = checkpoint_filename

            if new_best_valid and cfg.save_best_valid:
                log("  Saving best validation (loss: {:.6f})".format(best_valid_loss))
                if net_saved_this_epoch_path is not None and not cfg.light_best_nets:
                    # ordered behind the pending save of the source file — the
                    # reference's copy-instead-of-resave optimization
                    # (train.py:523-531) without blocking the next epoch. With
                    # light_best_nets the copy would publish a full-state file,
                    # so the light save path is taken instead.
                    checkpointer.copy(net_saved_this_epoch_path, best_valid_filename)
                else:
                    save_net(best_valid_filename, light=cfg.light_best_nets)
                    if not cfg.light_best_nets:
                        net_saved_this_epoch_path = best_valid_filename

            if (
                lrs_is_cos
                and lr_sched.just_restarted
                and cfg.save_restart_net_prefix
                and num_restarts >= cfg.save_after_n_restarts
            ):
                restart_net_path = "{}_{:02d}.pt".format(
                    cfg.save_restart_net_prefix, num_restarts - 1
                )
                log("  Saving network before restart {} to {}".format(num_restarts, restart_net_path))
                if net_saved_this_epoch_path is not None and not cfg.light_best_nets:
                    checkpointer.copy(net_saved_this_epoch_path, restart_net_path)
                else:
                    save_net(restart_net_path, light=cfg.light_best_nets)
                    if not cfg.light_best_nets:
                        net_saved_this_epoch_path = restart_net_path

            this_epoch_hours = (time.time() - epoch_start) / 3600.0
            log("  This epoch took {:.4f} hours!".format(this_epoch_hours))
            tot_time_hours += this_epoch_hours
            epochs_this_session += 1
            avg_epoch_time_hours = tot_time_hours / epochs_this_session
            log("  Current average epoch runtime: {:.4f} hours".format(avg_epoch_time_hours))

            if stop_requested["flag"]:
                keep_training = False
                log("  Exiting - termination requested!")
            if enforce_max_hours:
                if (tot_time_hours + avg_epoch_time_hours) > cfg.max_hours:
                    log("  Exiting - did not expect to be able to complete next epoch within time limit!")
                    keep_training = False
            if enforce_max_num_restarts:
                if num_restarts >= cfg.max_num_restarts:
                    keep_training = False
                    log("  Exiting - maximum number of restarts performed!")
            elif epoch >= cfg.max_num_epochs:
                keep_training = False
                log("  Exiting - maximum number of epochs performed!")

            if multiproc:
                # the stop decision has per-PROCESS inputs (local wall clock for
                # --max-hours, a SIGTERM delivered to one host): without
                # agreement, one process leaves the loop while its peers block
                # forever at the next collective. Stop everywhere if ANY process
                # wants to stop.
                from jax.experimental import multihost_utils

                stops = np.asarray(
                    multihost_utils.process_allgather(
                        np.asarray([0 if keep_training else 1], np.int32)
                    )
                ).reshape(-1)
                if int(stops.max()) and keep_training:
                    keep_training = False
                    log("  Exiting - a peer process requested termination!")

            if not keep_training:
                log("    saving checkpoint before exit!")
                if net_saved_this_epoch_path is None:
                    save_net(checkpoint_filename)
                elif net_saved_this_epoch_path != checkpoint_filename:
                    checkpointer.copy(net_saved_this_epoch_path, checkpoint_filename)

        log("Training Hours: {:.4f}".format(tot_time_hours))
        completed = True
    finally:
        # teardown runs on EVERY exit (an exception mid-epoch must not
        # leak the installed SIGTERM handler or abandon in-flight async
        # checkpoint writes); on the exceptional path a checkpointer
        # error must not mask the original exception
        try:
            checkpointer.wait()
        except Exception:
            if completed:
                raise
        if train_loss_out is not None:
            train_loss_out.close()
        if valid_loss_out is not None:
            valid_loss_out.close()
        if mh_iter is not None:
            # stop the prefetch producer BEFORE closing the reader it reads
            # from (generator close -> prefetch_sequence's finally stops,
            # drains, and joins the producer thread) — an exception mid-epoch
            # must not leave the producer mid-read on a closed h5 handle
            mh_iter.close()
        if reader is not None:
            reader.close()
        if prev_handler is not None:
            try:
                signal.signal(signal.SIGTERM, prev_handler)
            except ValueError:
                pass

    return {
        "state": state,
        "cfg": cfg,
        "model": model,
        "best_valid_loss": best_valid_loss,
        "epoch": epoch,
        "num_restarts": num_restarts,
        "train_idx": train_idx,
        "valid_idx": valid_idx,
    }
