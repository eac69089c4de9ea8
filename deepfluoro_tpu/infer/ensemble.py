"""Ensemble inference as one compiled program.

The reference loops over checkpoints per image (util.py:293-377,
test_ensemble.py): forward each net, average softmax seg outputs, min-max
normalize each net's heatmaps per image before averaging, argmax the averaged
masks, write ``nn-segs`` (u1, gzip-9) and ``nn-heats`` to HDF5, recording
per-image wall-clock times (the paper's latency metric).

TPU-native design: all K checkpoints' parameters are stacked into one pytree
and the forward is ``vmap``-ed over the stacked axis, so the whole ensemble
for a whole *batch* of images is a single XLA program — K net forwards fuse
into batched convs that keep the MXU busy, and the average/argmax fuse in.
The ensemble axis can also be sharded across devices (parallel/sharding.py).

Checkpoints are self-describing: the architecture is rebuilt from stored
hyperparameters exactly like test_ensemble.py:61-98.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from deepfluoro_tpu.data.augment import AugmentConfig, prepare_batch
from deepfluoro_tpu.data.hdf5 import FluoroData
from deepfluoro_tpu.native import write_dataset_direct
from deepfluoro_tpu.data.pipeline import BatchIterator
from deepfluoro_tpu.ops.image import center_crop
from deepfluoro_tpu.train.checkpoint import (
    is_torch_checkpoint,
    load_checkpoint,
    restore_tree,
)
from deepfluoro_tpu.train.config import TrainConfig, build_model
from deepfluoro_tpu.train.step import make_train_state


def _template_dim(cfg: TrainConfig) -> int:
    """Input H=W used to init a parameter-structure template.

    Parameter shapes are spatial-size independent, so any size the forward
    pass accepts works. With SAME padding anything >= 2**(depth-1) does; with
    VALID convs (padding=False) each 3x3 conv eats 2 px per level, so deep
    nets need far more than the halving bound — simulate the down/up path
    and grow until every intermediate stays positive."""
    base = max(int(cfg.proj_unet_dim), 2 ** (cfg.depth + 2))
    if cfg.padding:
        return base

    def output_ok(s: int) -> bool:
        for i in range(cfg.depth):
            s -= 2 * cfg.block_depth
            if i != cfg.depth - 1:
                if s < 2:
                    return False
                s //= 2
        if s < 1:
            return False
        for _ in range(cfg.depth - 1):
            s = 2 * s - 2 * cfg.block_depth
            if s < 1:
                return False
        # (build_model leaves the model's lands_block_depth at 0, so the
        # landmark head adds no further 3x3 shrinkage)
        return s >= 1

    s = base
    while not output_ok(s):
        s += 2 ** (cfg.depth - 1)
    return s


# format sniffing lives beside the loaders (train/checkpoint.py)
_is_torch_checkpoint = is_torch_checkpoint


def _load_net_from_torch_checkpoint(path: str, verbose: bool = True):
    """Drop-in migration: rebuild (model, variables, cfg) from a checkpoint
    the REFERENCE's train.py wrote (train.py:473-515) — architecture from the
    stored hyperparameters (test_ensemble.py:61-98 contract), weights through
    compat.torch_import's layout conversions."""
    from deepfluoro_tpu.compat.torch_import import import_torch_checkpoint

    cfg, params, stats = import_torch_checkpoint(path)
    if verbose:
        print("  loading unet params from torch (reference) checkpoint...")
        print("             num. classes: {}".format(cfg.num_classes))
        print("                    depth: {}".format(cfg.depth))
        print("        init. feats. exp.: {}".format(cfg.init_feats_exp))
        print("              batch norm.: {}".format(cfg.batch_norm))
        print("    reflect pad img. dim.: {}".format(cfg.proj_unet_dim))
        print("              num. lands.: {}".format(cfg.num_lands))
    model = build_model(cfg)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return model, variables, cfg


def load_net_from_checkpoint(path: str, verbose: bool = True):
    """Rebuild (model, variables, cfg) purely from a checkpoint file
    (contract of test_ensemble.py:61-107). Accepts this framework's msgpack
    checkpoints AND the reference's torch ``.pt`` files (auto-detected), so
    reference-trained ensembles run through cli/test_ensemble unchanged."""
    if _is_torch_checkpoint(path):
        return _load_net_from_torch_checkpoint(path, verbose)
    ck = load_checkpoint(path)
    cfg = TrainConfig.from_checkpoint_meta(ck["meta"])
    if verbose:
        print("  loading unet params from checkpoint state dict...")
        print("             num. classes: {}".format(cfg.num_classes))
        print("                    depth: {}".format(cfg.depth))
        print("        init. feats. exp.: {}".format(cfg.init_feats_exp))
        print("              batch norm.: {}".format(cfg.batch_norm))
        print("         unet do pad img.: {}".format(cfg.padding))
        print("              no max pool: {}".format(cfg.no_max_pool))
        print("    reflect pad img. dim.: {}".format(cfg.proj_unet_dim))
        print("            unet use res.: {}".format(cfg.use_res))
        print("         unet block depth: {}".format(cfg.block_depth))
        print("               batch size: {}".format(cfg.batch_size))
        print("              num. lands.: {}".format(cfg.num_lands))
        print("          Last Epoch: {}".format(ck["epoch"]))
        print("           Last Loss: {}".format(ck["loss"]))
        print("    Best Valid. Loss: {}".format(ck["best-valid-loss"]))

    model = build_model(cfg)
    # init a template to get the pytree structure; the size must survive
    # cfg.depth halvings AND the VALID-conv shrinkage when padding=False
    template_dim = _template_dim(cfg)
    _, state = make_train_state(cfg, jax.random.PRNGKey(0), (template_dim, template_dim))
    params = restore_tree(state.params, ck["model-state-dict"]["params"])
    batch_stats = restore_tree(state.batch_stats, ck["model-state-dict"]["batch_stats"])
    variables = {"params": params}
    if ck["model-state-dict"]["batch_stats"]:
        variables["batch_stats"] = batch_stats
    return model, variables, cfg


def stack_variables(variables_list):
    """Stack K compatible variable pytrees along a new leading axis for vmap.
    The reference instead runs a python loop per net (util.py:330-356)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *variables_list)


# Above this many stacked nets, map over the net axis with lax.map instead
# of unrolling (bounds compile time; unrolling is fastest for typical K=6)
_UNROLL_NET_LIMIT = 8


def map_over_nets(one_net, stacked_vars):
    """Apply ``one_net`` to each net of a K-stacked variables tree and stack
    the results along a leading K axis.

    Deliberately NOT jax.vmap: vmapping the forward over the parameter axis
    lowers every convolution to a K-group grouped conv, which the MXU tiles
    worse than K plain convs (measured on v5e with a drained-warmup
    protocol, K=6 batch 64 bf16: vmap 129.3 ms vs unrolled 113.3 ms per
    batch — a 14% win; the same grouped-conv pathology hit the vmapped
    multifold train step and the GSPMD-sharded ensemble, see
    parallel/sharding.py). Small K unrolls into one program of K plain
    forwards; larger K uses lax.map to bound compile time.
    """
    k = jax.tree.leaves(stacked_vars)[0].shape[0]
    if k <= _UNROLL_NET_LIMIT:
        outs = [
            one_net(jax.tree.map(lambda x: x[i], stacked_vars)) for i in range(k)
        ]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
    return jax.lax.map(one_net, stacked_vars)


def postprocess_net_output(out, orig_hw, num_lands):
    """Crop one member's raw forward output back to the original resolution
    and (when the landmark head exists) min-max normalize its heatmaps per
    image over all channels — the reference's per-net normalization
    (util.py:345-356). Shared by the float path below and the int8 path
    (infer/quantized.py::make_quantized_ensemble_forward) so the ensemble
    semantics cannot drift between them."""
    if num_lands > 0:
        seg, heats = out
    else:
        seg, heats = out, None
    seg = center_crop(seg, orig_hw)
    if heats is not None:
        heats = center_crop(heats, orig_hw)
        hmin = jnp.min(heats, axis=(1, 2, 3), keepdims=True)
        hmax = jnp.max(heats, axis=(1, 2, 3), keepdims=True)
        heats = (heats - hmin) / (hmax - hmin)
    return seg, heats


def make_one_net_fn(model, orig_hw, num_lands):
    """The single-member forward of the ensemble program: apply, crop to the
    original resolution, and (when the landmark head exists) min-max
    normalize the heatmaps per image over all channels — the reference's
    per-net normalization (util.py:345-356). Returns
    ``one_net(variables, proj) -> (seg, heats|None)``. Shared by
    _ensemble_forward and the benchmark variants in
    scripts/bench_ensemble_cliff.py so the compared programs cannot drift."""

    def one_net(variables, proj):
        out = model.apply(variables, proj, train=False)
        return postprocess_net_output(out, orig_hw, num_lands)

    return one_net


def _ensemble_forward(model, stacked_vars, proj, orig_hw, num_lands):
    """(K-stacked vars, (B,H,W,1) proj) -> averaged seg probs + heats.

    Per-net heatmap min-max normalization happens per image over all
    landmark channels (util.py:345-356: .min()/.max() are over the full
    (1,L,H,W) tensor of that image).
    """

    net_fn = make_one_net_fn(model, orig_hw, num_lands)
    one_net = lambda variables: net_fn(variables, proj)

    if num_lands > 0:
        segs, heats = map_over_nets(one_net, stacked_vars)  # (K, B, H, W, C/L)
    else:
        segs = map_over_nets(lambda v: one_net(v)[0], stacked_vars)
        heats = None
    avg_seg = jnp.mean(segs, axis=0)
    avg_heats = jnp.mean(heats, axis=0) if num_lands > 0 else None
    pred_labels = jnp.argmax(avg_seg, axis=-1).astype(jnp.uint8)
    return avg_seg, avg_heats, pred_labels


def make_ensemble_forward(model, num_lands: int, orig_hw):
    """Jitted fn(stacked_vars, proj) -> (avg_seg, avg_heats|None, labels)."""

    @jax.jit
    def fwd(stacked_vars, proj):
        return _ensemble_forward(model, stacked_vars, proj, orig_hw, num_lands)

    return fwd


def seg_dataset_ensemble(
    data: FluoroData,
    models_and_vars,
    h5_f,
    num_lands: int = 0,
    times: list | None = None,
    batch_size: int = 1,
    pad_img_dim: int = 0,
    num_classes: int = 7,
    mesh=None,
    quantized: bool = False,
    calib_batches: int = 4,
    int8_float_levels: int = 0,
):
    """Run the ensemble over a dataset and write ``nn-segs`` / ``nn-heats``
    (reference util.py:293-377; file contract incl. dtype/chunks/gzip-9).

    models_and_vars: list of (model, variables) from load_net_from_checkpoint;
    all architectures must match (they do in the documented workflow).

    ``quantized`` (cli/test_ensemble --int8) swaps in the post-training int8
    path (infer/quantized.py): every conv runs s8 x s8 -> s32 on the MXU,
    with per-tensor activation scales calibrated on the first
    ``calib_batches`` batches of THIS dataset (no reference counterpart —
    the reference infers in float32, util.py:321-366). Composes with
    ``mesh``: the stacked int8 member tree shards over 'ensemble' exactly
    like the float parameters (make_sharded_quantized_ensemble_forward).

    ``mesh`` (a jax.sharding.Mesh with an 'ensemble' axis, optionally times
    a 'data' axis — cli/test_ensemble --ensemble-devices/--dp-devices)
    distributes the SAME program across chips: each device runs its local
    checkpoints' forwards and the softmax/heat averages reduce over ICI
    (parallel/sharding.py::make_sharded_ensemble_forward — shard_map, not
    GSPMD, which mispartitions the grouped convs a sharded net-stack lowers
    to). With a 'data' axis every batch is padded up to ``batch_size`` (the
    shard_map batch partition is strictly even), so a final partial batch's
    --times entries report the full-batch wall-clock split over its real
    images — a slight overestimate on that one batch.
    """
    orig_hw = data.orig_img_shape
    n = len(data)

    dst_ds = h5_f.create_dataset(
        "nn-segs",
        (n, *orig_hw),
        dtype="u1",
        chunks=(1, *orig_hw),
        compression="gzip",
        compression_opts=9,
    )
    dst_heats_ds = None
    if num_lands > 0:
        dst_heats_ds = h5_f.create_dataset(
            "nn-heats",
            (n, num_lands, *orig_hw),
            chunks=(1, 1, *orig_hw),
            compression="gzip",
            compression_opts=9,
        )

    model = models_and_vars[0][0]
    aug_cfg = AugmentConfig(
        num_classes=num_classes, proj_pad_dim=pad_img_dim, prob_of_aug=0.0,
        include_heat_map=False,
    )
    key = jax.random.PRNGKey(0)

    # ONE device-resident iterator serves calibration AND the main loop, so
    # the archive uploads to the device once (calibration takes a partial
    # first epoch; .epoch() restarts cleanly for the inference pass)
    it = BatchIterator(data, batch_size=batch_size, shuffle=False, device_resident=True)

    pad_batches = False
    if mesh is not None:
        k = len(models_and_vars)
        ens_size = int(mesh.shape["ensemble"])
        assert k % ens_size == 0, (
            "{} ensemble members do not shard evenly over the {}-way "
            "'ensemble' mesh axis".format(k, ens_size)
        )
        data_size = int(mesh.shape["data"]) if "data" in mesh.axis_names else 1
        assert batch_size % data_size == 0, (
            "batch size {} does not shard evenly over the {}-way 'data' "
            "mesh axis".format(batch_size, data_size)
        )
        # shard_map partitions the batch axis strictly evenly: keep ONE
        # program specialization by padding every batch to batch_size and
        # trimming the outputs
        pad_batches = True

    if quantized:
        from deepfluoro_tpu.infer.quantized import (
            make_quantized_ensemble_forward,
            prepare_quantized_ensemble,
        )

        if calib_batches < 1:
            raise ValueError(
                "--int8 needs at least one calibration batch "
                "(got --int8-calib-batches {})".format(calib_batches)
            )
        prep = jax.jit(lambda p: prepare_batch(aug_cfg, key, p)["proj"])
        calib = []
        for projs, _, _ in it.epoch():
            calib.append(prep(projs))
            if len(calib) >= calib_batches:
                break
        if not calib:
            raise ValueError(
                "cannot calibrate int8 activation scales on an empty dataset"
            )
        stacked = prepare_quantized_ensemble(models_and_vars, calib)
        if mesh is None:
            fwd = make_quantized_ensemble_forward(
                model, num_lands, orig_hw, float_levels=int8_float_levels
            )
        else:
            from deepfluoro_tpu.parallel.sharding import (
                make_sharded_quantized_ensemble_forward,
            )

            fwd, place_stacked = make_sharded_quantized_ensemble_forward(
                model, num_lands, orig_hw, mesh,
                float_levels=int8_float_levels,
            )
            stacked = place_stacked(stacked)
    elif mesh is None:
        stacked = stack_variables([v for _, v in models_and_vars])
        fwd = make_ensemble_forward(model, num_lands, orig_hw)
    else:
        stacked = stack_variables([v for _, v in models_and_vars])
        from deepfluoro_tpu.parallel.sharding import make_sharded_ensemble_forward

        fwd, place_stacked = make_sharded_ensemble_forward(
            model, num_lands, orig_hw, mesh
        )
        stacked = place_stacked(stacked)

    # warm-up: compile the prepare+forward programs before timing, so the
    # --times file reports steady-state per-image latency (the reference's
    # eager loop has no compile cliff to exclude; util.py:321-366). The
    # final partial batch is its OWN specialization — warm it up too, or its
    # recompile lands inside the timed region
    warm_shapes = set()
    if n >= batch_size or pad_batches:
        warm_shapes.add(batch_size)
    if n % batch_size and not pad_batches:
        warm_shapes.add(n % batch_size)
    for warm_b in warm_shapes:
        warm = jnp.zeros((warm_b, *orig_hw), jnp.float32)
        _ = np.asarray(fwd(stacked, prepare_batch(aug_cfg, key, warm)["proj"])[2])

    write_i = 0
    for projs, _, _ in it.epoch():
        real_b = int(projs.shape[0])
        if pad_batches and real_b < batch_size:
            projs = jnp.concatenate(
                [projs, jnp.repeat(projs[-1:], batch_size - real_b, axis=0)]
            )
        start_time = time.time()
        prepared = prepare_batch(aug_cfg, key, projs)
        _, avg_heats, pred_labels = fwd(stacked, prepared["proj"])
        # drain with a scalar readback INSIDE the timed region: on some
        # remote transports block_until_ready returns before execution
        # finishes, which would under-report the paper's latency metric
        _ = np.asarray(pred_labels[0, 0, 0])
        stop_time = time.time()
        if pad_batches and real_b < batch_size:
            pred_labels = pred_labels[:real_b]
            if avg_heats is not None:
                avg_heats = avg_heats[:real_b]

        b = real_b
        if times is not None:
            # per-image share of the batch wall-clock (batch 1 == reference)
            times.extend([(stop_time - start_time) / b] * b)

        # parallel-compress + direct chunk writes (native/chunkzip.cpp)
        # instead of h5py's serial gzip filter pipeline
        write_dataset_direct(dst_ds, write_i, np.asarray(pred_labels))
        if dst_heats_ds is not None:
            # NHWC -> (B, L, R, C) for the HDF5 contract
            write_dataset_direct(
                dst_heats_ds, write_i, np.transpose(np.asarray(avg_heats), (0, 3, 1, 2))
            )
        write_i += b

    assert write_i == n


def seg_dataset(
    data: FluoroData,
    model_and_vars,
    h5_f,
    num_lands: int = 0,
    batch_size: int = 1,
    pad_img_dim: int = 0,
    num_classes: int = 7,
    quantized: bool = False,
    calib_batches: int = 4,
    int8_float_levels: int = 0,
):
    """Single-network variant (reference util.py:243-291) — an ensemble of
    one; same nn-segs/nn-heats output contract. NOTE: the single-net
    reference path does NOT min-max normalize heatmaps (util.py:286) while
    the ensemble path does (util.py:345-356); since normalization is
    monotonic per-image it does not affect landmark argmax decoding, and we
    keep the (documented) ensemble behavior here for consistency."""
    return seg_dataset_ensemble(
        data,
        [model_and_vars],
        h5_f,
        num_lands=num_lands,
        batch_size=batch_size,
        pad_img_dim=pad_img_dim,
        num_classes=num_classes,
        quantized=quantized,
        calib_batches=calib_batches,
        int8_float_levels=int8_float_levels,
    )


def test_dataset_ensemble(
    data: FluoroData,
    models_and_vars,
    num_lands: int = 0,
    dice_only: bool = False,
    batch_size: int = 1,
    pad_img_dim: int = 0,
    num_classes: int = 7,
    heat_coeff: float = 0.5,
):
    """Ensemble validation-loss evaluation (reference util.py:167-241):
    averaged seg/heat predictions -> per-image loss -> (mean, std).

    NOTE (replicated semantics): unlike seg_dataset_ensemble, the loss-eval
    path does NOT min-max normalize per-net heatmaps (util.py:216-222)."""
    from deepfluoro_tpu.ops.losses import per_sample_dice, per_sample_joint

    orig_hw = data.orig_img_shape
    model = models_and_vars[0][0]
    stacked = stack_variables([v for _, v in models_and_vars])
    use_lands = (num_lands > 0) and not dice_only

    @jax.jit
    def eval_batch(stacked_vars, proj, seg, heats):
        def one_net(variables):
            out = model.apply(variables, proj, train=False)
            if num_lands > 0:
                s, h = out
            else:
                s, h = out, None
            s = center_crop(s, orig_hw)
            if h is not None:
                h = center_crop(h, orig_hw)
            return s, h

        if num_lands > 0:
            segs_k, heats_k = map_over_nets(one_net, stacked_vars)
        else:
            segs_k = map_over_nets(lambda v: one_net(v)[0], stacked_vars)
            heats_k = None
        avg_seg = jnp.mean(segs_k, axis=0)
        if use_lands:
            avg_heats = jnp.mean(heats_k, axis=0)
            # the reference builds ONE criterion from flags and reuses it for
            # validation (train.py:321-327); honor the configured weighting
            return per_sample_joint(avg_seg, avg_heats, seg, heats, heat_coeff)
        return per_sample_dice(avg_seg, seg, skip_bg=False)

    aug_cfg = AugmentConfig(
        num_classes=num_classes, proj_pad_dim=pad_img_dim, prob_of_aug=0.0,
        # dice-only eval never reads target heatmaps — skip synthesizing them
        include_heat_map=use_lands,
    )
    it = BatchIterator(data, batch_size=batch_size, shuffle=False)
    key = jax.random.PRNGKey(0)
    losses = []
    for bi, (projs, segs, lands) in enumerate(it.epoch()):
        prepared = prepare_batch(aug_cfg, jax.random.fold_in(key, bi), projs, segs, lands)
        losses.append(
            np.asarray(
                eval_batch(
                    stacked, prepared["proj"], prepared["seg"], prepared.get("heats")
                )
            )
        )
    losses = np.concatenate(losses)
    std = float(losses.std(ddof=1)) if losses.size > 1 else 0.0
    return float(losses.mean()), std
