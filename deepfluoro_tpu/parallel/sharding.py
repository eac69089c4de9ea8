"""Sharded training and inference programs.

Strategy (SURVEY.md §2.3, rebuilt TPU-native):

- **Data parallel (DP)**: batch axis sharded over 'data'; parameters and
  optimizer state replicated. The loss is a mean over the global batch, so
  the GSPMD partitioner emits the gradient all-reduce (psum over ICI)
  automatically — no hand-written collectives.
- **Spatial parallel (the SP/CP analogue)**: image H axis sharded over
  'spatial' for 2x/full-res frames; XLA inserts convolution halo exchanges.
  An explicit shard_map + ppermute implementation lives in parallel/halo.py
  for cases where manual control wins.
- **Ensemble parallel (the EP analogue)**: the stacked checkpoint axis of
  ensemble inference sharded over 'ensemble', replacing the reference's
  sequential per-net python loop (util.py:330-356).

All entry points take a Mesh and return jitted functions with explicit
in/out shardings; on a 1-device mesh they degrade to the unsharded programs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepfluoro_tpu.train.config import TrainConfig
from deepfluoro_tpu.train.step import TrainState


def shard_batch(mesh: Mesh, *arrays, spatial: bool = False):
    """Place batch arrays with the batch axis sharded over 'data' (and
    optionally H over 'spatial' for rank>=3 arrays)."""
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        spec = [None] * a.ndim
        if "data" in mesh.axis_names:
            spec[0] = "data"
        if spatial and "spatial" in mesh.axis_names and a.ndim >= 3:
            spec[1] = "spatial"
        out.append(jax.device_put(a, NamedSharding(mesh, P(*spec))))
    return tuple(out) if len(out) > 1 else out[0]


def _batch_spec(mesh: Mesh, ndim: int, spatial: bool) -> P:
    spec = [None] * ndim
    if "data" in mesh.axis_names:
        spec[0] = "data"
    if spatial and "spatial" in mesh.axis_names and ndim >= 3:
        spec[1] = "spatial"
    return P(*spec)


def make_sharded_train_step(cfg: TrainConfig, model, tx, mesh: Mesh, spatial: bool = False):
    """DP (+optional spatial) train step over ``mesh``.

    Parameters/optimizer state are replicated; the batch is sharded. Returns
    (train_step, place_state) where place_state puts a TrainState onto the
    mesh with replicated sharding.
    """
    from deepfluoro_tpu.train.step import grad_and_update, make_loss_fn

    has_lands = cfg.num_lands > 0
    repl = NamedSharding(mesh, P())
    loss_fn = make_loss_fn(cfg, model)

    def step(state: TrainState, proj, seg, heats, lr):
        return grad_and_update(loss_fn, tx, state, proj, seg, heats, lr)

    def in_shardings(proj_ndim, seg_ndim, heats_ndim):
        batch = NamedSharding(mesh, _batch_spec(mesh, proj_ndim, spatial))
        seg_sh = NamedSharding(mesh, _batch_spec(mesh, seg_ndim, spatial))
        heats_sh = None if heats_ndim is None else NamedSharding(mesh, _batch_spec(mesh, heats_ndim, spatial))
        return batch, seg_sh, heats_sh

    proj_sh, seg_sh, heats_sh = in_shardings(4, 4, 4 if has_lands else None)

    jit_step = jax.jit(
        step,
        in_shardings=(repl, proj_sh, seg_sh, heats_sh if has_lands else None, None),
        out_shardings=(repl, repl),
    )

    def place_state(state: TrainState) -> TrainState:
        return jax.device_put(state, repl)

    return jit_step, place_state


def _tp_leaf_sharding(mesh: Mesh, axis: str, x) -> NamedSharding:
    """Channel (trailing-axis) sharding rule for one state leaf: conv kernels
    (kh, kw, cin, cout), biases (cout,), BN scale/bias/stats (c,) and the
    matching optimizer momentum buffers all shard their last axis over the
    TP mesh axis when divisible; scalars and indivisible leaves replicate."""
    size = mesh.shape[axis]
    if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[-1] >= size and x.shape[-1] % size == 0:
        return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + [axis])))
    return NamedSharding(mesh, P())


def tp_state_shardings(mesh: Mesh, state_template, axis: str = "model"):
    """The tensor-parallel sharding tree for a TrainState (or any pytree):
    each leaf mapped through the channel-sharding rule above. Shared by
    make_tp_train_step and by sharded-checkpoint restore
    (train/sharded_checkpoint.py), so a checkpoint saved from one TP degree
    can be re-placed onto another."""
    return jax.tree.map(partial(_tp_leaf_sharding, mesh, axis), state_template)


def make_tp_train_step(
    cfg: TrainConfig,
    model,
    tx,
    mesh: Mesh,
    state_template: TrainState,
    axis: str = "model",
    spatial: bool = False,
):
    """Tensor-parallel train step: filters sharded along the output-channel
    axis (SURVEY.md §2.3 TP row — optional for this model size, built as the
    minimal GSPMD variant).

    Every parameter / optimizer-buffer leaf is sharded on its trailing axis
    over ``axis`` when divisible (2**wf channels at level 0, doubling per
    level, so any power-of-two TP degree <= 2**wf shards every conv). TP
    composes with data parallelism through the mesh itself: when the mesh
    also has a 'data' axis the batch is sharded over it (DP x TP, verified
    exact against the unsharded step); with no 'data' axis the batch
    replicates and the step is pure TP. XLA's partitioner propagates the
    channel sharding through the forward/backward convs and inserts the
    collectives.

    ``spatial=True`` (H-axis sharding on top of TP) is REJECTED: measured on
    jax 0.8 CPU meshes, the GSPMD partitioner produces wrong first-conv
    weight/bias gradients (~1e-3 absolute, 100% relative) when a
    spatially-sharded activation meets a channel-sharded kernel, alongside
    an "involuntary full rematerialization" warning — the same partitioner
    genus as the grouped-conv ensemble pathology (see
    make_sharded_ensemble_forward). Shard spatially with
    make_sharded_train_step (DP x spatial, verified exact at depth 6)
    instead. Returns (train_step, place_state); place_state distributes a
    TrainState onto the mesh with the same rule the step's in/out shardings
    pin.
    """
    from deepfluoro_tpu.train.step import grad_and_update, make_loss_fn

    assert axis in mesh.axis_names
    if spatial and "spatial" in mesh.axis_names:
        raise NotImplementedError(
            "spatial x tensor-parallel composition is disabled: the GSPMD "
            "partitioner mis-computes first-conv weight gradients for "
            "spatially-sharded inputs against channel-sharded kernels "
            "(measured ~1e-3 error); use make_sharded_train_step for "
            "spatial sharding"
        )
    loss_fn = make_loss_fn(cfg, model)
    repl = NamedSharding(mesh, P())

    state_shardings = tp_state_shardings(mesh, state_template, axis)

    def step(state: TrainState, proj, seg, heats, lr):
        return grad_and_update(loss_fn, tx, state, proj, seg, heats, lr)

    batch_sh = NamedSharding(mesh, _batch_spec(mesh, 4, spatial))

    jit_step = jax.jit(
        step,
        in_shardings=(
            state_shardings,
            batch_sh,
            batch_sh,
            batch_sh if cfg.num_lands > 0 else None,
            None,
        ),
        out_shardings=(state_shardings, repl),
    )

    def place_state(state: TrainState) -> TrainState:
        return jax.tree.map(
            lambda x, s: jax.device_put(x, s), state, state_shardings
        )

    return jit_step, place_state


def _make_sharded_member_forward(apply_fn, num_lands: int, orig_hw, mesh: Mesh):
    """Shared core of the sharded (float and int8) ensemble forwards: the
    K-stacked member tree is sharded over 'ensemble' (and the batch over
    'data' when present); ``apply_fn(member_slice, proj)`` runs one member.

    Built with shard_map + explicit psum rather than GSPMD in/out shardings:
    the partitioner mishandles the grouped convolutions a vmapped-and-
    sharded ensemble lowers to, while shard_map keeps each device running
    its local checkpoints' plain convs and reduces the softmax/heat sums
    over ICI. The local nets are unrolled, not vmapped, for the same
    grouped-conv reason (see infer.ensemble.map_over_nets).
    """
    from deepfluoro_tpu.infer.ensemble import map_over_nets, postprocess_net_output

    ens = "ensemble"
    assert ens in mesh.axis_names
    data = "data" if "data" in mesh.axis_names else None
    ens_size = int(mesh.shape[ens])

    def local_fwd(stacked, proj):
        # inside shard_map the stacked axis holds this device's K/ens_size
        # nets; the TOTAL member count (the average's denominator) is the
        # local count times the axis size — NOT the axis size itself, which
        # only coincides when every device holds exactly one net
        k_total = jax.tree.leaves(stacked)[0].shape[0] * ens_size

        def one_net(member):
            return postprocess_net_output(
                apply_fn(member, proj), orig_hw, num_lands
            )

        if num_lands > 0:
            segs, heats = map_over_nets(one_net, stacked)
        else:
            segs = map_over_nets(lambda m: one_net(m)[0], stacked)
            heats = None
        sum_seg = jax.lax.psum(jnp.sum(segs, axis=0), ens)
        avg_seg = sum_seg / k_total
        if num_lands > 0:
            avg_heats = jax.lax.psum(jnp.sum(heats, axis=0), ens) / k_total
        else:
            avg_heats = None
        labels = jnp.argmax(avg_seg, axis=-1).astype(jnp.uint8)
        return avg_seg, avg_heats, labels

    batch_spec = P(data, None, None, None)
    out_batch3 = P(data, None, None)
    out_batch4 = P(data, None, None, None)

    fwd = jax.jit(
        jax.shard_map(
            local_fwd,
            mesh=mesh,
            in_specs=(P(ens), batch_spec),
            out_specs=(out_batch4, out_batch4 if num_lands > 0 else None, out_batch3),
        )
    )

    var_sharding = NamedSharding(mesh, P(ens))

    def place_stacked(stacked):
        return jax.device_put(stacked, var_sharding)

    return fwd, place_stacked


def make_sharded_ensemble_forward(
    model, num_lands: int, orig_hw, mesh: Mesh
):
    """Float ensemble forward with the stacked-checkpoint axis sharded over
    'ensemble' (and the batch over 'data' when present). See
    :func:`_make_sharded_member_forward` for the shard_map rationale."""
    return _make_sharded_member_forward(
        lambda variables, proj: model.apply(variables, proj, train=False),
        num_lands, orig_hw, mesh,
    )


def make_sharded_quantized_ensemble_forward(
    model, num_lands: int, orig_hw, mesh: Mesh, float_levels: int = 0
):
    """int8 ensemble forward (infer/quantized.py) sharded exactly like the
    float path: each device runs its local members' w8a8 convs and the
    softmax/heat sums reduce over ICI; the stacked (variables, qweights,
    scales) tree from prepare_quantized_ensemble shards member-axis-first
    on every leaf (int8 kernels included). Averaging semantics — crop,
    per-image heatmap min-max, TOTAL-member denominator — are shared with
    the float path via postprocess_net_output/_make_sharded_member_forward,
    so the two cannot drift (reference util.py:345-356)."""
    from deepfluoro_tpu.infer.quantized import (
        make_level_filter, quantized_member_apply,
    )

    int8_points = make_level_filter(float_levels, model.depth)
    return _make_sharded_member_forward(
        lambda member, proj: quantized_member_apply(
            model, member, proj, int8_points=int8_points
        ),
        num_lands, orig_hw, mesh,
    )
