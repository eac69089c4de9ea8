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

from deepfluoro_tpu.ops.image import center_crop
from deepfluoro_tpu.train.config import TrainConfig
from deepfluoro_tpu.train.step import TrainState, _per_sample_dice, _per_sample_joint


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
    has_lands = cfg.num_lands > 0
    has_bn = cfg.batch_norm
    repl = NamedSharding(mesh, P())

    def loss_fn(params, batch_stats, proj, seg, heats):
        variables = {"params": params}
        if has_bn:
            variables["batch_stats"] = batch_stats
            out, mutated = model.apply(variables, proj, train=True, mutable=["batch_stats"])
            new_bs = mutated["batch_stats"]
        else:
            out = model.apply(variables, proj, train=True)
            new_bs = batch_stats
        if has_lands:
            pred_seg, pred_heats = out
        else:
            pred_seg = out
        pred_seg = center_crop(pred_seg, (seg.shape[1], seg.shape[2]))
        if has_lands:
            pred_heats = center_crop(pred_heats, (heats.shape[1], heats.shape[2]))
            loss = jnp.mean(_per_sample_joint(pred_seg, pred_heats, seg, heats, cfg.heat_coeff))
        else:
            loss = jnp.mean(_per_sample_dice(pred_seg, seg, skip_bg=False))
        return loss, new_bs

    import optax

    def step(state: TrainState, proj, seg, heats, lr):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, proj, seg, heats
        )
        opt_state = state.opt_state._replace(
            hyperparams={**state.opt_state.hyperparams, "learning_rate": jnp.asarray(lr, jnp.float32)}
        )
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=new_params, batch_stats=new_bs, opt_state=new_opt_state, step=state.step + 1),
            loss,
        )

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


def make_sharded_ensemble_forward(
    model, num_lands: int, orig_hw, mesh: Mesh
):
    """Ensemble forward with the stacked-checkpoint axis sharded over
    'ensemble' (and the batch over 'data' when present).

    Built with shard_map + explicit psum rather than GSPMD in/out shardings:
    the partitioner mishandles the grouped convolutions a vmapped-and-
    sharded ensemble lowers to, while shard_map keeps each device running
    its local checkpoints' plain convs and reduces the softmax/heat sums
    over ICI.
    """
    ens = "ensemble"
    assert ens in mesh.axis_names
    data = "data" if "data" in mesh.axis_names else None
    k_total = mesh.shape[ens]

    def local_fwd(stacked_vars, proj):
        def one_net(variables):
            out = model.apply(variables, proj, train=False)
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

        segs, heats = jax.vmap(one_net)(stacked_vars)
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

    def place_stacked(stacked_vars):
        return jax.device_put(stacked_vars, var_sharding)

    return fwd, place_stacked
