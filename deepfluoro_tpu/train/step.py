"""Jitted train / eval steps.

The reference's per-iteration hot path (train.py:392-432: forward, crop,
loss, backward, SGD step) becomes a single compiled XLA program:
``value_and_grad`` over the joint loss, optax update, BN batch-stats
mutation — one device launch per step, no host sync except the scalar loss
fetch the loop chooses to make.

The learning rate is an *argument* to the step (a scalar jnp array), because
the reference drives intra-epoch cosine updates from the loop
(train.py:427-428); passing it per call avoids recompilation.

Optimizer semantics match torch (train.py:331-351):
  sgd     : grad += wd*param; buf = m*buf + grad; nesterov: grad += m*buf
  adam    : L2 weight decay folded into the gradient (torch Adam, not AdamW)
  rmsprop : wd folded in, momentum on the normalized update
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from deepfluoro_tpu.ops.image import center_crop
from deepfluoro_tpu.ops.losses import per_sample_dice, per_sample_joint
from deepfluoro_tpu.train.config import TrainConfig, build_model


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Torch-semantics optimizers; LR is injected per-update via
    ``optax.inject_hyperparams`` so the host loop can drive schedules."""
    wd = cfg.wgt_decay

    if cfg.optim_type == "sgd":

        def make(learning_rate):
            parts = []
            if wd > 0:
                parts.append(optax.add_decayed_weights(wd))
            if cfg.momentum > 0:
                parts.append(optax.trace(decay=cfg.momentum, nesterov=cfg.nesterov))
            parts.append(optax.scale_by_learning_rate(learning_rate))
            return optax.chain(*parts)

    elif cfg.optim_type == "adam":

        def make(learning_rate):
            parts = []
            if wd > 0:
                parts.append(optax.add_decayed_weights(wd))
            parts.append(optax.scale_by_adam())
            parts.append(optax.scale_by_learning_rate(learning_rate))
            return optax.chain(*parts)

    elif cfg.optim_type == "rmsprop":

        def make(learning_rate):
            parts = []
            if wd > 0:
                parts.append(optax.add_decayed_weights(wd))
            # torch RMSprop adds eps OUTSIDE the sqrt (optax's default is inside)
            parts.append(optax.scale_by_rms(decay=0.99, eps=1e-8, eps_in_sqrt=False))
            if cfg.momentum > 0:
                parts.append(optax.trace(decay=cfg.momentum, nesterov=False))
            parts.append(optax.scale_by_learning_rate(learning_rate))
            return optax.chain(*parts)

    else:
        raise ValueError("unknown optimizer: {}".format(cfg.optim_type))

    return optax.inject_hyperparams(make)(learning_rate=cfg.init_lr)


@partial(jax.jit, static_argnames=("model",))
def _jitted_init(model, rng_key, dummy):
    # JIT the init: an eager depth-6 init dispatches hundreds of tiny ops
    # (minutes over remote-device tunnels — CLAUDE.md); linen Modules are
    # frozen dataclasses, so jit caches per model CONFIG and repeated inits
    # (e.g. the K folds of make_multifold_state) compile once
    return model.init(rng_key, dummy, train=False)


def make_train_state(cfg: TrainConfig, rng_key, sample_shape) -> tuple[Any, TrainState]:
    """Initialize model variables and optimizer state.

    sample_shape: (H, W) of the padded network input.
    """
    model = build_model(cfg)
    dummy = jnp.zeros((1, sample_shape[0], sample_shape[1], 1), jnp.float32)
    variables = _jitted_init(model, rng_key, dummy)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    )
    return model, state


# per-sample losses live in ops/losses.py (single source of the eps-sensitive
# dice expression); aliases kept for the validation/ensemble consumers
_per_sample_dice = per_sample_dice
_per_sample_joint = per_sample_joint


def make_loss_fn(cfg: TrainConfig, model):
    """Shared training loss: forward (with BN batch-stats mutation), crop
    predictions back to the target resolution (train.py:414-417), joint or
    dice-only loss. Returns loss_fn(params, batch_stats, proj, seg, heats)
    -> (loss, new_batch_stats). Used by the plain, fused, sharded, and
    multi-fold train steps."""
    has_lands = cfg.num_lands > 0
    has_bn = cfg.batch_norm

    def loss_fn(params, batch_stats, proj, seg, heats):
        variables = {"params": params}
        if has_bn:
            variables["batch_stats"] = batch_stats
            out, mutated = model.apply(
                variables, proj, train=True, mutable=["batch_stats"]
            )
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
            loss = jnp.mean(
                per_sample_joint(pred_seg, pred_heats, seg, heats, cfg.heat_coeff)
            )
        else:
            loss = jnp.mean(per_sample_dice(pred_seg, seg, skip_bg=False))
        return loss, new_bs

    return loss_fn


def inject_torch_moments_into_opt_state(opt_state, moments: dict):
    """Graft imported torch optimizer moments (compat/torch_import.py::
    _import_torch_opt_moments) into a freshly initialized optax opt_state.

    The mappings mirror make_optimizer's chains exactly:
      sgd     momentum_buffer -> TraceState.trace
      adam    exp_avg/exp_avg_sq/step -> ScaleByAdamState.mu/nu/count
      rmsprop square_avg -> ScaleByRmsState.nu; momentum_buffer -> trace

    Walks the (possibly nested) chain/inject_hyperparams named-tuple
    structure; every state the kind implies must be found exactly once."""
    kind = moments["kind"]
    to_tree = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
    found: dict = {}

    def rec(s):
        if isinstance(s, optax.TraceState) and "momentum_buffer" in moments:
            found["trace"] = found.get("trace", 0) + 1
            return optax.TraceState(trace=to_tree(moments["momentum_buffer"]))
        if isinstance(s, optax.ScaleByAdamState) and kind == "adam":
            found["adam"] = found.get("adam", 0) + 1
            return optax.ScaleByAdamState(
                count=jnp.asarray(moments["count"], jnp.int32),
                mu=to_tree(moments["exp_avg"]),
                nu=to_tree(moments["exp_avg_sq"]),
            )
        if isinstance(s, optax.ScaleByRmsState) and kind == "rmsprop":
            found["rms"] = found.get("rms", 0) + 1
            return optax.ScaleByRmsState(nu=to_tree(moments["square_avg"]))
        if isinstance(s, tuple) and hasattr(s, "_fields"):  # NamedTuple
            return type(s)(*[rec(getattr(s, f)) for f in s._fields])
        if isinstance(s, tuple):
            return tuple(rec(x) for x in s)
        return s

    out = rec(opt_state)
    expected = {
        "sgd": {"trace": 1} if "momentum_buffer" in moments else {},
        "adam": {"adam": 1},
        "rmsprop": (
            {"rms": 1, "trace": 1} if "momentum_buffer" in moments else {"rms": 1}
        ),
    }[kind]
    assert found == expected, (
        "optimizer chain states did not match the imported torch moments: "
        "found {}, expected {}".format(found, expected)
    )
    return out


def grad_and_update(loss_fn, tx, state: TrainState, proj, seg, heats, lr):
    """value_and_grad + LR injection + optax update -> (new_state, loss).
    Shared tail of every train-step variant."""
    (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, state.batch_stats, proj, seg, heats
    )
    opt_state = state.opt_state._replace(
        hyperparams={
            **state.opt_state.hyperparams,
            "learning_rate": jnp.asarray(lr, jnp.float32),
        }
    )
    updates, new_opt_state = tx.update(grads, opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return (
        TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            step=state.step + 1,
        ),
        loss,
    )


def make_train_step(cfg: TrainConfig, model, tx):
    """Returns jitted train_step(state, proj, seg, heats, lr) -> (state, loss)."""
    loss_fn = make_loss_fn(cfg, model)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, proj, seg, heats, lr):
        return grad_and_update(loss_fn, tx, state, proj, seg, heats, lr)

    return train_step


def _make_batch_constrainers(mesh, spatial: bool):
    """(pre_aug, post_aug) constraint fns pinning how the in-program batch is
    partitioned over the mesh. pre_aug shards only the batch axis over
    'data' (so the vmapped augmentation splits across devices but each
    sample's warp stays whole on one device); post_aug additionally shards
    the image H axis over 'spatial' — the network compute is where spatial
    partitioning pays, and the GSPMD partitioner inserts the conv halo
    exchanges (verified exact at depth 6 in tests/test_parallel.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    data = "data" if "data" in mesh.axis_names else None
    sp = "spatial" if (spatial and "spatial" in mesh.axis_names) else None
    if sp is not None and "model" in mesh.axis_names:
        # same guard as make_tp_train_step — this shared builder is the
        # library path fit() uses, and accepting the combination here would
        # silently train on the corrupted gradients the CLI rejects
        raise NotImplementedError(
            "spatial x tensor-parallel composition is disabled: the GSPMD "
            "partitioner mis-computes first-conv weight gradients for "
            "spatially-sharded inputs against channel-sharded kernels "
            "(measured ~1e-3 error); drop the 'model' axis or pass "
            "spatial=False"
        )

    def constrain(x, with_spatial):
        if x is None:
            return None
        spec = [None] * x.ndim
        spec[0] = data
        if with_spatial and x.ndim >= 3:
            spec[1] = sp
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))

    pre_aug = lambda x: constrain(x, False)
    post_aug = lambda x: constrain(x, True)
    return pre_aug, post_aug


def _replicated_out_jit_kwargs(mesh) -> dict:
    """out_shardings pinning (state, loss) replicated over the mesh — the
    gradient all-reduce already produces identical updates everywhere; the
    pin keeps the partitioner from inventing a weight layout that would
    reshard on every host read (checkpointing, loss fetch)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return {"out_shardings": NamedSharding(mesh, P())}


def _step_out_jit_kwargs(mesh, state_template) -> dict:
    """out_shardings for a (state, loss) step on ``mesh``. Without a 'model'
    axis the state replicates (see _replicated_out_jit_kwargs). With one —
    tensor parallelism — every state leaf keeps its channel sharding
    (parallel.sharding.tp_state_shardings, the same rule place/restore use)
    and only the loss replicates; ``state_template`` supplies the leaf
    shapes and must be given."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if "model" not in mesh.axis_names:
        return _replicated_out_jit_kwargs(mesh)
    # lazy import: parallel.sharding imports this module at load time
    from deepfluoro_tpu.parallel.sharding import tp_state_shardings

    assert state_template is not None, (
        "a mesh with a 'model' (tensor-parallel) axis needs the state "
        "template to derive per-leaf shardings"
    )
    return {
        "out_shardings": (
            tp_state_shardings(mesh, state_template),
            NamedSharding(mesh, P()),
        )
    }


def make_fused_train_step(cfg: TrainConfig, model, tx, aug_cfg, mesh=None, spatial=False, state_template=None):
    """One-dispatch-per-step training: batch gather from the device-resident
    dataset, PRNG fold-in, the full augmentation pipeline, and the train
    step fused into a single jitted program.

    Signature: fused(state, projs_all, segs_all, lands_all, idx, step_seed,
    lr) -> (state, loss). The dataset arrays live on device and are passed
    by reference each call; only ``idx`` (batch,) and two scalars cross the
    host boundary. This collapses the ~6 device dispatches per step of the
    naive loop — significant on remote/tunneled devices where each dispatch
    pays an RTT, and it lets XLA schedule augmentation and forward together.

    With ``mesh`` the same single program scales across chips (SURVEY §2.3
    names DP the primary scaling axis — the reference's analogous lever is
    its DataLoader worker pool, train.py:293-296): the dataset arrays and
    state live replicated on the mesh, and sharding constraints split the
    gathered batch over 'data' (and, with ``spatial=True``, the image rows
    over 'spatial') so the partitioner distributes augmentation + fwd/bwd
    and emits the gradient all-reduce. State and loss come back replicated.
    """
    from deepfluoro_tpu.data.augment import prepare_batch

    loss_fn = make_loss_fn(cfg, model)
    if mesh is not None:
        pre_aug, post_aug = _make_batch_constrainers(mesh, spatial)
        jit_kwargs = _step_out_jit_kwargs(mesh, state_template)
    else:
        pre_aug = post_aug = lambda x: x
        jit_kwargs = {}

    @partial(jax.jit, donate_argnums=(0,), **jit_kwargs)
    def fused(state: TrainState, projs_all, segs_all, lands_all, idx, step_seed, lr):
        projs = pre_aug(jnp.take(projs_all, idx, axis=0))
        segs = pre_aug(jnp.take(segs_all, idx, axis=0)) if segs_all is not None else None
        lands = pre_aug(jnp.take(lands_all, idx, axis=0)) if lands_all is not None else None

        key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), step_seed)
        prepared = prepare_batch(aug_cfg, key, projs, segs, lands)

        return grad_and_update(
            loss_fn, tx, state,
            post_aug(prepared["proj"]),
            post_aug(prepared.get("seg")),
            post_aug(prepared.get("heats")),
            lr,
        )

    return fused


def make_streaming_train_step(cfg: TrainConfig, model, tx, aug_cfg, mesh=None, spatial=False, state_template=None):
    """Train step for HOST-resident datasets (too large for HBM): consumes a
    raw streamed batch instead of gathering from device-resident arrays, but
    still fuses augmentation + forward/backward + update into one dispatch.
    Pair with data.pipeline.PrefetchIterator so the next batch's H2D
    transfer overlaps this step's compute.

    With ``mesh`` the streamed batch is processed sharded over 'data' (and
    optionally 'spatial'), with state replicated — this is the multi-host
    training path: each process feeds its contiguous slice of the global
    batch (parallel.multihost.global_batch_from_local) and XLA reduces
    gradients over ICI/DCN.

    Signature: step(state, projs (B,H,W), segs, lands, step_seed, lr)
    -> (state, loss)."""
    from deepfluoro_tpu.data.augment import prepare_batch

    loss_fn = make_loss_fn(cfg, model)
    if mesh is not None:
        pre_aug, post_aug = _make_batch_constrainers(mesh, spatial)
        jit_kwargs = _step_out_jit_kwargs(mesh, state_template)
    else:
        pre_aug = post_aug = lambda x: x
        jit_kwargs = {}

    @partial(jax.jit, donate_argnums=(0,), **jit_kwargs)
    def step(state: TrainState, projs, segs, lands, step_seed, lr):
        projs = pre_aug(projs)
        segs = pre_aug(segs) if segs is not None else None
        lands = pre_aug(lands) if lands is not None else None
        key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), step_seed)
        prepared = prepare_batch(aug_cfg, key, projs, segs, lands)
        return grad_and_update(
            loss_fn, tx, state,
            post_aug(prepared["proj"]),
            post_aug(prepared.get("seg")),
            post_aug(prepared.get("heats")),
            lr,
        )

    return step


def make_eval_losses_fn(cfg: TrainConfig, model, num_lands_for_loss: int | None = None):
    """Unjitted per-sample eval losses: fn(state, proj, seg, heats) -> (B,).

    ``num_lands_for_loss=0`` evaluates dice-only even for a joint model
    (--dice-valid, train.py:448-449). Shared by the plain eval step and the
    vmapped multi-fold evaluator."""
    model_has_lands = cfg.num_lands > 0
    use_lands = (
        model_has_lands if num_lands_for_loss is None else num_lands_for_loss > 0
    )

    def eval_losses(state: TrainState, proj, seg, heats):
        variables = {"params": state.params}
        if cfg.batch_norm:
            variables["batch_stats"] = state.batch_stats
        out = model.apply(variables, proj, train=False)
        if model_has_lands:
            pred_seg, pred_heats = out
        else:
            pred_seg = out
        pred_seg = center_crop(pred_seg, (seg.shape[1], seg.shape[2]))
        if use_lands:
            pred_heats = center_crop(pred_heats, (heats.shape[1], heats.shape[2]))
            # one criterion for train AND validation (train.py:321-327,
            # util.py:116-165): the configured heat_coeff applies here too
            return per_sample_joint(pred_seg, pred_heats, seg, heats, cfg.heat_coeff)
        return per_sample_dice(pred_seg, seg, skip_bg=False)

    return eval_losses


def make_eval_step(cfg: TrainConfig, model, num_lands_for_loss: int | None = None):
    """Returns jitted eval_step(state, proj, seg, heats) -> per-sample losses."""
    return jax.jit(make_eval_losses_fn(cfg, model, num_lands_for_loss))
