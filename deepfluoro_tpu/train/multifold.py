"""Simultaneous leave-one-specimen-out fold training.

The reference's 6-fold ensemble is produced by six sequential training runs
(train_test_code/Readme.md: one train.py invocation per held-out specimen).
On TPU the natural formulation is to *vmap the whole training step over a
fold axis*: K independent parameter sets update in one compiled program, the
convolutions batch across folds to keep the MXU saturated, and the fold axis
can additionally be sharded across devices ('ensemble' mesh axis).

Each fold sees its own data stream (its training specimens differ), so the
host assembles a (K, B, ...) stacked batch per step from K independent
iterators; augmentation PRNG keys are split per fold.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from deepfluoro_tpu.data.augment import AugmentConfig, prepare_batch
from deepfluoro_tpu.data.hdf5 import FluoroData
from deepfluoro_tpu.data.pipeline import BatchIterator
from deepfluoro_tpu.train.config import TrainConfig, build_model
from deepfluoro_tpu.train.step import (
    TrainState,
    grad_and_update,
    make_loss_fn,
    make_optimizer,
    make_train_state,
)


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


def make_multifold_train_step(cfg: TrainConfig, model, tx):
    """Returns jitted step(stacked_state, proj (K,B,H,W,1), seg, heats, lr)
    -> (stacked_state, losses (K,))."""
    loss_fn = make_loss_fn(cfg, model)

    def one_fold_step(state: TrainState, proj, seg, heats, lr):
        return grad_and_update(loss_fn, tx, state, proj, seg, heats, lr)

    from functools import partial

    @partial(jax.jit, donate_argnums=(0,))
    def step(stacked_state, proj, seg, heats, lr):
        return jax.vmap(one_fold_step, in_axes=(0, 0, 0, 0, None))(
            stacked_state, proj, seg, heats, lr
        )

    return step


def fold_state(stacked_state, k: int):
    """Extract fold k's variables from the stacked state (for checkpointing
    each fold as a standard self-describing checkpoint)."""
    return jax.tree.map(lambda x: x[k], stacked_state)


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


def train_multifold(
    data_per_fold: list[FluoroData],
    cfg: TrainConfig,
    num_epochs: int,
    lr: float | None = None,
    seed: int = 0,
    verbose: bool = True,
):
    """Train K folds simultaneously; returns (model, stacked_state, losses).

    data_per_fold[k] is fold k's *training* data (its held-out specimen
    excluded by the caller). Epoch length follows the smallest fold.
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
    step = make_multifold_train_step(cfg, model, tx)

    aug = AugmentConfig(
        num_classes=cfg.num_classes,
        proj_pad_dim=cfg.proj_unet_dim,
        prob_of_aug=0.5 if cfg.data_aug else 0.0,
    )

    iters = [
        BatchIterator(d, batch_size=cfg.batch_size, shuffle=True, seed=seed + k)
        for k, d in enumerate(data_per_fold)
    ]
    steps_per_epoch = min(len(d) // cfg.batch_size for d in data_per_fold)
    assert steps_per_epoch > 0, "batch size exceeds the smallest fold"

    key = jax.random.PRNGKey(seed + 1000)
    lr_val = cfg.init_lr if lr is None else lr
    losses_hist = []
    for epoch in range(num_epochs):
        gens = [it.epoch() for it in iters]
        for _ in range(steps_per_epoch):
            projs, segs, heats = [], [], []
            for g in gens:
                p, s, l = next(g)
                key, bk = jax.random.split(key)
                b = prepare_batch(aug, bk, p, s, l)
                projs.append(b["proj"])
                segs.append(b["seg"])
                heats.append(b.get("heats"))
            proj = jnp.stack(projs)
            seg = jnp.stack(segs)
            heat = jnp.stack(heats) if heats[0] is not None else None
            stacked, losses = step(stacked, proj, seg, heat, lr_val)
        losses_hist.append(np.asarray(losses))
        if verbose:
            print(
                "multifold epoch {:03d}: losses {}".format(
                    epoch, np.round(losses_hist[-1], 4)
                )
            )
    return model, stacked, losses_hist
