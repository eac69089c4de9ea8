"""MFU decomposition of the fused TRAIN step (VERDICT r4 #7 — inference
got one in round 3; this is the training-side analogue).

Times, back-to-back in one session (chained-state, scalar-readback drain,
min-of-N protocol — BASELINE.md round-2+ rules):

  fused   : the exact fit() program — device-resident gather + PRNG fold-in
            + full augmentation + fwd/bwd + SGD, one dispatch
  step    : fwd/bwd + SGD on pre-prepared (padded, z-normed) batches
  grads   : value_and_grad only (fwd + bwd, no optimizer)
  fwdloss : loss forward only
  sgd     : optax update + apply_updates on fixed grads (no fwd/bwd)
  aug     : prepare_batch alone (gather + augmentation pipeline)

and reports XLA cost-analysis FLOPs per program so MFU = flops / (time *
peak) is exact. bwd cost ~= grads - fwdloss; SGD and aug land as the resid
between step/fused and grads.

Usage: python scripts/bench_train_mfu.py [--batches 5,128] [--iters 10]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

IMG, PAD = 180, 192
N_CLASSES, N_LANDS = 7, 14
V5E_PEAK_BF16 = 197e12  # TPU v5e peak bf16 FLOPs/s (public spec)
TRIALS = 3


def bench_batch(batch: int, iters: int):
    import jax
    import jax.numpy as jnp

    from deepfluoro_tpu.data.augment import AugmentConfig, prepare_batch
    from deepfluoro_tpu.train import TrainConfig, make_train_state
    from deepfluoro_tpu.train.step import (
        make_fused_train_step, make_loss_fn, make_optimizer, make_train_step,
    )

    cfg = TrainConfig(
        num_classes=N_CLASSES, batch_size=batch, proj_unet_dim=PAD, depth=6,
        init_feats_exp=5, batch_norm=True, padding=True, no_max_pool=True,
        num_lands=N_LANDS, optim_type="sgd", init_lr=0.1, momentum=0.9,
        nesterov=True, wgt_decay=1e-4, compute_dtype="bfloat16", data_aug=True,
    )
    model, state = make_train_state(cfg, jax.random.PRNGKey(0), (IMG, IMG))
    tx = make_optimizer(cfg)
    aug_cfg = AugmentConfig(
        num_classes=N_CLASSES, proj_pad_dim=PAD, include_heat_map=True,
    )
    loss_fn = make_loss_fn(cfg, model)

    # device-resident "dataset" twice the batch so the gather is honest
    rng = np.random.default_rng(0)
    n_all = max(2 * batch, 16)
    projs_all = jnp.asarray(rng.random((n_all, IMG, IMG), np.float32))
    segs_all = jnp.asarray(
        rng.integers(0, N_CLASSES, (n_all, IMG, IMG)).astype(np.uint8)
    )
    lands_all = jnp.asarray(
        rng.random((n_all, 2, N_LANDS), np.float32) * (IMG - 1)
    )
    idx = jnp.arange(batch, dtype=jnp.int32)

    fused = make_fused_train_step(cfg, model, tx, aug_cfg)
    step = make_train_step(cfg, model, tx)

    key = jax.random.PRNGKey(7)
    prepared = jax.jit(
        lambda k, p, s, l: prepare_batch(aug_cfg, k, p, s, l)
    )(key, projs_all[:batch], segs_all[:batch], lands_all[:batch])
    proj_p, seg_p, heats_p = prepared["proj"], prepared["seg"], prepared["heats"]

    @jax.jit
    def grads_fn(params, batch_stats, proj, seg, heats):
        return jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, proj, seg, heats
        )

    @jax.jit
    def fwdloss_fn(params, batch_stats, proj, seg, heats):
        return loss_fn(params, batch_stats, proj, seg, heats)[0]

    (_, _), grads_const = grads_fn(state.params, state.batch_stats, proj_p, seg_p, heats_p)
    grads_const = jax.tree.map(jnp.asarray, grads_const)

    @jax.jit
    def sgd_fn(params, opt_state, grads):
        import optax

        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    @jax.jit
    def aug_fn(k, p, s, l, i):
        return prepare_batch(
            aug_cfg, k,
            jnp.take(p, i, axis=0), jnp.take(s, i, axis=0),
            jnp.take(l, i, axis=0),
        )["proj"]

    def drain(out):
        return np.asarray(jax.tree.leaves(out)[0].ravel()[0])

    def cost_flops(f, *args):
        try:
            c = f.lower(*args).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            return float(c.get("flops", float("nan")))
        except Exception as e:  # noqa: BLE001
            print("cost_analysis failed:", e, flush=True)
            return float("nan")

    results = {}

    # ---- chained-state programs (donated state) -------------------------
    for name, launch in (
        ("fused", lambda s, i: fused(s, projs_all, segs_all, lands_all, idx,
                                     jnp.uint32(i), 0.1)),
        ("step", lambda s, i: step(s, proj_p, seg_p, heats_p, 0.1)),
    ):
        flops = None
        s = state
        s, loss = launch(s, 0)
        drain(loss)  # compile + drain
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            for i in range(iters):
                s, loss = launch(s, i)
            drain(loss)
            best = min(best, (time.perf_counter() - t0) / iters)
        # re-make state (donated buffers were consumed)
        _, state2 = make_train_state(cfg, jax.random.PRNGKey(0), (IMG, IMG))
        state = state2
        results[name] = (best, flops)

    # cost analysis for the chained programs (fresh lowering, no donation
    # interaction with the timed loop)
    results["fused"] = (
        results["fused"][0],
        cost_flops(fused, state, projs_all, segs_all, lands_all, idx,
                   jnp.uint32(0), 0.1),
    )
    results["step"] = (
        results["step"][0],
        cost_flops(step, state, proj_p, seg_p, heats_p, 0.1),
    )

    # ---- stateless programs ---------------------------------------------
    for name, f, args in (
        ("grads", grads_fn, (state.params, state.batch_stats, proj_p, seg_p, heats_p)),
        ("fwdloss", fwdloss_fn, (state.params, state.batch_stats, proj_p, seg_p, heats_p)),
        ("sgd", sgd_fn, (state.params, state.opt_state, grads_const)),
        ("aug", aug_fn, (key, projs_all, segs_all, lands_all, idx)),
    ):
        flops = cost_flops(f, *args)
        drain(f(*args))
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(*args)
            drain(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        results[name] = (best, flops)

    print("batch {} (paper config {}^2 pad {}, bf16):".format(batch, IMG, PAD))
    for name in ("fused", "step", "grads", "fwdloss", "sgd", "aug"):
        t, fl = results[name]
        mfu = fl / (t * V5E_PEAK_BF16) if fl == fl else float("nan")
        print("  {:<8} {:8.2f} ms  {:8.1f} img/s  {:9.2f} GFLOP  MFU {:5.1%}".format(
            name, t * 1e3, batch / t, (fl or float("nan")) / 1e9, mfu
        ), flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="5,128")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--no-gpu", action="store_true",
                    help="CPU smoke mode (JAX_PLATFORMS env is ignored in "
                         "this sandbox — select_platform pins the backend)")
    args = ap.parse_args()

    from deepfluoro_tpu.utils.platform import (
        enable_compilation_cache, select_platform,
    )

    select_platform(no_gpu=args.no_gpu)
    enable_compilation_cache()
    import jax

    print("devices:", jax.devices(), flush=True)
    for b in (int(x) for x in args.batches.split(",")):
        bench_batch(b, args.iters)


if __name__ == "__main__":
    main()
