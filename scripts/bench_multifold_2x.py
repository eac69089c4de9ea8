"""Largest fused fold-count that fits at the 2x geometry (VERDICT r4 #8).

The fused K-fold multifold step has only ever run at paper geometry
(192^2); at 736^2 a SINGLE fold already fails to compile at batch 12
without remat (BASELINE.md --remat row). This probe measures, on one chip,
which fold counts K the streaming multifold step (lax.map fold combinator,
per-fold states resident) compiles and runs at 736^2 batch 5 with
remat+bf16 — and the per-step time for the ones that fit. The outcome
(a number, or "K>=2 OOMs -> fold-sharding across chips is the only 2x
multifold path") lands in BASELINE.md / docs/scaling.md.

Usage: python scripts/bench_multifold_2x.py [--folds 1,2,3] [--batch 5]
       [--dim 736 --orig 718] [--no-gpu]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

N_CLASSES, N_LANDS = 7, 14
TRIALS, ITERS = 3, 3


def try_folds(k: int, batch: int, pad: int, orig: int) -> float | None:
    import jax
    import jax.numpy as jnp

    from deepfluoro_tpu.data.augment import AugmentConfig
    from deepfluoro_tpu.train import TrainConfig
    from deepfluoro_tpu.train.multifold import (
        make_multifold_state, make_streaming_multifold_step,
    )
    from deepfluoro_tpu.train.step import make_optimizer

    cfg = TrainConfig(
        num_classes=N_CLASSES, batch_size=batch, proj_unet_dim=pad, depth=6,
        init_feats_exp=5, batch_norm=True, padding=True, no_max_pool=True,
        num_lands=N_LANDS, optim_type="sgd", init_lr=0.1, momentum=0.9,
        nesterov=True, wgt_decay=1e-4, compute_dtype="bfloat16",
        data_aug=True, remat=True,
    )
    model, stacked = make_multifold_state(
        cfg, k, jax.random.PRNGKey(0), (orig, orig)
    )
    tx = make_optimizer(cfg)
    aug_cfg = AugmentConfig(
        num_classes=N_CLASSES, proj_pad_dim=pad, include_heat_map=True,
    )
    step = make_streaming_multifold_step(cfg, model, tx, aug_cfg)

    rng = np.random.default_rng(0)
    projs = jnp.asarray(rng.random((k, batch, orig, orig), np.float32))
    segs = jnp.asarray(
        rng.integers(0, N_CLASSES, (k, batch, orig, orig)).astype(np.uint8)
    )
    lands = jnp.asarray(
        rng.random((k, batch, 2, N_LANDS), np.float32) * (orig - 1)
    )
    seeds = jnp.arange(k, dtype=jnp.uint32)
    lrs = jnp.full((k,), 0.1, jnp.float32)

    try:
        stacked, losses = step(stacked, projs, segs, lands, seeds, lrs)
        _ = np.asarray(losses[0])  # drain: compile + first exec
    except Exception as e:  # noqa: BLE001 - OOM/compile failure is the signal
        print("  K={}: FAILED ({}: {})".format(
            k, type(e).__name__, str(e)[:300].replace("\n", " ")), flush=True)
        return None

    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        for i in range(ITERS):
            stacked, losses = step(
                stacked, projs, segs, lands, seeds + i + 1, lrs
            )
        _ = np.asarray(losses[0])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print("  K={}: {:.1f} ms/step ({:.2f} img/s across folds)".format(
        k, best * 1e3, k * batch / best), flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--folds", default="1,2,3")
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--dim", type=int, default=736)
    ap.add_argument("--orig", type=int, default=718)
    ap.add_argument("--no-gpu", action="store_true")
    args = ap.parse_args()

    from deepfluoro_tpu.utils.platform import (
        enable_compilation_cache, select_platform,
    )

    select_platform(no_gpu=args.no_gpu)
    enable_compilation_cache()
    import jax

    print("devices:", jax.devices(), flush=True)
    print("streaming multifold step @ {}^2 (pad {}), batch {}, remat+bf16".format(
        args.orig, args.dim, args.batch), flush=True)
    for k in (int(x) for x in args.folds.split(",")):
        try_folds(k, args.batch, args.dim, args.orig)


if __name__ == "__main__":
    main()
