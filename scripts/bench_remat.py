"""Measure --remat on the fused train step: time cost at the paper batch
and the batch/memory headroom it buys at the 2x geometry.

Remat (models/unet.py::UNet.remat) recomputes in-block activations during
backprop — the expectation is a modest step-time increase (~1 extra forward
of the block FLOPs) in exchange for O(depth) less live activation HBM,
raising the largest batch that fits at large resolutions (2x: 718^2 frames
padded to 736^2; BASELINE.md single-chip row: 377.5 ms/step at batch 5
without remat).

Protocol per CLAUDE.md: drain the warmup with a scalar readback, >=3 timed
trials, report the min, idle host, one back-to-back session.

Usage: python scripts/bench_remat.py [--dim 736] [--batches 5,8,12,16]
       [--out /tmp/remat.json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

NUM_LANDS = 14
NUM_CLASSES = 7
TRIALS = 4


def build(cfg, dim):
    from deepfluoro_tpu.data.augment import AugmentConfig
    from deepfluoro_tpu.train.step import (
        make_optimizer,
        make_streaming_train_step,
        make_train_state,
    )

    model, state = make_train_state(cfg, jax.random.PRNGKey(0), (dim, dim))
    tx = make_optimizer(cfg)
    aug = AugmentConfig(
        num_classes=NUM_CLASSES, proj_pad_dim=dim, prob_of_aug=0.5
    )
    # streaming step: takes explicit batches, so the measurement isolates
    # the aug+fwd+bwd+update program (no resident-dataset gather)
    step = make_streaming_train_step(cfg, model, tx, aug)
    return state, step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=736)
    ap.add_argument("--orig", type=int, default=718)
    ap.add_argument("--batches", default="5,8,12,16")
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--wf", type=int, default=5)
    ap.add_argument("--out", default="/tmp/remat.json")
    ap.add_argument("--no-gpu", action="store_true",
                    help="force the CPU backend (smoke runs)")
    args = ap.parse_args()

    from deepfluoro_tpu.train.config import TrainConfig
    from deepfluoro_tpu.utils.platform import enable_compilation_cache, select_platform

    select_platform(no_gpu=args.no_gpu)
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    batches = [int(b) for b in args.batches.split(",")]
    rng = np.random.default_rng(0)
    results = {}

    for remat in (False, True):
        cfg = TrainConfig(
            num_classes=NUM_CLASSES, batch_size=1, proj_unet_dim=args.dim,
            depth=args.depth, init_feats_exp=args.wf, batch_norm=True, padding=True,
            no_max_pool=True, num_lands=NUM_LANDS, compute_dtype="bfloat16",
            optim_type="sgd", init_lr=0.1, momentum=0.9, nesterov=True,
            wgt_decay=1e-4, remat=remat,
        )
        state, step = build(cfg, args.dim)
        st = state
        for b in batches:
            key = "remat_{}_b{}".format(int(remat), b)
            # raw-resolution inputs: the step's aug pads orig -> dim
            proj = jnp.asarray(
                rng.standard_normal((b, args.orig, args.orig)).astype(np.float32)
            )
            seg = jnp.asarray(
                rng.integers(0, NUM_CLASSES, (b, args.orig, args.orig)).astype(np.uint8)
            )
            lands = jnp.asarray(
                rng.random((b, 2, NUM_LANDS)).astype(np.float32) * args.orig
            )
            try:
                # the step donates its state arg — chain it through every
                # call (warmup included) so no donated buffer is reused
                t0 = time.time()
                st, loss = step(st, proj, seg, lands, jnp.int32(0), 0.1)
                _ = float(np.asarray(loss))  # drain compile + first run
                print("{}: warm+compile {:.1f}s".format(key, time.time() - t0), flush=True)
                times = []
                for _ in range(TRIALS):
                    t0 = time.time()
                    st, loss = step(st, proj, seg, lands, jnp.int32(1), 0.1)
                    _ = float(np.asarray(loss))
                    times.append(time.time() - t0)
                best = min(times)
                results[key] = {
                    "ms_per_step": best * 1e3,
                    "img_per_s": b / best,
                    "all_trials_ms": [t * 1e3 for t in times],
                }
                print(
                    "{}: {:.1f} ms/step = {:.1f} img/s (trials {})".format(
                        key, best * 1e3, b / best,
                        [round(t * 1e3, 1) for t in times],
                    ),
                    flush=True,
                )
            except Exception as e:  # OOM shows up as RESOURCE_EXHAUSTED
                results[key] = {"error": repr(e)[:200]}
                print("{}: FAILED {}".format(key, repr(e)[:200]), flush=True)
                # the failed call may have consumed the donated state
                state, step = build(cfg, args.dim)
                st = state

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
