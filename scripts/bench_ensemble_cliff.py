"""Root-cause the 6-net ensemble throughput cliff past batch 32 (VERDICT r2
item 3).

Round-2 measurement (BASELINE.md): 214 f/s peak @ b32 collapsing to 110 @
b128 and 81 @ b256, attributed (untested) to HBM pressure from the stacked
(K, B, H, W, L) per-net outputs of the unrolled ensemble program
(infer/ensemble.py::map_over_nets). This script measures, back-to-back in
ONE session (tunnel throughput varies 2-3x between sessions — only
same-session comparisons are valid):

  stack : the current implementation — K per-net (seg, heats) outputs
          stacked then averaged
  accum : running per-net accumulation (seg_sum += ...; no (K, B, ...)
          intermediates) — previously measured dead at b32/b64 but never
          evaluated at b128-b256 where the decline lives
  chunk : lax.map over batch slices of the stacked program (bounds live
          intermediates to (K, chunk, ...))

Protocol per CLAUDE.md: drain the warmup with a scalar readback, >=3 timed
trials, report the min; no concurrent CPU load.

Usage: python scripts/bench_ensemble_cliff.py [--out /tmp/cliff.json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


K = 6
ORIG = (180, 180)
PAD = 192
NUM_LANDS = 14
NUM_CLASSES = 7
BATCHES = (32, 128, 256)
CHUNK = 32
TRIALS = 4


def build_stacked_vars(cfg, key):
    from deepfluoro_tpu.train.step import make_train_state
    from deepfluoro_tpu.infer.ensemble import stack_variables

    vs = []
    model = None
    for i in range(K):
        model, st = make_train_state(cfg, jax.random.fold_in(key, i), (PAD, PAD))
        v = {"params": st.params}
        if st.batch_stats:
            v["batch_stats"] = st.batch_stats
        vs.append(v)
    return model, stack_variables(vs)


def make_variants(model):
    from deepfluoro_tpu.infer.ensemble import _ensemble_forward, make_one_net_fn

    @jax.jit
    def fwd_stack(stacked_vars, proj):
        return _ensemble_forward(model, stacked_vars, proj, ORIG, NUM_LANDS)

    # the PRODUCTION per-net forward — importing it keeps the accum variant
    # like-for-like with the stacked program it is benchmarked against
    one_net = make_one_net_fn(model, ORIG, NUM_LANDS)

    @jax.jit
    def fwd_accum(stacked_vars, proj):
        seg_sum = None
        heat_sum = None
        for i in range(K):
            v = jax.tree.map(lambda x: x[i], stacked_vars)
            seg, heats = one_net(v, proj)
            seg_sum = seg if seg_sum is None else seg_sum + seg
            heat_sum = heats if heat_sum is None else heat_sum + heats
        avg_seg = seg_sum / K
        avg_heats = heat_sum / K
        labels = jnp.argmax(avg_seg, axis=-1).astype(jnp.uint8)
        return avg_seg, avg_heats, labels

    @jax.jit
    def fwd_chunk(stacked_vars, proj):
        b = proj.shape[0]
        chunks = proj.reshape(b // CHUNK, CHUNK, *proj.shape[1:])
        seg, heats, labels = jax.lax.map(
            lambda p: _ensemble_forward(model, stacked_vars, p, ORIG, NUM_LANDS),
            chunks,
        )
        return (
            seg.reshape(b, *seg.shape[2:]),
            heats.reshape(b, *heats.shape[2:]),
            labels.reshape(b, *labels.shape[2:]),
        )

    return {"stack": fwd_stack, "accum": fwd_accum, "chunk": fwd_chunk}


def drain(out):
    # scalar readback: forces execution to finish through the tunnel
    # (block_until_ready returns early there)
    return float(np.asarray(out[2][0, 0, 0]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/cliff.json")
    args = ap.parse_args()

    from deepfluoro_tpu.train.config import TrainConfig
    from deepfluoro_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    cfg = TrainConfig(
        num_classes=NUM_CLASSES, batch_size=1, proj_unet_dim=PAD,
        depth=6, init_feats_exp=5, batch_norm=True, padding=True,
        no_max_pool=True, num_lands=NUM_LANDS,
    )
    model, stacked = build_stacked_vars(cfg, jax.random.PRNGKey(0))
    variants = make_variants(model)

    rng = np.random.default_rng(0)
    results = {}
    for name, fwd in variants.items():
        for b in BATCHES:
            if name == "chunk" and b == 32:
                continue  # identical to stack at one chunk
            proj = jnp.asarray(
                rng.standard_normal((b, PAD, PAD, 1)).astype(np.float32)
            )
            t0 = time.time()
            drain(fwd(stacked, proj))  # compile + warm, fully drained
            print(
                "{} b{}: warm+compile {:.1f}s".format(name, b, time.time() - t0),
                flush=True,
            )
            times = []
            for _ in range(TRIALS):
                t0 = time.time()
                drain(fwd(stacked, proj))
                times.append(time.time() - t0)
            best = min(times)
            results["{}_b{}".format(name, b)] = {
                "ms_per_batch": best * 1e3,
                "frames_per_s": b / best,
                "all_trials_ms": [t * 1e3 for t in times],
            }
            print(
                "{} b{}: {:.1f} ms/batch = {:.1f} f/s (trials {})".format(
                    name, b, best * 1e3, b / best,
                    [round(t * 1e3, 1) for t in times],
                ),
                flush=True,
            )

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
