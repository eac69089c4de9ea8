"""Fused full-res inference across the downsample ladder (8x/4x/2x/1x).

One compiled program per rung (data/preprocess.py::make_fused_fullres_infer):
raw 1536^2 frames -> 50 px border crop -> Beer-Lambert log -> rot180 ->
downsample -> reflect-pad + z-norm -> U-Net -> argmax (+ heats). This is
BASELINE.json configs 4-5 ("4x ... device-side fused preprocessing feeding
batched inference", "2x/full-res fluoroscopy inference, end-to-end") on the
flagship paper architecture; the reference preprocesses offline into
per-level archives and infers from those (hdf5_layouts/Readme.md:42-45,
README.md:62-68), so the fused numbers here fold the whole preprocess into
the per-frame cost.

Protocol: drained warmup (np.asarray full fetch), >=3 timed trials with a
scalar-readback drain, report the max rate (BASELINE.md round-2+ protocol).
Run on an idle host; numbers are only comparable back-to-back in one
session.

Usage: python scripts/bench_fullres_ladder.py [--rungs 16,8,4,2,1]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

# Real archive geometry: 1536^2 raw frames, 50 px border crop -> 1436
# (hdf5_layouts/Readme.md:42-45); per-rung U-Net pad dims are the training
# dims used across BASELINE.md (192 = paper 8x config, 368/736/1440 follow
# the same ceil-to-32-multiple rule for the deeper frames).
FULL = 1536
PAD_DIM = {16: 96, 8: 192, 4: 368, 2: 736, 1: 1440}
# Per-rung batch: sized under the 16 GB HBM envelope (1x at batch 4 is the
# inference analogue of the training OOM documented in e2e_fullres.sh).
BATCH = {16: 128, 8: 64, 4: 16, 2: 8, 1: 2}
ITERS = {16: 10, 8: 10, 4: 10, 2: 5, 1: 4}
N_CLASSES = 7
N_LANDS = 14


def bench_rung(ds: int, int8: bool = False, float_levels=(), batch=None) -> dict:
    import jax
    import jax.numpy as jnp

    from deepfluoro_tpu.data.preprocess import (
        make_fused_fullres_infer, make_quantized_fullres_infer,
    )
    from deepfluoro_tpu.train import TrainConfig, build_model

    pad = PAD_DIM[ds]
    cfg = TrainConfig(
        num_classes=N_CLASSES, depth=6, init_feats_exp=5, batch_norm=True,
        padding=True, no_max_pool=True, num_lands=N_LANDS, proj_unet_dim=pad,
        compute_dtype="bfloat16",
    )
    model = build_model(cfg)
    dummy = jnp.zeros((1, pad, pad, 1), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), dummy
    )

    b = batch or BATCH[ds]
    rng = np.random.default_rng(0)
    projs = jnp.asarray(rng.random((b, FULL, FULL), np.float32) * 4000.0 + 1.0)
    rots = jnp.ones((b,), bool)

    variants = {"float": make_fused_fullres_infer(model, variables, ds, pad, (FULL, FULL))}
    if int8:
        variants["int8"] = make_quantized_fullres_infer(
            model, variables, ds, pad, (FULL, FULL), projs[:2], rots[:2]
        )
    for fl in float_levels:
        # hybrid: finest fl levels float, deeper levels w8a8 (VERDICT r4
        # weak #3 — the structural response to the big-rung int8 loss)
        variants["int8-fl{}".format(fl)] = make_quantized_fullres_infer(
            model, variables, ds, pad, (FULL, FULL), projs[:2], rots[:2],
            float_levels=fl,
        )

    out = {}
    for name, infer in variants.items():  # back-to-back in one session
        fn = jax.jit(lambda p, r: infer(p, r)[0])
        _ = np.asarray(fn(projs, rots))  # compile + drain

        best = 0.0
        for _trial in range(3):
            it = ITERS[ds]
            t0 = time.perf_counter()
            for _ in range(it):
                labels = fn(projs, rots)
            _ = np.asarray(labels[0, 0, 0])  # scalar drain (serial TPU stream)
            dt = time.perf_counter() - t0
            best = max(best, b * it / dt)
        out[name] = best
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rungs", default="16,8,4,2,1")
    ap.add_argument("--int8", action="store_true",
                    help="also time the w8a8 program back-to-back per rung")
    ap.add_argument("--float-levels", default="",
                    help="comma list: also time hybrid w8a8 programs that "
                         "keep the finest N levels float (e.g. 1,2)")
    ap.add_argument("--batch", type=int, default=0,
                    help="override the per-rung batch size")
    args = ap.parse_args()

    from deepfluoro_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    fls = tuple(int(x) for x in args.float_levels.split(",") if x)
    for ds in (int(x) for x in args.rungs.split(",")):
        b = args.batch or BATCH[ds]
        rates = bench_rung(ds, int8=args.int8, float_levels=fls, batch=args.batch or None)
        line = "ds={}x (pad {}, batch {}): {:.1f} frames/s ({:.2f} ms/frame)".format(
            ds, PAD_DIM[ds], b, rates["float"], 1e3 / rates["float"]
        )
        for name in rates:
            if name == "float":
                continue
            line += " | {} {:.1f} frames/s ({:.2f} ms/frame, {:.2f}x)".format(
                name, rates[name], 1e3 / rates[name], rates[name] / rates["float"]
            )
        print(line, flush=True)


if __name__ == "__main__":
    main()
