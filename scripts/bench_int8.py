"""Measure int8 post-training-quantized inference vs bf16 on the TPU.

Same program shape and protocol as bench.py (flagship depth-6 wf-5 joint
seg+lands U-Net, 180^2 frames padded to 192, reflect-pad + z-norm prologue,
argmax epilogue, drained warmup, >=3 timed trials, scalar readback), so the
numbers are directly comparable to the BASELINE.md batch-512 row.

Also reports an agreement proxy: the fraction of argmax seg labels that
match between the float and int8 paths on the same random batch (calibrated
on a disjoint batch). Run on an idle host; see CLAUDE.md timing rules.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

IMG = 180
PAD = 192
N_CLASSES = 7
N_LANDS = 14


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--cpu", action="store_true", help="smoke mode on CPU")
    ap.add_argument("--float-levels", default="",
                    help="comma list: also time hybrid programs keeping the "
                         "finest N levels float (e.g. 1,2)")
    args = ap.parse_args()

    from deepfluoro_tpu.utils.platform import enable_compilation_cache, select_platform

    if args.cpu:
        select_platform("cpu")
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from deepfluoro_tpu.data.augment import AugmentConfig, prepare_batch
    from deepfluoro_tpu.infer.quantized import (
        calibrate,
        quantize_weights,
        quantized_apply,
    )
    from deepfluoro_tpu.train import TrainConfig, build_model

    cfg = TrainConfig(
        num_classes=N_CLASSES, depth=6, init_feats_exp=5, batch_norm=True,
        padding=True, no_max_pool=True, num_lands=N_LANDS, proj_unet_dim=PAD,
        compute_dtype="bfloat16",
    )
    model = build_model(cfg)
    rng = np.random.default_rng(0)

    dummy = jnp.zeros((1, PAD, PAD, 1), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), dummy
    )

    aug = AugmentConfig(
        num_classes=N_CLASSES, proj_pad_dim=PAD, prob_of_aug=0.0,
        include_heat_map=False,
    )
    key = jax.random.PRNGKey(0)

    @jax.jit
    def infer_float(variables, projs):
        prepared = prepare_batch(aug, key, projs)
        seg, _heats = model.apply(variables, prepared["proj"], train=False)
        return jnp.argmax(seg, axis=-1).astype(jnp.uint8)

    # calibrate on a batch disjoint from the timed one
    calib = jnp.asarray(rng.random((min(args.batch, 64), IMG, IMG), np.float32))

    @jax.jit
    def _prep(projs):
        return prepare_batch(aug, key, projs)["proj"]

    scales = calibrate(model, variables, [_prep(calib)])
    qweights = quantize_weights(model, variables)

    @jax.jit
    def infer_int8(qweights, variables, scales, projs):
        prepared = prepare_batch(aug, key, projs)
        seg, _heats = quantized_apply(model, qweights, variables, scales, prepared["proj"])
        return jnp.argmax(seg, axis=-1).astype(jnp.uint8)

    projs = jnp.asarray(rng.random((args.batch, IMG, IMG), np.float32))

    # agreement proxy (full D2H, outside any timed region)
    lab_f = np.asarray(infer_float(variables, projs))
    lab_q = np.asarray(infer_int8(qweights, variables, scales, projs))
    agree = float((lab_f == lab_q).mean())

    def drain(labels):
        return np.asarray(labels[0, 0, 0])

    def measure(fn, *fargs):
        _ = drain(fn(*fargs))  # warm + drain
        best = 0.0
        for _t in range(args.trials):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*fargs)
            drain(out)
            dt = time.perf_counter() - t0
            best = max(best, args.batch * args.iters / dt)
        return best

    fps_f = measure(infer_float, variables, projs)
    fps_q = measure(infer_int8, qweights, variables, scales, projs)
    print(
        f"batch={args.batch} float_bf16={fps_f:.1f} f/s  int8={fps_q:.1f} f/s  "
        f"speedup={fps_q / fps_f:.2f}x  argmax_agreement={agree:.4f}",
        flush=True,
    )

    # hybrid variants, back-to-back in the same session
    from deepfluoro_tpu.infer.quantized import make_level_filter

    for fl in (int(x) for x in args.float_levels.split(",") if x):
        pts = make_level_filter(fl, cfg.depth)

        @jax.jit
        def infer_hybrid(qweights, variables, scales, projs, _pts=pts):
            prepared = prepare_batch(aug, key, projs)
            seg, _heats = quantized_apply(
                model, qweights, variables, scales, prepared["proj"],
                int8_points=_pts,
            )
            return jnp.argmax(seg, axis=-1).astype(jnp.uint8)

        fps_h = measure(infer_hybrid, qweights, variables, scales, projs)
        print(
            f"  int8-fl{fl}={fps_h:.1f} f/s  vs-float={fps_h / fps_f:.2f}x  "
            f"vs-int8={fps_h / fps_q:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
