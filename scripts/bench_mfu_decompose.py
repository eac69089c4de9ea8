"""Decompose the bench.py b512 inference program to locate non-MXU time
(VERDICT r2 item 6: the chip saturates at ~54% of peak bf16 FLOPs).

Times, back-to-back in one session (drained-warmup min-of-N protocol):
  full      : the exact bench.py program (reflect-pad + z-norm + forward +
              argmax) on (B,180,180) raw frames
  fwd_arg   : forward + argmax on pre-padded (B,192,192,1) input
  fwd       : forward only
  fwd_noland: forward with the landmark head dropped (seg only)
  prep      : prepare_batch only (pad + z-norm)
and reports XLA cost-analysis FLOPs for each, so MFU = flops / (time *
peak) is exact rather than hand-counted.

Usage: python scripts/bench_mfu_decompose.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


IMG, PAD, BATCH = 180, 192, 512
N_CLASSES, N_LANDS = 7, 14
V5E_PEAK_BF16 = 197e12  # TPU v5e peak bf16 FLOPs/s (public spec)
TRIALS, ITERS = 3, 10


def main():
    from deepfluoro_tpu.data.augment import AugmentConfig, prepare_batch
    from deepfluoro_tpu.train import TrainConfig, build_model
    from deepfluoro_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    def make_cfg(num_lands):
        return TrainConfig(
            num_classes=N_CLASSES, depth=6, init_feats_exp=5, batch_norm=True,
            padding=True, no_max_pool=True, num_lands=num_lands,
            proj_unet_dim=PAD, compute_dtype="bfloat16",
        )

    cfg = make_cfg(N_LANDS)
    model = build_model(cfg)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, PAD, PAD, 1), jnp.float32)
    )
    cfg_nl = make_cfg(0)
    model_nl = build_model(cfg_nl)
    variables_nl = jax.jit(lambda k, x: model_nl.init(k, x, train=False))(
        jax.random.PRNGKey(1), jnp.zeros((1, PAD, PAD, 1), jnp.float32)
    )

    aug = AugmentConfig(
        num_classes=N_CLASSES, proj_pad_dim=PAD, prob_of_aug=0.0,
        include_heat_map=False,
    )
    key = jax.random.PRNGKey(0)

    @jax.jit
    def full(variables, projs):
        prepared = prepare_batch(aug, key, projs)
        seg, heats = model.apply(variables, prepared["proj"], train=False)
        return jnp.argmax(seg, axis=-1).astype(jnp.uint8)

    @jax.jit
    def fwd_arg(variables, padded):
        seg, heats = model.apply(variables, padded, train=False)
        return jnp.argmax(seg, axis=-1).astype(jnp.uint8)

    @jax.jit
    def fwd(variables, padded):
        seg, heats = model.apply(variables, padded, train=False)
        return seg

    @jax.jit
    def fwd_noland(variables, padded):
        return model_nl.apply(variables, padded, train=False)

    @jax.jit
    def prep(projs):
        return prepare_batch(aug, key, projs)["proj"]

    rng = np.random.default_rng(0)
    projs = jnp.asarray(rng.random((BATCH, IMG, IMG), np.float32))
    padded = jnp.asarray(rng.random((BATCH, PAD, PAD, 1), np.float32))

    def cost_flops(f, *args):
        try:
            c = f.lower(*args).compile().cost_analysis()
            if isinstance(c, list):
                c = c[0]
            return float(c.get("flops", float("nan")))
        except Exception as e:  # noqa: BLE001 - cost analysis is best-effort
            print("cost_analysis failed:", e, flush=True)
            return float("nan")

    runs = [
        ("full", full, (variables, projs)),
        ("fwd_arg", fwd_arg, (variables, padded)),
        ("fwd", fwd, (variables, padded)),
        ("fwd_noland", fwd_noland, (variables_nl, padded)),
        ("prep", prep, (projs,)),
    ]

    def drain(out):
        leaf = jax.tree.leaves(out)[0]
        return np.asarray(leaf.ravel()[0])

    for name, f, args in runs:
        flops = cost_flops(f, *args)
        t0 = time.time()
        drain(f(*args))
        print("{}: warm {:.1f}s".format(name, time.time() - t0), flush=True)
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = f(*args)
            drain(out)
            best = min(best, (time.perf_counter() - t0) / ITERS)
        mfu = flops / (best * V5E_PEAK_BF16)
        print(
            "{:<10} {:8.2f} ms/batch  {:8.1f} f/s  {:10.3f} GFLOP/batch  MFU {:.1%}".format(
                name, best * 1e3, BATCH / best, flops / 1e9, mfu
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
