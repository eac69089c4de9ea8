"""Space-to-depth probe for the early-level MXU lane-fill ceiling
(VERDICT r3 item 6; BASELINE.md MFU decomposition: the paper U-Net carries
EQUAL per-level FLOPs but levels 0/1 run 32/64 channels = 1/4, 1/2 MXU
lane fill, capping inference at 48.8% MFU).

The candidate counter is the standard TPU re-layout: a stride-1 3x3 conv on
(H, W, C) is EXACTLY a 3x3 conv on the space-to-depth layout (H/2, W/2, 4C)
with a structured kernel (built here by _s2d_kernel; zeros where the tap
parity cannot contribute). Lane fill rises 4x (32 -> 128 channels) but the
dense re-layouted kernel carries 4x the FLOPs (the structure is 1/4
sparse) — so the re-layout only wins if XLA's narrow-channel conv is WORSE
than 1/4-efficient. This script settles it empirically:

  1. exactness: s2d conv == original conv (f32, both backends)
  2. back-to-back timing of the level-0/1 conv shapes, original vs s2d,
     bf16 batch-512 inference geometry (the bench.py configuration)

Run on the TPU: python scripts/bench_s2d.py            (full timing)
CPU smoke:      python scripts/bench_s2d.py --no-gpu --smoke
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from deepfluoro_tpu.utils.platform import enable_compilation_cache, select_platform


def s2d(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel block order (p, q, c)."""
    b, h, w, c = x.shape
    return (
        x.reshape(b, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // 2, w // 2, 4 * c)
    )


def _s2d_kernel(w: np.ndarray) -> np.ndarray:
    """3x3 HWIO kernel (C_in -> C_out) -> the exact 3x3 kernel on the s2d
    layout (4C_in -> 4C_out). Output channel block (a, b, o) at s2d tap
    (dr, dc) reads input block (p, q, c) iff u = 2(dr-1)+p-a and
    v = 2(dc-1)+q-b land inside the original 3x3 window."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    out = np.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for dr in range(3):
        for dc in range(3):
            for a in range(2):
                for b in range(2):
                    for p in range(2):
                        for q in range(2):
                            u = 2 * (dr - 1) + p - a
                            v = 2 * (dc - 1) + q - b
                            if -1 <= u <= 1 and -1 <= v <= 1:
                                out[
                                    dr, dc,
                                    (2 * p + q) * cin : (2 * p + q + 1) * cin,
                                    (2 * a + b) * cout : (2 * a + b + 1) * cout,
                                ] = w[u + 1, v + 1]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-gpu", action="store_true")
    ap.add_argument("--smoke", action="store_true", help="tiny shapes, no timing")
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    select_platform(no_gpu=args.no_gpu)
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # ---- exactness ------------------------------------------------------
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((2, 16, 16, 5)).astype(np.float32)
    ws = rng.standard_normal((3, 3, 5, 7)).astype(np.float32)
    ref = np.asarray(conv(jnp.asarray(xs), jnp.asarray(ws)))
    got = np.asarray(conv(jnp.asarray(s2d(xs)), jnp.asarray(_s2d_kernel(ws))))
    np.testing.assert_allclose(got, s2d(ref), rtol=2e-4, atol=2e-4)
    print("exactness: s2d conv == conv (within f32 reassociation)")
    if args.smoke:
        print("SMOKE OK")
        return

    # ---- timing: the level-0/1 shapes of the bench.py inference program --
    # (paper geometry 192^2; level 0 runs 32 channels at 192^2, level 1 runs
    # 64 at 96^2). bf16 operands like the bench program.
    def time_conv(shape_in, cin, cout, s2d_mode, trials=5):
        b, h, w = shape_in
        if s2d_mode:
            x = jnp.asarray(
                rng.standard_normal((b, h // 2, w // 2, 4 * cin)), jnp.bfloat16
            )
            k = jnp.asarray(
                rng.standard_normal((3, 3, 4 * cin, 4 * cout)), jnp.bfloat16
            )
        else:
            x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.bfloat16)
            k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.bfloat16)
        f = jax.jit(lambda x, k: conv(x, k).sum())
        # drain the warmup with a scalar readback (tunnel protocol)
        _ = float(np.asarray(f(x, k)))
        ts = []
        for _i in range(trials):
            t0 = time.perf_counter()
            _ = float(np.asarray(f(x, k)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    b = args.batch
    rows = []
    for name, (h, cin, cout) in {
        "level0 conv 192^2 32->32": (192, 32, 32),
        "level1 conv  96^2 64->64": (96, 64, 64),
    }.items():
        t_orig = time_conv((b, h, h), cin, cout, s2d_mode=False)
        t_s2d = time_conv((b, h, h), cin, cout, s2d_mode=True)
        ratio = t_s2d / t_orig
        rows.append((name, t_orig, t_s2d, ratio))
        print(
            "{}: orig {:.3f} ms | s2d {:.3f} ms | s2d/orig = {:.2f}x "
            "({} WORTH PURSUING)".format(
                name, 1e3 * t_orig, 1e3 * t_s2d, ratio,
                "NOT" if ratio >= 1.0 else "MAYBE",
            )
        )
    print("S2D BENCH COMPLETE")


if __name__ == "__main__":
    main()
