"""Compiled-HLO profile of the int8 fused-inference program (VERDICT r4
weak #3: the big-rung int8 loss was attributed to per-conv quantize/
dequantize VPU+HBM passes without evidence — this script produces it).

For a ladder rung, compiles the float and int8 programs for the REAL TPU
backend and reports, from the optimized HLO and XLA's cost analysis:

- every convolution's operand/result dtypes (s8xs8->s32 vs bf16);
- whether the dequant -> bias/relu/BN -> next-quantize chains FUSE into
  single s32 -> s8 passes (fusion roots returning s8 with s32 params) or
  materialize float intermediates between convs;
- total bytes-accessed and FLOPs per program (the memory-vs-MXU balance
  that decides whether w8a8 can win at that geometry).

The point: if XLA already emits fused s32->s8 requantize passes, the
"fold dequant+quant into one requantize" rewrite is structurally a no-op,
and the loss at 2x/4x is the s32 accumulator traffic itself — which the
hybrid --float-levels mode addresses instead.

Usage: python scripts/profile_int8_hlo.py [--rung 2] [--batch 0] [--float-levels 0]
"""

from __future__ import annotations

import argparse
import re
from collections import Counter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rung", type=int, default=2)
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--float-levels", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="compile for CPU (smoke only — fusion decisions "
                         "differ from the TPU backend; JAX_PLATFORMS env is "
                         "ignored in this sandbox, CLAUDE.md)")
    args = ap.parse_args()

    from deepfluoro_tpu.utils.platform import (
        enable_compilation_cache, select_platform,
    )

    select_platform(no_gpu=args.cpu)
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import sys
    sys.path.insert(0, "scripts")
    from bench_fullres_ladder import BATCH, FULL, N_CLASSES, N_LANDS, PAD_DIM

    from deepfluoro_tpu.data.preprocess import (
        make_fused_fullres_infer, make_quantized_fullres_infer,
    )
    from deepfluoro_tpu.train import TrainConfig, build_model

    ds = args.rung
    pad = PAD_DIM[ds]
    b = args.batch or BATCH[ds]
    cfg = TrainConfig(
        num_classes=N_CLASSES, depth=6, init_feats_exp=5, batch_norm=True,
        padding=True, no_max_pool=True, num_lands=N_LANDS, proj_unet_dim=pad,
        compute_dtype="bfloat16",
    )
    model = build_model(cfg)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, pad, pad, 1), jnp.float32)
    )
    rng = np.random.default_rng(0)
    projs = jnp.asarray(rng.random((b, FULL, FULL), np.float32) * 4000.0 + 1.0)
    rots = jnp.ones((b,), bool)

    progs = {
        "float": make_fused_fullres_infer(model, variables, ds, pad, (FULL, FULL)),
        "int8": make_quantized_fullres_infer(
            model, variables, ds, pad, (FULL, FULL), projs[:2], rots[:2],
            float_levels=args.float_levels,
        ),
    }

    for name, infer in progs.items():
        fn = jax.jit(lambda p, r: infer(p, r)[0])
        compiled = fn.lower(projs, rots).compile()
        txt = compiled.as_text()

        # --- convolution dtype census (result dtype per conv op) ----------
        conv_out = Counter(re.findall(r"\n\s*\S+ = (\w+)\[[^\]]*\][^\n]*? convolution", txt))

        # --- fusion result-dtype census: fused s32->s8 requantize passes
        # show up as fusions with s8 roots --------------------------------
        fusion_sigs = Counter(
            m.group(1) for m in
            re.finditer(r"\n\s*\S+ = \(?([a-z0-9]+)\[[^\]]*\][^\n]*? fusion\(", txt)
        )
        s8_root_fusions = re.findall(r"= s8\[[^\]]*\][^\n]*? fusion\(", txt)

        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = ca.get("flops", float("nan"))
        bytes_acc = ca.get("bytes accessed", float("nan"))

        print("== {} (rung {}x, pad {}, batch {}, float_levels={}) ==".format(
            name, ds, pad, b, args.float_levels if name != "float" else "-"))
        print("  conv result dtypes: {}".format(dict(conv_out)))
        print("  fusion result dtypes: {}".format(dict(fusion_sigs)))
        print("  fusions with s8 roots: {}".format(len(s8_root_fusions)))
        print("  cost analysis: {:.3e} flops, {:.3e} bytes accessed, "
              "arith intensity {:.1f} flop/byte".format(
                  flops, bytes_acc, flops / max(bytes_acc, 1.0)))
        # per-dtype byte breakdown when exposed
        for k in sorted(ca):
            if k.startswith("bytes accessed"):
                print("    {}: {:.3e}".format(k, ca[k]))
        print(flush=True)


if __name__ == "__main__":
    main()
