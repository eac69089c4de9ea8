"""Fused full-resolution ensemble inference CLI — raw archive in, nn-segs out.

  python -m deepfluoro_tpu.cli.seg_fullres ipcai_2020_full_res_data.h5 \
    spec_17-1882_test.h5 --ds-factor 8 --nets yy_best_net.pt [more.pt ...] \
    [--pats 17-1882,18-1109] [--batch-size N] [--times times.txt] [--int8]

Framework extension with no reference counterpart: the reference's
test_ensemble.py consumes server-side preprocessed per-level archives
(hdf5_layouts/Readme.md:42-45), while this serves the RAW full-res archive
directly — one compiled program per rung folds crop/log/rot-180/downsample/
pad/z-norm into the ensemble forward (BASELINE.md ladder: 2177 frames/s at
8x down to 19.1 frames/s at 1x on one v5e chip). The output file carries the
same ``nn-segs``/``nn-heats``/``land-names`` contract as cli.test_ensemble,
so est_lands_csv / compute_actual_dice_on_test consume it unchanged against
a preprocessed GT archive of the same factor.
"""

from __future__ import annotations

import argparse

import h5py as h5


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Run the ensemble directly on a RAW full-resolution archive.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("input_data_file_path", help="input FULL-RES HDF5 archive (raw 1536^2 frames)", type=str)
    parser.add_argument("output_data_file_path", help="output HDF5 file for nn-segs / nn-heats", type=str)
    parser.add_argument("--ds-factor", help="downsample factor the nets were trained at (1/2/4/8/16)", type=int, required=True)
    parser.add_argument("--nets", help="checkpoint files of the ensemble members", type=str, nargs="+", required=True)
    parser.add_argument("--pats", help="comma-separated full-res specimen GROUP NAMES (e.g. 17-1882); default: all", type=str, default="")
    parser.add_argument("--no-gpu", help="force the CPU backend", action="store_true")
    parser.add_argument("--times", help="write per-image inference seconds to this file", type=str, default="")
    parser.add_argument("--batch-size", help="frames per fused inference batch", type=int, default=4)
    parser.add_argument("--int8", help="post-training int8 quantized inference (worth it only at the 8x rung — BASELINE.md)", action="store_true")
    parser.add_argument("--int8-float-levels", help="hybrid mode: keep the finest N U-Net levels in float, quantize only the deeper MXU-bound levels", type=int, default=0)
    parser.add_argument("--profile-dir", help="write a jax.profiler trace to this directory", type=str, default="")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    from deepfluoro_tpu.utils.platform import enable_compilation_cache, select_platform

    select_platform(no_gpu=args.no_gpu)
    enable_compilation_cache()

    from deepfluoro_tpu.data.hdf5 import write_land_names
    from deepfluoro_tpu.infer import load_net_from_checkpoint
    from deepfluoro_tpu.infer.fullres import (
        fullres_land_names,
        list_fullres_frames,
        seg_fullres_dataset,
    )

    models_and_vars = []
    cfg = None
    for net_path in args.nets:
        print("  loading state from disk for: {}".format(net_path))
        model, variables, net_cfg = load_net_from_checkpoint(net_path)
        models_and_vars.append((model, variables))
        if cfg is not None:
            for field in ("num_lands", "proj_unet_dim", "num_classes"):
                a, b = getattr(cfg, field), getattr(net_cfg, field)
                if a != b:
                    raise ValueError(
                        "ensemble members disagree on {}: {} vs {} ({})".format(
                            field, a, b, net_path
                        )
                    )
        cfg = net_cfg

    specimens = [s for s in args.pats.split(",") if s] or None
    num_lands = cfg.num_lands

    from deepfluoro_tpu.utils.profiling import profile_trace

    times: list[float] = []
    with h5.File(args.input_data_file_path, "r") as src, \
            h5.File(args.output_data_file_path, "w") as f:
        entries = list_fullres_frames(src, specimens)
        print("Number of full-res projections: {}".format(len(entries)))
        if num_lands > 0:
            land_names = fullres_land_names(src, entries)
            if land_names is not None:
                if len(land_names) != num_lands:
                    raise ValueError(
                        "archive carries {} landmark names but the nets "
                        "expect {}".format(len(land_names), num_lands)
                    )
                write_land_names(f, land_names)
        print("running fused preprocess + ensemble on raw frames")
        with profile_trace(args.profile_dir):
            seg_fullres_dataset(
                src,
                specimens,
                models_and_vars,
                f,
                ds_factor=args.ds_factor,
                num_lands=num_lands,
                times=times,
                batch_size=args.batch_size,
                pad_img_dim=cfg.proj_unet_dim,
                quantized=args.int8,
                int8_float_levels=args.int8_float_levels,
            )
        f.flush()

    if args.times:
        from deepfluoro_tpu.utils.io import write_floats_to_txt

        write_floats_to_txt(args.times, times)


if __name__ == "__main__":
    main()
