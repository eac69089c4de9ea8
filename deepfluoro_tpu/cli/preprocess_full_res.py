"""Convert the full-resolution archive into a preprocessed training archive —
the pipeline the reference documents but does not implement (README.md:84-95):
crop 50px borders, Beer-Lambert log transform, patient-up rotation, 2x/4x/8x/
16x downsampling (device-side, fused).

  python -m deepfluoro_tpu.cli.preprocess_full_res full_res.h5 out_8x.h5 --ds-factor 8
"""

from __future__ import annotations

import argparse

from deepfluoro_tpu.data.preprocess import full_res_to_preprocessed


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Preprocess the full-resolution archive into a training-ready dataset.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("input_path", help="full-resolution HDF5 archive", type=str)
    parser.add_argument("output_path", help="output preprocessed HDF5", type=str)
    parser.add_argument("--ds-factor", help="downsampling factor per 2D dim (2/4/8/16)", type=int, default=8)
    parser.add_argument("--no-gpu", help="Only use CPU", action="store_true")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    from deepfluoro_tpu.utils.platform import enable_compilation_cache, select_platform

    select_platform(no_gpu=args.no_gpu)
    enable_compilation_cache()

    out = full_res_to_preprocessed(args.input_path, args.output_path, args.ds_factor)
    print("wrote {}".format(out))


if __name__ == "__main__":
    main()
