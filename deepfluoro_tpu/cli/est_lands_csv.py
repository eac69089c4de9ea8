"""Landmark location estimation CLI — contract-compatible with the reference
est_lands_csv.py:24-134.

  python -m deepfluoro_tpu.cli.est_lands_csv spec_1_test.h5 nn-heats \
    --use-seg nn-segs --pat 1 --out spec_1_lands.csv
"""

from __future__ import annotations

import argparse

import h5py as h5
import numpy as np

from deepfluoro_tpu.data.hdf5 import get_land_names_from_dataset
from deepfluoro_tpu.eval.landmarks import detect_landmarks_timed, write_landmarks_csv


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="estimate landmark locations and write to CSV",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("heat_file_path", help="HDF5 file holding the estimated heatmaps (test_ensemble output)", type=str)
    parser.add_argument("heats_group_path", help="group path of the heatmaps inside the file", type=str)
    parser.add_argument("--out", help="destination CSV of detected landmark locations", type=str, default="yy_lands_est.csv")
    parser.add_argument("--pat", help="specimen ID written into the CSV rows", type=int)
    parser.add_argument("--use-seg", help="group path of estimated segmentations; gates each landmark to its structure", type=str, default="")
    parser.add_argument("--no-hdr", help="omit the CSV header row", action="store_true")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    from deepfluoro_tpu.utils.platform import enable_compilation_cache, select_platform

    select_platform()
    enable_compilation_cache()

    land_names = get_land_names_from_dataset(args.heat_file_path)

    print("reading heatmaps...")
    # direct-chunk reads + native parallel inflate (falls back to plain h5py
    # slicing for layouts outside the inference output contract)
    from deepfluoro_tpu.native import read_dataset_direct

    with h5.File(args.heat_file_path, "r") as f:
        heats = read_dataset_direct(f[args.heats_group_path])
        segs = read_dataset_direct(f[args.use_seg]) if args.use_seg else None

    print("detecting landmark locations...")
    # per-projection measured times (each projection's L detections run as
    # one device program; its wall-clock is divided evenly over the rows) —
    # keeps the reference's varying per-row `time` column contract
    rows, cols, times = detect_landmarks_timed(np.asarray(heats), land_names, segs)

    write_landmarks_csv(
        args.out, args.pat, rows, cols, per_land_time=times, no_hdr=args.no_hdr
    )


if __name__ == "__main__":
    main()
