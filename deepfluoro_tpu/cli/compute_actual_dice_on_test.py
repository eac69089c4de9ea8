"""Hard-Dice evaluation CLI — contract-compatible with the reference
compute_actual_dice_on_test.py:19-96.

  python -m deepfluoro_tpu.cli.compute_actual_dice_on_test \
    ipcai_2020_ds_8x.h5 spec_1_test.h5 nn-segs spec_1_dice.csv 1
"""

from __future__ import annotations

import argparse

import h5py as h5
import numpy as np

from deepfluoro_tpu.eval.dice import hard_dice, write_dice_csv


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="compute actual dice coefficients between estimated segmentations and ground truth. Scores are written out in CSV format.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("ds_path", help="HDF5 archive with the ground-truth segmentations", type=str)
    parser.add_argument("seg_file", help="HDF5 file holding the estimated label maps", type=str)
    parser.add_argument("seg_group", help="group path of the estimated label maps", type=str)
    parser.add_argument("csv_out", help="destination CSV (pat,proj,label,dice)", type=str)
    parser.add_argument("pat_ind", help="specimen ID to evaluate", type=int)
    parser.add_argument("--no-hdr", help="omit the CSV header row", action="store_true")
    parser.add_argument("--num-classes", help="segmentation class count incl. background", type=int, default=7)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    from deepfluoro_tpu.utils.platform import enable_compilation_cache, select_platform

    select_platform()
    enable_compilation_cache()

    from deepfluoro_tpu.native import read_dataset_direct

    with h5.File(args.ds_path, "r") as f:
        gt_segs = f["{:02d}/segs".format(args.pat_ind)][:]

    with h5.File(args.seg_file, "r") as f:
        # nn-segs follow the per-image-chunk gzip contract: read them via
        # direct chunk reads + native parallel inflate
        est_segs = read_dataset_direct(f[args.seg_group])

    assert gt_segs.shape[0] == est_segs.shape[0]

    dices = hard_dice(np.asarray(gt_segs), np.asarray(est_segs), args.num_classes)
    write_dice_csv(args.csv_out, args.pat_ind, dices, no_hdr=args.no_hdr)


if __name__ == "__main__":
    main()
