"""Interactive 3D visualization of the projective geometry (reference
examples_dataset/full_res_3d_viz.py). Requires the optional 'vtk' package.

  python -m deepfluoro_tpu.cli.full_res_3d_viz full_res.h5 17-1882 --proj 0
"""

from __future__ import annotations

import argparse

from deepfluoro_tpu.viz.projective import view_3d_scene


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="3D visualization of CT meshes, landmarks, and projection geometry.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("ds_path", help="Path to full-resolution HDF5 archive", type=str)
    parser.add_argument("spec_id", help="Specimen group name (e.g. 17-1882)", type=str)
    parser.add_argument("--proj", help="projection index", type=int, default=0)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    view_3d_scene(args.ds_path, args.spec_id, args.proj)


if __name__ == "__main__":
    main()
