"""Per-specimen tiled GT overlay PNGs for a preprocessed archive
(reference examples_dataset/make_preproc_overlays.py).

  python -m deepfluoro_tpu.cli.make_preproc_overlays <preproc.h5> [out_dir]
"""

from __future__ import annotations

import sys

from deepfluoro_tpu.viz.examples import make_preproc_overlays


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 1:
        print("ERROR: supply path to HDF5 data file as first argument")
        sys.exit(1)
    out_dir = argv[1] if len(argv) > 1 else "."
    for p in make_preproc_overlays(argv[0], out_dir):
        print(p)


if __name__ == "__main__":
    main()
