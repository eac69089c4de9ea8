"""Export a native checkpoint to the reference stack's torch ``.pt`` format
(the save_net payload, train.py:473-515) so models trained HERE run — and
resume — in the reference's train_test_code unchanged.

  python -m deepfluoro_tpu.cli.export_torch_net zz_checkpoint.pt reference_net.pt
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="export a native checkpoint as a reference torch .pt file",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("native_path", help="native (msgpack) checkpoint to export", type=str)
    parser.add_argument("out_path", help="destination .pt file", type=str)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    from deepfluoro_tpu.utils.platform import select_platform

    # a host-side format conversion: never pay accelerator dispatch for it
    select_platform(no_gpu=True)

    from deepfluoro_tpu.compat.torch_import import export_torch_checkpoint

    print(export_torch_checkpoint(args.native_path, args.out_path))


if __name__ == "__main__":
    main()
