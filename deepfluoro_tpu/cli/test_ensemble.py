"""Ensemble segmentation + heatmap estimation CLI — contract-compatible with
the reference test_ensemble.py:20-148.

  python -m deepfluoro_tpu.cli.test_ensemble ipcai_2020_ds_8x.h5 \
    spec_1_test.h5 --pats 1 --nets yy_best_net.pt [more.pt ...] \
    [--times times.txt] [--no-gpu] [--batch-size N]

Writes ``nn-segs`` (u1, gzip-9) and ``nn-heats`` plus the ``land-names``
group to the output HDF5; optional per-image runtimes file.
"""

from __future__ import annotations

import argparse

import h5py as h5

from deepfluoro_tpu.data.hdf5 import (
    get_land_names_from_dataset,
    load_dataset,
    write_land_names,
)
from deepfluoro_tpu.infer import load_net_from_checkpoint, seg_dataset_ensemble


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Run ensemble segmentation and heatmap estimation.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("input_data_file_path", help="input HDF5 archive with the test projections", type=str)
    parser.add_argument("output_data_file_path", help="output HDF5 file for nn-segs / nn-heats", type=str)
    parser.add_argument("--nets", help="checkpoint files of the ensemble members", type=str, nargs="+")
    parser.add_argument("--pats", help="comma-separated specimen IDs to run inference on", type=str)
    parser.add_argument("--no-gpu", help="force the CPU backend", action="store_true")
    parser.add_argument("--times", help="write per-image inference seconds to this file", type=str, default="")
    parser.add_argument("--batch-size", help="Images per inference batch (1 matches the reference's timing granularity)", type=int, default=1)
    parser.add_argument("--ensemble-devices", help="shard the ensemble members over this many devices (must divide the number of --nets); 0 = off", type=int, default=0)
    parser.add_argument("--dp-devices", help="also shard each inference batch over this many devices (must divide --batch-size); composes with --ensemble-devices on one mesh", type=int, default=0)
    parser.add_argument("--profile-dir", help="Write a jax.profiler trace (TensorBoard-loadable) to this directory", type=str, default="")
    parser.add_argument("--int8", help="post-training int8 quantized inference: every conv runs s8 x s8 -> s32 on the MXU with activation scales calibrated on the first batches of the input data (framework extension; the reference infers in float32)", action="store_true")
    parser.add_argument("--int8-calib-batches", help="number of leading input batches used to calibrate the int8 activation scales", type=int, default=4)
    parser.add_argument("--int8-float-levels", help="hybrid mode: keep the finest N U-Net levels in float and quantize only the deeper MXU-bound levels (the big-frame rungs lose on the early levels' s32 accumulator traffic — BASELINE.md int8 ladder row)", type=int, default=0)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    from deepfluoro_tpu.utils.platform import enable_compilation_cache, select_platform

    select_platform(no_gpu=args.no_gpu)
    enable_compilation_cache()

    assert args.pats is not None
    test_pats = [int(i) for i in args.pats.split(",")]
    assert len(test_pats) > 0

    mesh = None
    if args.ensemble_devices > 0 or args.dp_devices > 0:
        import jax

        from deepfluoro_tpu.parallel import make_mesh

        ens = max(1, args.ensemble_devices)
        dp = max(1, args.dp_devices)
        axes = {"ensemble": ens}
        if dp > 1:
            axes["data"] = dp
        mesh = make_mesh(axes, devices=jax.devices()[: ens * dp])
        print("device mesh: {}".format(dict(zip(mesh.axis_names, mesh.devices.shape))), flush=True)

    models_and_vars = []
    cfg = None
    for net_path in args.nets:
        print("  loading state from disk for: {}".format(net_path))
        model, variables, net_cfg = load_net_from_checkpoint(net_path)
        models_and_vars.append((model, variables))
        # ensemble-wide settings come from the checkpoints; mixed values
        # would silently run members at the wrong padded resolution (or
        # crash deep inside the stacking), so fail loudly at the boundary
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

    num_lands = cfg.num_lands
    land_names = None
    if num_lands > 0:
        land_names = get_land_names_from_dataset(args.input_data_file_path)
        assert len(land_names) == num_lands

    print("initializing testing dataset")
    test_data = load_dataset(args.input_data_file_path, test_pats, no_seg=True)
    print("Length of testing dataset: {}".format(len(test_data)))

    from deepfluoro_tpu.utils.profiling import profile_trace

    print("opening destination file for writing")
    times: list[float] = []
    with h5.File(args.output_data_file_path, "w") as f:
        if land_names:
            write_land_names(f, land_names)
        print("running network on projections")
        with profile_trace(args.profile_dir):
            seg_dataset_ensemble(
                test_data,
                models_and_vars,
                f,
                num_lands=num_lands,
                times=times,
                batch_size=args.batch_size,
                pad_img_dim=cfg.proj_unet_dim,
                num_classes=cfg.num_classes,
                mesh=mesh,
                quantized=args.int8,
                calib_batches=args.int8_calib_batches,
                int8_float_levels=args.int8_float_levels,
            )
        print("closing file...")
        f.flush()

    if args.times:
        from deepfluoro_tpu.utils.io import write_floats_to_txt

        write_floats_to_txt(args.times, times)


if __name__ == "__main__":
    main()
