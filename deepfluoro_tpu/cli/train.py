"""Training CLI — flag-compatible with the reference train.py:25-102.

Example (the IPCAI paper recipe, train_test_code/Readme.md:14-17):
  python -m deepfluoro_tpu.cli.train ipcai_2020_ds_8x.h5 \
    --train-pats 2,3,4,5,6 --num-classes 7 --init-lr 0.1 --momentum 0.9 \
    --unet-batch-norm --unet-no-max-pool --unet-img-dim 192 --unet-num-lvls 6 \
    --batch-size 5 --max-num-epochs 500 --unet-init-feats-exp 5 \
    --wgt-decay 0.0001 --data-aug --unet-padding --nesterov \
    --checkpoint-net yy_check_net.pt --checkpoint-freq 100 --use-lands \
    --best-net yy_best_net.pt --lr-sched plateau --train-valid-split 0.85 \
    --heat-coeff 0.5
"""

from __future__ import annotations

import argparse

from deepfluoro_tpu.data.hdf5 import get_num_lands_from_dataset
from deepfluoro_tpu.train import TrainConfig, fit


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Training.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("input_data_file_path", help="HDF5 archive holding the preprocessed projections/segmentations", type=str)
    parser.add_argument("--train-pats", help="comma-separated specimen IDs to train on", type=str)
    parser.add_argument("--valid-pats", help="comma-separated specimen IDs to validate on", type=str)
    parser.add_argument("--num-classes", help="number of segmentation classes (incl. background)", type=int)
    parser.add_argument("--batch-size", help="minibatch size in images", type=int, default=1)
    parser.add_argument("--unet-img-dim", help="reflect-pad images to this square size before the U-Net", type=int, default=364)
    parser.add_argument("--checkpoint-net", help="periodic/resume checkpoint file", type=str, default="zz_checkpoint.pt")
    parser.add_argument("--best-net", help="file for the network with the lowest validation loss", type=str, default="zz_best_valid.pt")
    parser.add_argument("--checkpoint-freq", help="save the checkpoint every this many epochs", type=int, default=1)
    parser.add_argument("--no-save-best-valid", help="disable writing the best-validation network", action="store_true")
    parser.add_argument("--light-best-nets", help="best-valid / pre-restart files store only arch meta + weights + BN stats (inference artifacts), not optimizer/scheduler state — halves their size; the periodic checkpoint keeps full state for resume", action="store_true")
    parser.add_argument("--optim", help="optimizer: sgd | adam | rmsprop", type=str, default="sgd")
    parser.add_argument("--lr-sched", help="LR schedule: 'cos' = warm-restart cosine annealing, 'plateau' = decay when validation stalls, 'none' = constant", type=str, default="cos")
    parser.add_argument("--init-lr", help="starting learning rate", type=float, default=1.0e-2)
    parser.add_argument("--lr-patience", help="plateau schedule: epochs without improvement before decaying", type=int, default=20)
    parser.add_argument("--lr-cooldown", help="plateau schedule: epochs to wait after a decay", type=int, default=20)
    parser.add_argument("--nesterov", help="enable Nesterov momentum (SGD)", action="store_true")
    parser.add_argument("--momentum", help="momentum coefficient", type=float, default=0.9)
    parser.add_argument("--wgt-decay", help="L2 weight-decay coefficient", type=float, default=0)
    parser.add_argument("--cos-anneal-epochs", help="cosine schedule: epochs per annealing period", type=int, default=10)
    parser.add_argument("--cos-growth", help="cosine schedule: period multiplier applied at each restart", type=int, default=2)
    parser.add_argument("--save-restart-net", help="save a snapshot right before each warm restart as <PREFIX>_XX.pt", type=str)
    parser.add_argument("--save-after-n-restarts", help="only start writing pre-restart snapshots after this many restarts", type=int, default=0)
    parser.add_argument("--max-num-restarts", help="stop after this many warm restarts (<= 0 disables; takes precedence over --max-num-epochs)", type=int, default=-1)
    parser.add_argument("--max-num-epochs", help="epoch budget", type=int, default=200)
    parser.add_argument("--train-loss-txt", help="per-iteration training-loss log file", type=str, default="train_iter_loss.txt")
    parser.add_argument("--valid-loss-txt", help="per-epoch validation-loss log file", type=str, default="valid_loss.txt")
    parser.add_argument("--no-gpu", help="force the CPU backend even when an accelerator exists", action="store_true")
    parser.add_argument("--max-hours", help="wall-clock budget in hours; exits early if the next epoch would overrun", type=float, default=-1.0)
    parser.add_argument("--unet-num-lvls", help="U-Net encoder depth (levels)", type=int, default=5)
    parser.add_argument("--unet-init-feats-exp", help="log2 of the first level's feature count", type=int, default=4)
    parser.add_argument("--unet-batch-norm", help="insert BatchNorm after each conv+ReLU", action="store_true")
    parser.add_argument("--unet-padding", help="SAME-pad convolutions so feature maps keep their size", action="store_true")
    parser.add_argument("--unet-no-max-pool", help="downsample with learned strided convs instead of max-pool", action="store_true")
    parser.add_argument("--unet-block-depth", help="convolutions per block at each level", type=int, default=2)
    parser.add_argument("--data-aug", help="enable the stochastic augmentation pipeline", action="store_true")
    parser.add_argument("--use-lands", help="add the landmark-heatmap head (count read from the archive)", action="store_true")
    parser.add_argument("--heat-coeff", help="heatmap-loss weight; the dice term gets one minus this", type=float, default=0.5)
    parser.add_argument("--dice-valid", help="validate with the dice term only, even for joint training", action="store_true")
    parser.add_argument("--unet-no-res", help="drop the 1x1 residual shortcuts in conv blocks", action="store_true")
    parser.add_argument("--train-valid-split", help="fraction of the pool used for training, remainder validates; active in [0,1] and overrides --valid-pats", type=float, default=-1.0)
    parser.add_argument("--stream-data", help="Keep the dataset in host memory and double-buffer batches to the device (for archives too large for HBM, e.g. full-res); default keeps the dataset device-resident", action="store_true")
    parser.add_argument("--bf16", help="Use bfloat16 compute on TPU (float32 params)", action="store_true")
    parser.add_argument("--remat", help="Rematerialize activations per U-Net block during backprop: fits large-resolution frames / bigger batches in device memory for ~1 extra forward of compute; results equal up to float reassociation", action="store_true")
    parser.add_argument("--dup-lr-flip", help="Duplicate every training sample with a left/right mirror (flipped projections, bilateral seg labels and landmark pairs swapped); mirrors join AFTER the train/valid split so validation stays leak-free — the reference's dup_data_w_left_right_flip intent with its bugs fixed", action="store_true")
    parser.add_argument("--seed", help="random seed", type=int, default=0)
    parser.add_argument("--dp-devices", help="shard each batch over this many devices (data parallelism); 0 = all devices when any parallel flag is active, 1 = off", type=int, default=1)
    parser.add_argument("--spatial-devices", help="also shard image rows over this many devices (for large-resolution training); composes with --dp-devices on one 2-D mesh", type=int, default=1)
    parser.add_argument("--tp-devices", help="shard conv channels over this many devices (tensor parallelism); composes with --dp-devices, NOT with --spatial-devices (GSPMD miscompiles that composition — measured)", type=int, default=1)
    parser.add_argument("--num-processes", help="total process count for multi-host (pod) training; run one process per host with the same flags", type=int, default=0)
    parser.add_argument("--process-id", help="this process's index in [0, --num-processes)", type=int, default=None)
    parser.add_argument("--coordinator", help="multi-host coordinator address host:port (jax.distributed)", type=str, default=None)
    parser.add_argument("--profile-dir", help="Write a jax.profiler trace (TensorBoard-loadable) to this directory", type=str, default="")
    parser.add_argument("--debug-nans", help="Fault on the first NaN-producing op (jax_debug_nans)", action="store_true")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    # multi-host entry: join the pod BEFORE any device query (SURVEY §2.3
    # comm-backend row — jax.distributed is the NCCL/MPI equivalent).
    # Must precede select_platform: that now eagerly PINS the requested
    # backend (initializing it), and jax.distributed.initialize refuses to
    # run once any backend exists.
    if args.num_processes and args.num_processes > 1:
        from deepfluoro_tpu.parallel.multihost import initialize

        initialize(args.coordinator, args.num_processes, args.process_id)

    from deepfluoro_tpu.utils.platform import enable_compilation_cache, select_platform

    select_platform(no_gpu=args.no_gpu)
    enable_compilation_cache()

    mesh = None
    if args.dp_devices != 1 or args.spatial_devices > 1 or args.tp_devices > 1 or (
        args.num_processes and args.num_processes > 1
    ):
        import jax

        from deepfluoro_tpu.parallel import make_mesh

        multiproc = bool(args.num_processes and args.num_processes > 1)
        sp = max(1, args.spatial_devices)
        tp = max(1, args.tp_devices)
        assert not (sp > 1 and tp > 1), (
            "--spatial-devices does not compose with --tp-devices: the GSPMD "
            "partitioner mis-computes first-conv weight gradients for "
            "spatially-sharded inputs against channel-sharded kernels "
            "(measured, parallel/sharding.py) — pick one, or combine either "
            "with --dp-devices"
        )
        dp = args.dp_devices
        if dp <= 0 or (multiproc and dp == 1 and sp == 1 and tp == 1):
            # default: data parallelism over every remaining device. Also
            # applied when multi-host is requested without an explicit
            # parallelism layout — a {'data': 1} mesh over one of process
            # 0's devices cannot span the pod and would fail deep inside
            # the cross-process batch assembly
            dp = len(jax.devices()) // (sp * tp)
        axes = {"data": dp}
        if sp > 1:
            axes["spatial"] = sp
        if tp > 1:
            axes["model"] = tp
        mesh = make_mesh(axes, devices=jax.devices()[: dp * sp * tp])
        if multiproc:
            procs_on_mesh = {d.process_index for d in mesh.devices.flat}
            assert len(procs_on_mesh) == jax.process_count(), (
                "the {}-device mesh spans only {} of {} processes — every "
                "process must own mesh devices (it feeds its slice of each "
                "global batch); raise --dp-devices/--spatial-devices".format(
                    dp * sp * tp, len(procs_on_mesh), jax.process_count()
                )
            )
        print("device mesh: {}".format(dict(zip(mesh.axis_names, mesh.devices.shape))), flush=True)

    # the reference leaves --num-classes default-less and crashes deep inside
    # torch when omitted; fail loudly at the CLI boundary instead
    assert args.num_classes is not None, "--num-classes is required"
    assert args.train_pats is not None
    train_pats = [int(i) for i in args.train_pats.split(",")]
    assert len(train_pats) > 0

    valid_pats = None
    if args.train_valid_split < 0:
        assert args.valid_pats is not None
        valid_pats = [int(i) for i in args.valid_pats.split(",")]
        assert len(valid_pats) > 0

    num_lands = 0
    if args.use_lands:
        num_lands = get_num_lands_from_dataset(args.input_data_file_path)
        print("num. lands read from file: {}".format(num_lands))
        assert num_lands > 0

    cfg = TrainConfig(
        num_classes=args.num_classes,
        batch_size=args.batch_size,
        proj_unet_dim=args.unet_img_dim,
        optim_type=args.optim,
        init_lr=args.init_lr,
        nesterov=args.nesterov,
        momentum=args.momentum,
        wgt_decay=args.wgt_decay,
        lr_sched_meth=args.lr_sched.lower(),
        lr_patience=args.lr_patience,
        lr_cooldown=args.lr_cooldown,
        lrs_num_epochs=args.cos_anneal_epochs,
        lrs_growth_factor=args.cos_growth,
        max_num_restarts=args.max_num_restarts,
        save_after_n_restarts=args.save_after_n_restarts,
        save_restart_net_prefix=args.save_restart_net,
        max_num_epochs=args.max_num_epochs,
        max_hours=args.max_hours,
        depth=args.unet_num_lvls,
        init_feats_exp=args.unet_init_feats_exp,
        batch_norm=args.unet_batch_norm,
        padding=args.unet_padding,
        no_max_pool=args.unet_no_max_pool,
        block_depth=args.unet_block_depth,
        use_res=not args.unet_no_res,
        data_aug=args.data_aug,
        num_lands=num_lands,
        heat_coeff=args.heat_coeff,
        use_dice_valid=args.dice_valid,
        train_valid_split=args.train_valid_split,
        checkpoint_freq=args.checkpoint_freq,
        save_best_valid=not args.no_save_best_valid,
        light_best_nets=args.light_best_nets,
        seed=args.seed,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        remat=args.remat,
        dup_lr_flip=args.dup_lr_flip,
    )

    from deepfluoro_tpu.utils.profiling import enable_nan_debugging, profile_trace

    if args.debug_nans:
        enable_nan_debugging()

    with profile_trace(args.profile_dir):
        fit(
            args.input_data_file_path,
            train_pats,
            cfg,
            valid_pats=valid_pats,
            checkpoint_filename=args.checkpoint_net,
            best_valid_filename=args.best_net,
            train_loss_txt=args.train_loss_txt,
            valid_loss_txt=args.valid_loss_txt,
            stream_data=args.stream_data,
            mesh=mesh,
            shard_spatial=args.spatial_devices > 1,
        )


if __name__ == "__main__":
    main()
