"""Train the full leave-one-specimen-out ensemble in ONE run — complete
paper recipe per fold.

The reference produces its 6-fold ensemble via six sequential train.py
invocations of the full recipe (train_test_code/Readme.md:14-17: plateau LR,
best-valid checkpointing, resume, up to 500 epochs). This CLI trains all
folds in one program per step (train/multifold.py fit_multifold; folds
combined with lax.map — measured faster than a fold-axis vmap, see
BASELINE.md): per-fold validation splits, per-fold LR state machines,
per-fold best-valid + periodic checkpoints, full resume, wall-clock budget.

  python -m deepfluoro_tpu.cli.train_folds ipcai_2020_ds_8x.h5 \
    --pats 1,2,3,4,5,6 --num-classes 7 --init-lr 0.1 --momentum 0.9 \
    --unet-batch-norm --unet-no-max-pool --unet-img-dim 192 \
    --unet-num-lvls 6 --batch-size 5 --epochs 500 --unet-init-feats-exp 5 \
    --wgt-decay 0.0001 --data-aug --unet-padding --nesterov --use-lands \
    --lr-sched plateau --train-valid-split 0.85 --net-prefix yy_fold

Writes, per fold (spec0K HELD OUT of fold K's training — test on it):
  <net-prefix>_spec0K.pt             best-validation network (the ensemble
                                     member; consumable by test_ensemble)
  <checkpoint-prefix>_spec0K.pt      periodic/resume checkpoint
"""

from __future__ import annotations

import argparse

from deepfluoro_tpu.data.hdf5 import get_num_lands_from_dataset
from deepfluoro_tpu.train import TrainConfig
from deepfluoro_tpu.train.multifold import fit_multifold


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Train all leave-one-specimen-out folds simultaneously (full recipe).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("input_data_file_path", type=str)
    parser.add_argument("--pats", help="comma list of specimen IDs; one fold per held-out specimen", type=str, required=True)
    parser.add_argument("--num-classes", type=int, default=7)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--unet-img-dim", type=int, default=364)
    parser.add_argument("--epochs", help="Maximum number of epochs", type=int, default=200)
    parser.add_argument("--optim", help="Optimization strategy to use.", type=str, default="sgd")
    parser.add_argument("--lr-sched", help="'cos' | 'plateau' | 'none' (per-fold state machines)", type=str, default="plateau")
    parser.add_argument("--init-lr", type=float, default=1.0e-2)
    parser.add_argument("--lr-patience", type=int, default=20)
    parser.add_argument("--lr-cooldown", type=int, default=20)
    parser.add_argument("--cos-anneal-epochs", type=int, default=10)
    parser.add_argument("--cos-growth", type=int, default=2)
    parser.add_argument("--max-num-restarts", type=int, default=-1)
    parser.add_argument("--momentum", type=float, default=0.9)
    parser.add_argument("--wgt-decay", type=float, default=0.0)
    parser.add_argument("--nesterov", action="store_true")
    parser.add_argument("--max-hours", type=float, default=-1.0)
    parser.add_argument("--unet-num-lvls", type=int, default=5)
    parser.add_argument("--unet-init-feats-exp", type=int, default=4)
    parser.add_argument("--unet-batch-norm", action="store_true")
    parser.add_argument("--unet-padding", action="store_true")
    parser.add_argument("--unet-no-max-pool", action="store_true")
    parser.add_argument("--unet-block-depth", type=int, default=2)
    parser.add_argument("--unet-no-res", action="store_true")
    parser.add_argument("--data-aug", action="store_true")
    parser.add_argument("--use-lands", action="store_true")
    parser.add_argument("--heat-coeff", type=float, default=0.5)
    parser.add_argument("--dice-valid", help="Use only dice validation loss even when training with dice + heatmap loss", action="store_true")
    parser.add_argument("--train-valid-split", help="Per-fold ratio of the training pool kept for training; the rest validates", type=float, default=0.85)
    parser.add_argument("--checkpoint-freq", type=int, default=1)
    parser.add_argument("--light-best-nets", help="best-valid nets store only arch meta + weights + BN stats, not optimizer/scheduler state — halves their size; the resume checkpoints keep full state", action="store_true")
    parser.add_argument("--net-prefix", help="Prefix for per-fold BEST-VALIDATION networks <prefix>_specXX.pt", type=str, default="zz_fold")
    parser.add_argument("--checkpoint-prefix", help="Prefix for per-fold resume checkpoints", type=str, default="zz_fold_checkpoint")
    parser.add_argument("--train-loss-prefix", help="Prefix for per-fold train loss txt files ('' disables)", type=str, default="")
    parser.add_argument("--valid-loss-prefix", help="Prefix for per-fold valid loss txt files ('' disables)", type=str, default="")
    parser.add_argument("--ensemble-devices", help="shard the fold axis over this many devices (an 'ensemble' mesh axis); 0 = single device (or, multi-process, every pod device)", type=int, default=0)
    parser.add_argument("--num-processes", help="total process count for multi-host (pod) fold training; run one process per host with the same flags", type=int, default=0)
    parser.add_argument("--process-id", help="this process's index in [0, --num-processes)", type=int, default=None)
    parser.add_argument("--coordinator", help="multi-host coordinator address host:port (jax.distributed)", type=str, default=None)
    parser.add_argument("--save-restart-net", help="Prefix for per-fold pre-warm-restart snapshots <prefix>_specXX_RR.pt (cos schedule)", type=str, default="")
    parser.add_argument("--save-after-n-restarts", help="Only save pre-restart snapshots once this many restarts have happened", type=int, default=0)
    parser.add_argument("--stream-data", help="Keep the union dataset in host memory and stream prefetched per-fold batches to the device (for archives too large for HBM, e.g. full-res); default keeps the union device-resident", action="store_true")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--remat", help="Rematerialize activations per U-Net block (memory for compute; equal up to float reassociation)", action="store_true")
    parser.add_argument("--dup-lr-flip", help="Duplicate every training sample with a left/right mirror; mirrors join after each fold's split (validation and held-out frames stay mirror-free)", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no-gpu", action="store_true")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    # multi-host entry: join the pod BEFORE any device query — select_platform
    # eagerly PINS (initializes) the requested backend, and
    # jax.distributed.initialize refuses to run once any backend exists
    # (same ordering contract as cli.train)
    multiproc = bool(args.num_processes and args.num_processes > 1)
    if multiproc:
        from deepfluoro_tpu.parallel.multihost import initialize

        initialize(args.coordinator, args.num_processes, args.process_id)

    from deepfluoro_tpu.utils.platform import enable_compilation_cache, select_platform

    select_platform(no_gpu=args.no_gpu)
    enable_compilation_cache()

    pats = [int(p) for p in args.pats.split(",")]
    assert len(pats) >= 2, "need at least two specimens for leave-one-out"

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
        max_num_epochs=args.epochs,
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
        light_best_nets=args.light_best_nets,
        save_restart_net_prefix=args.save_restart_net or None,
        save_after_n_restarts=args.save_after_n_restarts,
        seed=args.seed,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        remat=args.remat,
        dup_lr_flip=args.dup_lr_flip,
    )

    mesh = None
    if args.ensemble_devices > 0 or multiproc:
        import jax

        from deepfluoro_tpu.parallel import make_mesh

        n_dev = args.ensemble_devices
        if multiproc and n_dev <= 0:
            # multi-host without an explicit layout: the 'ensemble' axis must
            # span the pod (a mesh over one host's devices cannot satisfy
            # fit_multifold's every-process-owns-mesh-devices requirement)
            n_dev = len(jax.devices())
        assert len(pats) % n_dev == 0, (
            "fold count {} must divide over {} devices".format(len(pats), n_dev)
        )
        mesh = make_mesh({"ensemble": n_dev}, devices=jax.devices()[:n_dev])
        if jax.process_index() == 0:
            print("device mesh: {{'ensemble': {}}}".format(n_dev), flush=True)

    out = fit_multifold(
        args.input_data_file_path,
        pats,
        cfg,
        checkpoint_prefix=args.checkpoint_prefix,
        best_prefix=args.net_prefix,
        train_loss_txt_prefix=args.train_loss_prefix or None,
        valid_loss_txt_prefix=args.valid_loss_prefix or None,
        mesh=mesh,
        stream_data=args.stream_data,
    )
    import jax

    if jax.process_index() == 0:
        for k, p in enumerate(pats):
            print(
                "fold {} (held-out spec {:02d}): best valid {:.6f} -> {}_spec{:02d}.pt".format(
                    k, p, out["best_valid_losses"][k], args.net_prefix, p
                )
            )


if __name__ == "__main__":
    main()
