"""Train the full leave-one-specimen-out ensemble in ONE run.

The reference produces its 6-fold ensemble via six sequential train.py
invocations; this CLI vmaps all folds' training into a single compiled
program (train/multifold.py) and writes one standard self-describing
checkpoint per fold, consumable by test_ensemble:

  python -m deepfluoro_tpu.cli.train_folds ipcai_2020_ds_8x.h5 \
    --pats 1,2,3,4,5,6 --num-classes 7 --init-lr 0.1 --momentum 0.9 \
    --unet-batch-norm --unet-no-max-pool --unet-img-dim 192 \
    --unet-num-lvls 6 --batch-size 5 --epochs 500 --unet-init-feats-exp 5 \
    --wgt-decay 0.0001 --data-aug --unet-padding --nesterov --use-lands \
    --net-prefix yy_fold

Writes yy_fold_spec01.pt ... yy_fold_spec06.pt, where spec0K was HELD OUT
of fold K's training (test it on specimen K).
"""

from __future__ import annotations

import argparse

from deepfluoro_tpu.data.hdf5 import get_num_lands_from_dataset, load_dataset
from deepfluoro_tpu.train import TrainConfig
from deepfluoro_tpu.train.multifold import save_fold_checkpoints, train_multifold


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Train all leave-one-specimen-out folds simultaneously.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("input_data_file_path", type=str)
    parser.add_argument("--pats", help="comma list of specimen IDs; one fold per held-out specimen", type=str, required=True)
    parser.add_argument("--num-classes", type=int, default=7)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--unet-img-dim", type=int, default=364)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--init-lr", type=float, default=1.0e-2)
    parser.add_argument("--momentum", type=float, default=0.9)
    parser.add_argument("--wgt-decay", type=float, default=0.0)
    parser.add_argument("--nesterov", action="store_true")
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
    parser.add_argument("--net-prefix", type=str, default="zz_fold")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no-gpu", action="store_true")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    from deepfluoro_tpu.utils.platform import enable_compilation_cache, select_platform

    select_platform(no_gpu=args.no_gpu)
    enable_compilation_cache()

    pats = [int(p) for p in args.pats.split(",")]
    assert len(pats) >= 2, "need at least two specimens for leave-one-out"

    num_lands = 0
    if args.use_lands:
        num_lands = get_num_lands_from_dataset(args.input_data_file_path)
        print("num. lands read from file: {}".format(num_lands))

    cfg = TrainConfig(
        num_classes=args.num_classes,
        batch_size=args.batch_size,
        proj_unet_dim=args.unet_img_dim,
        optim_type="sgd",
        init_lr=args.init_lr,
        nesterov=args.nesterov,
        momentum=args.momentum,
        wgt_decay=args.wgt_decay,
        lr_sched_meth="none",
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
        seed=args.seed,
        compute_dtype="bfloat16" if args.bf16 else "float32",
    )

    print("loading fold datasets ({} folds)".format(len(pats)))
    folds = [
        load_dataset(args.input_data_file_path, [p for p in pats if p != held_out])
        for held_out in pats
    ]

    model, stacked, hist = train_multifold(folds, cfg, num_epochs=args.epochs, seed=args.seed)

    paths = ["{}_spec{:02d}.pt".format(args.net_prefix, p) for p in pats]
    save_fold_checkpoints(cfg, stacked, paths, epoch=args.epochs, last_losses=hist[-1])
    for p in paths:
        print("wrote", p)


if __name__ == "__main__":
    main()
