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
    parser.add_argument("input_data_file_path", help="Path to the datafile containing projections and segmentations", type=str)
    parser.add_argument("--train-pats", help="comma delimited list of patient IDs used for training", type=str)
    parser.add_argument("--valid-pats", help="comma delimited list of patient IDs used for validation", type=str)
    parser.add_argument("--num-classes", help="The number of label classes to be identified", type=int)
    parser.add_argument("--batch-size", help="Number of images each minibatch", type=int, default=1)
    parser.add_argument("--unet-img-dim", help="Dimension to adjust input images to before inputting into U-Net", type=int, default=364)
    parser.add_argument("--checkpoint-net", help="Path to network saved as checkpoint", type=str, default="zz_checkpoint.pt")
    parser.add_argument("--best-net", help="Path to network saved with best score on the validation data", type=str, default="zz_best_valid.pt")
    parser.add_argument("--checkpoint-freq", help="Frequency (in terms of epochs) at which to save the network checkpoint to disk.", type=int, default=1)
    parser.add_argument("--no-save-best-valid", help="Do not save best validation network to disk.", action="store_true")
    parser.add_argument("--optim", help="Optimization strategy to use.", type=str, default="sgd")
    parser.add_argument("--lr-sched", help="Learning rate scheduling method. 'cos' --> Cosine annealing with warm restarts, 'none' --> fixed LR (at initial), 'plateau' --> reduce learning rate when validation score plateaus", type=str, default="cos")
    parser.add_argument("--init-lr", help="Initial learning rate", type=float, default=1.0e-2)
    parser.add_argument("--lr-patience", help="Patience, in # epochs, when using LR plateau decay", type=int, default=20)
    parser.add_argument("--lr-cooldown", help="Cooldown, in # epochs, when using LR plateau decay", type=int, default=20)
    parser.add_argument("--nesterov", help="Use Nesterov momentum in SGD", action="store_true")
    parser.add_argument("--momentum", help="SGD momentum term", type=float, default=0.9)
    parser.add_argument("--wgt-decay", help="SGD weight decay term", type=float, default=0)
    parser.add_argument("--cos-anneal-epochs", help="Number of epochs in the cosine annealing LR scheduling.", type=int, default=10)
    parser.add_argument("--cos-growth", help="Growth factor to use with warm restarts.", type=int, default=2)
    parser.add_argument("--save-restart-net", help="Prefix used to save networks before warm restart, file path will be <PREFIX>_XX.pt", type=str)
    parser.add_argument("--save-after-n-restarts", help="Save networks prior to warm restart only after this number of restarts.", type=int, default=0)
    parser.add_argument("--max-num-restarts", help="Maximum number of warm restarts; disabled when <= 0, otherwise overrides --max-num-epochs", type=int, default=-1)
    parser.add_argument("--max-num-epochs", help="Maximum number of epochs", type=int, default=200)
    parser.add_argument("--train-loss-txt", help="output file for training loss", type=str, default="train_iter_loss.txt")
    parser.add_argument("--valid-loss-txt", help="output file for validation loss", type=str, default="valid_loss.txt")
    parser.add_argument("--no-gpu", help="Only use CPU - do not use accelerator even if available", action="store_true")
    parser.add_argument("--max-hours", help="Maximum number of hours to run for.", type=float, default=-1.0)
    parser.add_argument("--unet-num-lvls", help="Number of levels in the U-Net", type=int, default=5)
    parser.add_argument("--unet-init-feats-exp", help="Number of initial features used in the U-Net, two raised to this power.", type=int, default=4)
    parser.add_argument("--unet-batch-norm", help="Use Batch Normalization in U-Net", action="store_true")
    parser.add_argument("--unet-padding", help="Add padding to preserve image sizes for U-Net", action="store_true")
    parser.add_argument("--unet-no-max-pool", help="Learn downsampling weights instead of max-pooling", action="store_true")
    parser.add_argument("--unet-block-depth", help="Depth of the blocks of convolutions at each level", type=int, default=2)
    parser.add_argument("--data-aug", help="Randomly augment the data", action="store_true")
    parser.add_argument("--use-lands", help="Learn landmark heatmaps", action="store_true")
    parser.add_argument("--heat-coeff", help="Weighting applied to heatmap loss - dice gets one minus this.", type=float, default=0.5)
    parser.add_argument("--dice-valid", help="Use only dice validation loss even when training with dice + heatmap loss", action="store_true")
    parser.add_argument("--unet-no-res", help="Do not use residual connections in U-Net blocks", action="store_true")
    parser.add_argument("--train-valid-split", help="Ratio of training data kept for training; one minus this is validation. Enabled when in [0,1]; overrides valid-pats.", type=float, default=-1.0)
    parser.add_argument("--stream-data", help="Keep the dataset in host memory and double-buffer batches to the device (for archives too large for HBM, e.g. full-res); default keeps the dataset device-resident", action="store_true")
    parser.add_argument("--bf16", help="Use bfloat16 compute on TPU (float32 params)", action="store_true")
    parser.add_argument("--seed", help="PRNG seed", type=int, default=0)
    parser.add_argument("--profile-dir", help="Write a jax.profiler trace (TensorBoard-loadable) to this directory", type=str, default="")
    parser.add_argument("--debug-nans", help="Fault on the first NaN-producing op (jax_debug_nans)", action="store_true")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    from deepfluoro_tpu.utils.platform import enable_compilation_cache, select_platform

    select_platform(no_gpu=args.no_gpu)
    enable_compilation_cache()

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
        seed=args.seed,
        compute_dtype="bfloat16" if args.bf16 else "float32",
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
        )


if __name__ == "__main__":
    main()
