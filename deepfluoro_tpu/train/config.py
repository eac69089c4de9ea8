"""Training configuration: a single dataclass that is (a) the CLI surface,
(b) the architecture spec, and (c) the checkpoint metadata payload.

The reference stores every hyperparameter inside its checkpoints and makes
the checkpoint authoritative over CLI flags on resume (train.py:191-273,
474-515). ``TrainConfig.to_checkpoint_meta``/``from_checkpoint_meta`` use the
reference's exact key names so the resume contract — and the ability of
test_ensemble to rebuild a network purely from a checkpoint
(test_ensemble.py:61-98) — carries over.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from deepfluoro_tpu.models import UNet


@dataclasses.dataclass
class TrainConfig:
    num_classes: int = 7
    batch_size: int = 1
    proj_unet_dim: int = 364  # --unet-img-dim; reflect-pad target
    optim_type: str = "sgd"
    init_lr: float = 1.0e-2
    nesterov: bool = False
    momentum: float = 0.9
    wgt_decay: float = 0.0
    lr_sched_meth: str = "cos"  # 'cos' | 'plateau' | 'none'
    lr_patience: int = 20
    lr_cooldown: int = 20
    lrs_num_epochs: int = 10  # --cos-anneal-epochs
    lrs_growth_factor: int = 2  # --cos-growth
    max_num_restarts: int = -1
    save_after_n_restarts: int = 0
    save_restart_net_prefix: str | None = None
    max_num_epochs: int = 200
    max_hours: float = -1.0
    depth: int = 5  # --unet-num-lvls
    init_feats_exp: int = 4  # --unet-init-feats-exp (wf)
    batch_norm: bool = False
    padding: bool = False
    no_max_pool: bool = False
    block_depth: int = 2
    use_res: bool = True
    data_aug: bool = False
    num_lands: int = 0
    heat_coeff: float = 0.5
    use_dice_valid: bool = False
    train_valid_split: float = -1.0
    checkpoint_freq: int = 1
    save_best_valid: bool = True
    # best-valid / pre-restart snapshots store only meta + params + BN stats
    # (what inference and test_ensemble's rebuild need), not optimizer /
    # scheduler state — halves their write size; the periodic checkpoint
    # keeps full state for resume
    light_best_nets: bool = False
    seed: int = 0
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16' (TPU fast path)
    # per-block activation rematerialization (see models/unet.py::UNet.remat):
    # fits large-resolution frames / bigger batches in HBM at ~1 extra
    # forward of FLOPs; results equal up to float reassociation
    remat: bool = False
    # append a left/right-mirrored copy of every TRAINING sample (corrected
    # dup_data_w_left_right_flip — data/hdf5.py::lr_flip_duplicate); mirrors
    # join after the train/valid split so no validation frame's mirror
    # trains (the metric would leak)
    dup_lr_flip: bool = False

    # checkpoint key names follow train.py:475-513 for drop-in familiarity
    _META_KEYS = {
        "num-classes": "num_classes",
        "optim-type": "optim_type",
        "depth": "depth",
        "init-feats-exp": "init_feats_exp",
        "batch-norm": "batch_norm",
        "padding": "padding",
        "no-max-pool": "no_max_pool",
        "pad-img-size": "proj_unet_dim",
        "batch-size": "batch_size",
        "data-aug": "data_aug",
        "opt-nesterov": "nesterov",
        "opt-momentum": "momentum",
        "opt-wgt-decay": "wgt_decay",
        "num-lands": "num_lands",
        "heat-coeff": "heat_coeff",
        "use-dice-valid": "use_dice_valid",
        "unet-use-res": "use_res",
        "unet-block-depth": "block_depth",
        "lrs-meth": "lr_sched_meth",
        "lrs-num-epochs": "lrs_num_epochs",
        "lrs-growth-factor": "lrs_growth_factor",
        "lrs-max-num-restarts": "max_num_restarts",
        "lrs-save-restart-net-prefix": "save_restart_net_prefix",
        "lrs-save-after-n-restarts": "save_after_n_restarts",
        "lrs-patience": "lr_patience",
        "lrs-cooldown": "lr_cooldown",
        "checkpoint-freq": "checkpoint_freq",
        "save-best-valid": "save_best_valid",
        "light-best-nets": "light_best_nets",
        "init-lr": "init_lr",
        "compute-dtype": "compute_dtype",
        "remat": "remat",
        "dup-lr-flip": "dup_lr_flip",
    }

    def to_checkpoint_meta(self) -> dict:
        return {k: getattr(self, attr) for k, attr in self._META_KEYS.items()}

    @classmethod
    def from_checkpoint_meta(cls, meta: dict, base: "TrainConfig | None" = None) -> "TrainConfig":
        """Checkpoint overrides everything it stores (train.py:191-273);
        fields absent from the checkpoint keep ``base``'s values."""
        cfg = dataclasses.replace(base) if base is not None else cls()
        for k, attr in cls._META_KEYS.items():
            if k in meta:
                setattr(cfg, attr, meta[k])
        return cfg

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


def build_model(cfg: TrainConfig) -> UNet:
    """Construct the UNet exactly as train.py:313 does from flags."""
    return UNet(
        n_classes=cfg.num_classes,
        depth=cfg.depth,
        wf=cfg.init_feats_exp,
        padding=cfg.padding,
        batch_norm=cfg.batch_norm,
        max_pool=not cfg.no_max_pool,
        num_lands=cfg.num_lands,
        do_res=cfg.use_res,
        block_depth=cfg.block_depth,
        dtype=cfg.dtype,
        remat=cfg.remat,
    )
