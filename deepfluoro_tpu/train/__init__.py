from deepfluoro_tpu.train.config import TrainConfig, build_model
from deepfluoro_tpu.train.schedules import ReduceLROnPlateau, WarmRestartLR
from deepfluoro_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from deepfluoro_tpu.train.sharded_checkpoint import (
    load_sharded_checkpoint,
    save_sharded_checkpoint,
)
from deepfluoro_tpu.train.step import TrainState, make_eval_step, make_train_step, make_train_state
from deepfluoro_tpu.train.loop import fit

__all__ = [
    "TrainConfig",
    "build_model",
    "WarmRestartLR",
    "ReduceLROnPlateau",
    "save_checkpoint",
    "load_checkpoint",
    "save_sharded_checkpoint",
    "load_sharded_checkpoint",
    "TrainState",
    "make_train_state",
    "make_train_step",
    "make_eval_step",
    "fit",
]
