from deepfluoro_tpu.parallel.mesh import make_mesh
from deepfluoro_tpu.parallel.sharding import (
    make_sharded_ensemble_forward,
    make_sharded_train_step,
    make_tp_train_step,
    shard_batch,
    tp_state_shardings,
)

__all__ = [
    "make_mesh",
    "make_sharded_train_step",
    "make_sharded_ensemble_forward",
    "make_tp_train_step",
    "tp_state_shardings",
    "shard_batch",
]
