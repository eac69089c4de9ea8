from deepfluoro_tpu.infer.ensemble import (
    load_net_from_checkpoint,
    seg_dataset,
    seg_dataset_ensemble,
    stack_variables,
    test_dataset_ensemble,
)
from deepfluoro_tpu.infer.fullres import seg_fullres_dataset

__all__ = [
    "load_net_from_checkpoint",
    "stack_variables",
    "seg_dataset",
    "seg_dataset_ensemble",
    "seg_fullres_dataset",
    "test_dataset_ensemble",
]
