from deepfluoro_tpu.data.hdf5 import (
    FluoroData,
    get_land_names_from_dataset,
    get_num_lands_from_dataset,
    get_orig_img_shape,
    load_dataset,
    split_train_valid,
)
from deepfluoro_tpu.data.augment import AugmentConfig, prepare_batch
from deepfluoro_tpu.data.pipeline import BatchIterator

__all__ = [
    "FluoroData",
    "get_land_names_from_dataset",
    "get_num_lands_from_dataset",
    "get_orig_img_shape",
    "load_dataset",
    "split_train_valid",
    "AugmentConfig",
    "prepare_batch",
    "BatchIterator",
]
