"""Pure-functional numeric kernels. Everything here is jittable and shape-static."""

from deepfluoro_tpu.ops.image import (
    calc_pad_amount,
    center_crop,
    reflect_pad_to,
    znorm,
)
from deepfluoro_tpu.ops.losses import (
    dice_and_heatmap_loss,
    ncc_2d,
    soft_dice_loss,
)
from deepfluoro_tpu.ops.heatmap import (
    gaussian_heatmap,
    synthesize_heatmaps,
)

__all__ = [
    "calc_pad_amount",
    "center_crop",
    "reflect_pad_to",
    "znorm",
    "soft_dice_loss",
    "dice_and_heatmap_loss",
    "ncc_2d",
    "gaussian_heatmap",
    "synthesize_heatmaps",
]
