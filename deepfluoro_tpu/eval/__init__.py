from deepfluoro_tpu.eval.landmarks import (
    SEG_LABELS_TO_USE_FOR_LANDS,
    detect_landmarks,
)
from deepfluoro_tpu.eval.dice import hard_dice

__all__ = ["SEG_LABELS_TO_USE_FOR_LANDS", "detect_landmarks", "hard_dice"]
