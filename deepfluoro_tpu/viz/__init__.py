from deepfluoro_tpu.viz.overlays import (
    LABEL_COLORS,
    blend_heat,
    blend_seg,
    make_overlay_est_ann,
    make_overlay_est_heat,
    normalized_proj_rgb,
)

__all__ = [
    "LABEL_COLORS",
    "normalized_proj_rgb",
    "blend_seg",
    "blend_heat",
    "make_overlay_est_ann",
    "make_overlay_est_heat",
]
