"""Overlay rendering: estimated segmentation / landmark / heatmap overlays.

Mirrors the reference CLIs' visual contracts:
- overlay_est_ann.py:99-161 — alpha=0.35 seg blend with the 7-color table,
  GT landmarks as yellow ellipses (box radius 2), estimated landmarks as
  yellow crosshairs (radius 6);
- overlay_est_heat.py:71-86 — min-max normalized heatmap blended green
  (guarding tiny dynamic range with the 1e-3 check).

Visualization is a host-side path (PIL); the arrays arrive as numpy.
"""

from __future__ import annotations

import math

import numpy as np
from PIL import Image, ImageDraw

# class 1..7 colors (overlay_est_ann.py:108-114)
LABEL_COLORS = [
    (0.0, 1.0, 0.0),  # pelvis green
    (1.0, 0.0, 0.0),  # left femur red
    (0.0, 0.0, 1.0),  # right femur blue
    (1.0, 1.0, 0.0),  # yellow
    (0.0, 1.0, 1.0),  # cyan
    (1.0, 0.5, 0.0),  # orange
    (0.5, 0.0, 0.5),  # purple
]


def normalized_proj_rgb(proj: np.ndarray) -> np.ndarray:
    """(H, W) projection -> (H, W, 3) float RGB in [0, 1]
    (overlay_est_ann.py:88-97)."""
    lo, hi = proj.min(), proj.max()
    g = (proj - lo) / (hi - lo)
    return np.stack([g, g, g], axis=-1)


def blend_seg(img_rgb: np.ndarray, seg: np.ndarray, num_classes: int = 7, alpha: float = 0.35) -> np.ndarray:
    """Alpha-blend per-class colors over the image (overlay_est_ann.py:106-124)."""
    out = img_rgb.copy()
    for l in range(1, num_classes):
        m = seg == l
        color = LABEL_COLORS[l - 1]
        for c in range(3):
            out[..., c][m] = (1 - alpha) * out[..., c][m] + alpha * color[c]
    return out


def blend_heat(img_rgb: np.ndarray, heat: np.ndarray, color=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Blend one min-max-normalized heatmap channel (overlay_est_heat.py:71-84)."""
    h = heat - heat.min()
    rng = heat.max() - heat.min()
    if rng > 1.0e-3:
        h = h / rng
    out = img_rgb.copy()
    for c in range(3):
        out[..., c] = (1 - h) * out[..., c] + h * color[c]
    return out


def _to_pil(img_rgb: np.ndarray) -> Image.Image:
    return Image.fromarray((np.clip(img_rgb, 0, 1) * 255).astype(np.uint8), "RGB")


def draw_gt_land(draw: ImageDraw.ImageDraw, xy, box_radius: int = 2, fill: str = "yellow"):
    x, y = xy
    draw.ellipse(
        [(x - box_radius, y - box_radius), (x + box_radius, y + box_radius)], fill=fill
    )


def draw_est_land(draw: ImageDraw.ImageDraw, xy, r: int = 6, color: str = "yellow"):
    x, y = xy
    draw.line([(x, y + r), (x, y - r)], fill=color)
    draw.line([(x - r, y), (x + r, y)], fill=color)


def make_overlay_est_ann(
    proj: np.ndarray,
    est_seg: np.ndarray | None,
    gt_lands: np.ndarray | None,
    est_lands: dict[int, tuple[float, float]] | None,
    out_path: str,
    num_classes: int = 7,
) -> None:
    """Full annotation overlay (overlay_est_ann.py:86-161).

    gt_lands: (2, L) with inf for out-of-view; est_lands: {land_idx: (x, y)}.
    """
    img = normalized_proj_rgb(proj)
    if est_seg is not None:
        img = blend_seg(img, est_seg, num_classes)
    pil = _to_pil(img)
    if gt_lands is not None or est_lands:
        draw = ImageDraw.Draw(pil)
        if gt_lands is not None:
            for l in range(gt_lands.shape[-1]):
                x, y = gt_lands[0, l], gt_lands[1, l]
                if math.isfinite(x) and math.isfinite(y):
                    draw_gt_land(draw, (x, y))
        if est_lands:
            for _, xy in est_lands.items():
                draw_est_land(draw, xy)
        del draw
    pil.save(out_path)


def make_overlay_est_heat(
    proj: np.ndarray,
    est_heat: np.ndarray,
    out_path: str,
) -> None:
    """Heatmap overlay (overlay_est_heat.py:53-86)."""
    img = normalized_proj_rgb(proj)
    img = blend_heat(img, est_heat)
    _to_pil(img).save(out_path)


def read_est_lands_csv(csv_path: str, pat_ind: int, proj: int) -> dict[int, tuple[int, int]]:
    """Parse the landmark CSV back into {land_idx: (col, row)} for one
    projection, skipping not-found rows (overlay_est_ann.py:69-84)."""
    est_lands = {}
    lines = open(csv_path).readlines()[1:]
    for line in lines:
        toks = line.strip().split(",")
        if int(toks[0]) == pat_ind and int(toks[1]) == proj:
            land_row, land_col = int(toks[3]), int(toks[4])
            if land_row >= 0 and land_col >= 0:
                idx = int(toks[2])
                assert idx not in est_lands
                est_lands[idx] = (land_col, land_row)
    return est_lands
