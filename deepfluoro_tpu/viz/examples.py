"""Dataset-exploration overlay tools (reference examples_dataset/
make_preproc_overlays.py and make_full_res_overlays.py): per-specimen tiled
PNGs of all projections with GT segmentation alpha-blend and landmark dots.
"""

from __future__ import annotations

import numpy as np
import h5py as h5
from PIL import Image, ImageDraw, ImageFont

from deepfluoro_tpu.viz.overlays import blend_seg, normalized_proj_rgb


def tile_images(imgs: np.ndarray, nrow: int = 8, padding: int = 2) -> np.ndarray:
    """Grid-tile (N, H, W, 3) float images like torchvision's save_image
    default layout (8 per row, 2px padding)."""
    n, h, w, c = imgs.shape
    ncol = min(nrow, n)
    nr = -(-n // ncol)
    grid = np.zeros((nr * (h + padding) + padding, ncol * (w + padding) + padding, c), imgs.dtype)
    for i in range(n):
        r, cidx = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = cidx * (w + padding) + padding
        grid[y : y + h, x : x + w] = imgs[i]
    return grid


def _save_grid(imgs: list[np.ndarray], out_path: str) -> None:
    grid = tile_images(np.stack(imgs))
    Image.fromarray((np.clip(grid, 0, 1) * 255).astype(np.uint8), "RGB").save(out_path)


def make_preproc_overlays(h5_path: str, out_dir: str = ".") -> list[str]:
    """Per specimen: tile every projection with GT seg blend + GT landmark
    dots; skip the land-names group; box radius scales with resolution
    (make_preproc_overlays.py:38-139)."""
    import os

    written = []
    with h5.File(h5_path, "r") as f:
        box_radius = None
        for spec_idx_str in f:
            spec_g = f[spec_idx_str]
            if "projs" not in spec_g:
                continue
            projs = spec_g["projs"][:]
            # archives converted from sources without GT annotations carry
            # projs only (data/preprocess.py writes segs/lands when present)
            segs = spec_g["segs"][:] if "segs" in spec_g else None
            lands = spec_g["lands"][:] if "lands" in spec_g else None
            n, h, w = projs.shape
            if box_radius is None:
                box_radius = max(16 * (h / 1536.0), 3.0)

            overlays = []
            for i in range(n):
                img = normalized_proj_rgb(projs[i])
                if segs is not None:
                    img = blend_seg(img, segs[i])
                pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8), "RGB")
                draw = ImageDraw.Draw(pil)
                for li in range(lands.shape[2] if lands is not None else 0):
                    x, y = lands[i, 0, li], lands[i, 1, li]
                    if 0 <= x < w and 0 <= y < h:
                        draw.ellipse(
                            [(x - box_radius, y - box_radius), (x + box_radius, y + box_radius)],
                            fill="yellow",
                        )
                del draw
                overlays.append(np.asarray(pil, np.float32) / 255.0)

            out_path = os.path.join(out_dir, "{}.png".format(spec_idx_str))
            _save_grid(overlays, out_path)
            written.append(out_path)
    return written


def make_full_res_overlays(h5_path: str, out_dir: str = ".", overlay_ds_factor: float = 0.125) -> list[str]:
    """Full-res archive version: reads proj-params, applies the
    rot-180-for-up flip to image/seg/landmarks, annotates femur-FOV validity
    text, tiles at 8x downsample (make_full_res_overlays.py:28-202)."""
    import os

    written = []
    with h5.File(h5_path, "r") as f:
        pp = f["proj-params"]
        num_cols = int(pp["num-cols"][()])
        num_rows = int(pp["num-rows"][()])
        ds_cols = int(round(num_cols * overlay_ds_factor))
        ds_rows = int(round(num_rows * overlay_ds_factor))

        try:
            font = ImageFont.truetype("Arial.ttf", 48)
        except Exception:
            font = None

        for spec_id in f:
            if spec_id == "proj-params":
                continue
            projs_g = f["{}/projections".format(spec_id)]
            overlays = []
            for pk in sorted(projs_g.keys()):
                pg = projs_g[pk]
                proj = np.asarray(pg["image/pixels"][:], np.float32)
                seg = np.asarray(pg["gt-seg/pixels"][:])

                lands = []
                fhl_idx = fhr_idx = None
                for name in pg["gt-landmarks"]:
                    pt = np.asarray(pg["gt-landmarks"][name][:], np.float64).reshape(-1)[:2]
                    if 0 <= pt[0] < num_cols and 0 <= pt[1] < num_rows:
                        if name == "FH-l":
                            fhl_idx = len(lands)
                        elif name == "FH-r":
                            fhr_idx = len(lands)
                        lands.append(pt.copy())

                if bool(np.asarray(pg["rot-180-for-up"][()])):
                    proj = proj[::-1, ::-1]
                    seg = seg[::-1, ::-1]
                    for pt in lands:
                        pt[0] = num_cols - 1 - pt[0]
                        pt[1] = num_rows - 1 - pt[1]

                l_ok = bool(np.asarray(pg["gt-poses/left-femur-good-fov"][()]))
                r_ok = bool(np.asarray(pg["gt-poses/right-femur-good-fov"][()]))

                img = blend_seg(normalized_proj_rgb(proj), seg)
                pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8), "RGB")
                draw = ImageDraw.Draw(pil)
                for pt in lands:
                    draw.ellipse([(pt[0] - 16, pt[1] - 16), (pt[0] + 16, pt[1] + 16)], fill="yellow")
                if l_ok:
                    xy = tuple(lands[fhl_idx]) if fhl_idx is not None else (0, 0)
                    draw.text(xy, "L. Femur FOV OK", font=font)
                if r_ok:
                    xy = tuple(lands[fhr_idx]) if fhr_idx is not None else (0, 0)
                    draw.text(xy, "R. Femur FOV OK", font=font)
                del draw

                pil = pil.resize((ds_cols, ds_rows), Image.BILINEAR)
                overlays.append(np.asarray(pil, np.float32) / 255.0)

            out_path = os.path.join(out_dir, "{}.png".format(spec_id))
            _save_grid(overlays, out_path)
            written.append(out_path)
    return written
