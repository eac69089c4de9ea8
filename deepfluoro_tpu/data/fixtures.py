"""Synthetic micro-dataset generator with the exact preprocessed-archive
schema (hdf5_layouts/Readme.md:95-117) for tests and smoke training.

Generates plausible structure: elliptical 'bone' blobs for seg classes 1..6,
landmarks placed on those blobs using the reference's landmark names (the
names drive the seg-class gating in landmark extraction,
est_lands_csv.py:56-73), and projections that are darker inside the blobs
plus smooth background — enough signal for a small U-Net to overfit in a few
epochs, which is what the smoke tests assert.
"""

from __future__ import annotations

import numpy as np
import h5py as h5

# 14 bilateral landmark names as in the real archives (README.md:45-54),
# ordered left/right interleaved like land-00..land-13.
DEFAULT_LAND_NAMES = [
    "FH-l", "FH-r",
    "GSN-l", "GSN-r",
    "IOF-l", "IOF-r",
    "MOF-l", "MOF-r",
    "SPS-l", "SPS-r",
    "IPS-l", "IPS-r",
    "ASIS-l", "ASIS-r",
]

# landmark name -> seg class whose blob it sits on: derive from the
# canonical detection-gating map so fixtures always exercise the same
# association the landmark decoder uses (est_lands_csv.py:56-73)
from deepfluoro_tpu.eval.landmarks import SEG_LABELS_TO_USE_FOR_LANDS as _LAND_TO_CLASS


def _ellipse_mask(h, w, cy, cx, ry, rx):
    ys = np.arange(h)[:, None]
    xs = np.arange(w)[None, :]
    return (((ys - cy) / ry) ** 2 + ((xs - cx) / rx) ** 2) <= 1.0


def make_specimen(
    rng: np.random.Generator,
    num_projs: int,
    img_dim: int,
    num_classes: int = 7,
    land_names=DEFAULT_LAND_NAMES,
):
    """Returns (projs (N,R,C) f4, segs (N,R,C) u1, lands (N,2,L) f4)."""
    h = w = img_dim
    n_l = len(land_names)
    projs = np.zeros((num_projs, h, w), np.float32)
    segs = np.zeros((num_projs, h, w), np.uint8)
    lands = np.zeros((num_projs, 2, n_l), np.float32)

    for n in range(num_projs):
        # smooth background
        bg = rng.random((h // 8 + 1, w // 8 + 1)).astype(np.float32)
        bg = np.kron(bg, np.ones((8, 8), np.float32))[:h, :w]
        img = 0.4 + 0.2 * bg

        # consistent anatomy-like layout: each class occupies a fixed sector
        # around the image center (with modest jitter) and has a distinct
        # intensity, so leave-one-specimen-out generalization is learnable —
        # mirroring how real bone structures keep consistent relative
        # positions and attenuation.
        class_centers = {}
        for c in range(1, num_classes):
            ang = 2 * np.pi * (c - 1) / max(1, num_classes - 1)
            cx = w / 2 + 0.26 * w * np.cos(ang) + rng.uniform(-0.04, 0.04) * w
            cy = h / 2 + 0.26 * h * np.sin(ang) + rng.uniform(-0.04, 0.04) * h
            ry = h * rng.uniform(0.10, 0.15)
            rx = w * rng.uniform(0.10, 0.15)
            m = _ellipse_mask(h, w, cy, cx, ry, rx)
            segs[n][m] = c
            # bone is bright (log-transformed convention), per-class contrast
            img[m] += 0.22 + 0.07 * c
            class_centers[c] = (cy, cx, ry, rx)

        img += rng.normal(0, 0.01, (h, w)).astype(np.float32)
        projs[n] = img

        for li, name in enumerate(land_names):
            c = _LAND_TO_CLASS.get(name, 1)
            if c in class_centers:
                cy, cx, ry, rx = class_centers[c]
                # DETERMINISTIC placement: a fixed per-landmark angle on the
                # mid-ellipse ring, so the location is a function of the
                # visible structure (like a real anatomical point) and a
                # trained net can localize it. A random angle here makes the
                # landmark unlearnable past the ring radius — at 180^2 that
                # is +/-13 px of irreducible spread, the predicted heatmaps
                # become annuli, and the rule-3 NCC>=0.9 gate correctly
                # rejects every detection.
                ang = 2 * np.pi * li / max(1, n_l)
                x = cx + 0.5 * rx * np.cos(ang)
                y = cy + 0.5 * ry * np.sin(ang)
            else:
                x, y = rng.uniform(0, w - 1), rng.uniform(0, h - 1)
            # occasionally produce an out-of-bounds landmark (the archives
            # have them; consumers must handle the inf marking)
            if rng.random() < 0.05:
                x = -20.0
            lands[n, 0, li] = x
            lands[n, 1, li] = y

    return projs, segs, lands


def _itk_image_group(g, pixels: np.ndarray, spacing):
    """ITK-style image group: dir-mat, origin, pixels, spacing
    (hdf5_layouts/Readme.md:20-28)."""
    nd = pixels.ndim
    g.create_dataset("pixels", data=pixels)
    g.create_dataset("dir-mat", data=np.eye(nd, dtype=np.float64))
    g.create_dataset("origin", data=np.zeros((nd,), np.float64))
    g.create_dataset("spacing", data=np.asarray(spacing, np.float64))


def write_synthetic_fullres_dataset(
    path: str,
    num_specimens: int = 1,
    num_projs: int = 3,
    img_dim: int = 148,  # > 2*50 border crop
    vol_dim: int = 16,
    land_names=DEFAULT_LAND_NAMES,
    seed: int = 0,
) -> str:
    """Synthetic full-resolution archive with the schema of
    hdf5_layouts/Readme.md:16-93 (proj-params, per-specimen vol / vol-seg /
    vol-landmarks / projections/NNN/{image, gt-seg, gt-landmarks, gt-poses,
    rot-180-for-up})."""
    rng = np.random.default_rng(seed)
    spec_names = ["17-1882", "18-1109", "18-0725", "18-2799", "18-2800", "17-1905"]
    # the JHU archive has exactly 6 cadavers; synthesize extra names beyond
    # them instead of IndexError-ing (the preprocessed fixture scales too)
    spec_names += ["99-{:04d}".format(s) for s in range(max(0, num_specimens - 6))]
    with h5.File(path, "w") as f:
        pp = f.create_group("proj-params")
        intrinsic = np.array(
            [[5000.0, 0.0, img_dim / 2], [0.0, 5000.0, img_dim / 2], [0.0, 0.0, 1.0]]
        )
        pp.create_dataset("intrinsic", data=intrinsic)
        pp.create_dataset("extrinsic", data=np.eye(4))
        pp["num-cols"] = img_dim
        pp["num-rows"] = img_dim
        pp["pixel-col-spacing"] = 0.194
        pp["pixel-row-spacing"] = 0.194

        for s in range(num_specimens):
            sg = f.create_group(spec_names[s])
            vol = rng.random((vol_dim, vol_dim, vol_dim)).astype(np.float32)
            _itk_image_group(sg.create_group("vol"), vol, [1.0, 1.0, 1.0])

            vseg = sg.create_group("vol-seg")
            vol_seg = rng.integers(0, 7, (vol_dim, vol_dim, vol_dim)).astype(np.uint8)
            _itk_image_group(vseg.create_group("image"), vol_seg, [1.0, 1.0, 1.0])
            labels_def = vseg.create_group("labels-def")
            for li, nm in enumerate(
                ["left-hemipelvis", "right-hemipelvis", "vertebrae",
                 "upper-sacrum", "left-femur", "right-femur"], start=1
            ):
                labels_def[str(li)] = nm

            vl = sg.create_group("vol-landmarks")
            for nm in land_names:
                vl.create_dataset(nm, data=rng.random(3) * vol_dim)

            projs_g = sg.create_group("projections")
            # raw intensities: bone is DARK pre-log
            core_projs, core_segs, core_lands = make_specimen(
                rng, num_projs, img_dim, 7, land_names
            )
            for n in range(num_projs):
                pg = projs_g.create_group("{:03d}".format(n))
                raw = np.exp(-core_projs[n]).astype(np.float32)
                _itk_image_group(pg.create_group("image"), raw, [0.194, 0.194])
                _itk_image_group(pg.create_group("gt-seg"), core_segs[n], [0.194, 0.194])
                gl = pg.create_group("gt-landmarks")
                for li, nm in enumerate(land_names):
                    gl.create_dataset(nm, data=core_lands[n, :, li].astype(np.float64))
                gp = pg.create_group("gt-poses")
                for k in ("cam-to-pelvis-vol", "cam-to-left-femur-vol", "cam-to-right-femur-vol"):
                    pose = np.eye(4)
                    pose[:3, 3] = rng.random(3) * 10
                    gp.create_dataset(k, data=pose)
                gp["left-femur-good-fov"] = int(rng.random() > 0.3)
                gp["right-femur-good-fov"] = int(rng.random() > 0.3)
                pg["rot-180-for-up"] = int(n % 2 == 0)
    return path


def write_synthetic_dataset(
    path: str,
    num_specimens: int = 2,
    num_projs: int = 6,
    img_dim: int = 48,
    num_classes: int = 7,
    land_names=DEFAULT_LAND_NAMES,
    seed: int = 0,
) -> str:
    """Write a preprocessed-schema HDF5 (specimens '01'..'0N')."""
    rng = np.random.default_rng(seed)
    with h5.File(path, "w") as f:
        g = f.create_group("land-names")
        g["num-lands"] = len(land_names)
        for li, name in enumerate(land_names):
            g["land-{:02d}".format(li)] = name
        for s in range(1, num_specimens + 1):
            projs, segs, lands = make_specimen(rng, num_projs, img_dim, num_classes, land_names)
            sg = f.create_group("{:02d}".format(s))
            sg.create_dataset("projs", data=projs)
            sg.create_dataset("segs", data=segs)
            sg.create_dataset("lands", data=lands)
    return path
