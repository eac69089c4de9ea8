"""Image-manipulation primitives: center crop, padding math, normalization,
and an affine bilinear warp used by the device-side augmentation pipeline.

All functions are shape-static and jittable. The framework's canonical layout
is NHWC; these primitives operate on the trailing-or-leading spatial axes as
documented per function.

Reference semantics: util.py:92-114 (center_crop), dataset.py:26-40
(calc_pad_amount), dataset.py:287-293 (reflect pad + z-norm).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def calc_pad_amount(padded_img_dim: int, cur_img_dim: int) -> int:
    """Per-border padding to grow ``cur_img_dim`` to ``padded_img_dim``.

    ceil((padded - cur)/2); asserts the target is strictly larger
    (reference dataset.py:26-40).
    """
    assert padded_img_dim > cur_img_dim
    return int(math.ceil((padded_img_dim - cur_img_dim) / 2.0))


def _crop_slices(src: int, dst: int) -> slice:
    start = int((src - dst) / 2)
    return slice(start, start + dst)


def center_crop(img: jnp.ndarray, dst_hw, spatial_axes: tuple[int, int] | None = None) -> jnp.ndarray:
    """Center-crop the spatial dims of ``img`` to ``dst_hw = (H, W)``.

    Default spatial axes: rank-4 NHWC -> (1, 2); rank-3 HWC -> (0, 1);
    rank-2 -> (0, 1). Start offset is floor((src-dst)/2), matching reference
    util.py:92-114 (which crops the trailing two dims of NCHW).
    """
    assert len(dst_hw) == 2, "pass an explicit (H, W) pair"
    dst_h, dst_w = int(dst_hw[0]), int(dst_hw[1])
    if spatial_axes is None:
        if img.ndim == 4:
            spatial_axes = (1, 2)
        elif img.ndim == 3:
            spatial_axes = (0, 1)
        else:
            assert img.ndim == 2
            spatial_axes = (0, 1)
    ah, aw = spatial_axes
    src_h, src_w = img.shape[ah], img.shape[aw]
    if (src_h, src_w) == (dst_h, dst_w):
        return img
    idx = [slice(None)] * img.ndim
    idx[ah] = _crop_slices(src_h, dst_h)
    idx[aw] = _crop_slices(src_w, dst_w)
    return img[tuple(idx)]


def reflect_pad_to(img: jnp.ndarray, padded_dim: int, spatial_axes: tuple[int, int] | None = None) -> jnp.ndarray:
    """Reflect-pad square spatial dims up to ``padded_dim`` per side rules of
    calc_pad_amount (reference dataset.py:287-290). The result's spatial dims
    are ``cur + 2*pad`` which may exceed ``padded_dim`` by one for odd deltas —
    identical to the reference behavior (callers center-crop the model output
    back, so the extra pixel is benign and keeps the math bit-compatible)."""
    if spatial_axes is None:
        spatial_axes = (1, 2) if img.ndim == 4 else (0, 1)
    ah, aw = spatial_axes
    cur = img.shape[ah]
    assert img.shape[ah] == img.shape[aw], "only square images supported (reference dataset.py:85)"
    if padded_dim <= cur:
        return img
    pad = calc_pad_amount(padded_dim, cur)
    pad_width = [(0, 0)] * img.ndim
    pad_width[ah] = (pad, pad)
    pad_width[aw] = (pad, pad)
    return jnp.pad(img, pad_width, mode="reflect")


def znorm(img: jnp.ndarray) -> jnp.ndarray:
    """Zero-mean/unit-std normalization over the whole array
    (reference dataset.py:292-293). torch.std() applies Bessel's N-1
    correction, so ddof=1 here — the golden parity suite
    (tests/test_reference_golden.py) caught the ddof=0 mismatch."""
    return (img - jnp.mean(img)) / jnp.std(img, ddof=1)


# ---------------------------------------------------------------------------
# Affine warp (device-side replacement for the reference's host PIL warps,
# dataset.py:150-225). Torchvision inverse-affine-matrix convention.
# ---------------------------------------------------------------------------


def inverse_affine_matrix(
    center_xy,
    angle_deg,
    translate_xy,
    scale,
    shear_xy_deg,
):
    """Inverse affine matrix mapping output (x, y) -> input (x, y).

    Matches torchvision's ``_get_inverse_affine_matrix`` (used by the
    reference at dataset.py:233-238 to transform landmarks analytically).
    All arguments may be python floats or traced scalars. Returns a (2, 3)
    array [[a, b, c], [d, e, f]] with in_x = a*x + b*y + c, in_y = d*x+e*y+f.
    """
    cx, cy = center_xy
    tx, ty = translate_xy
    rot = jnp.deg2rad(angle_deg)
    sx = jnp.deg2rad(shear_xy_deg[0])
    sy = jnp.deg2rad(shear_xy_deg[1])

    # Inverted rotation-shear-scale matrix (determinant 1 before scale).
    a = jnp.cos(rot - sy) / jnp.cos(sy)
    b = -jnp.cos(rot - sy) * jnp.tan(sx) / jnp.cos(sy) - jnp.sin(rot)
    c = jnp.sin(rot - sy) / jnp.cos(sy)
    d = -jnp.sin(rot - sy) * jnp.tan(sx) / jnp.cos(sy) + jnp.cos(rot)

    m00 = d / scale
    m01 = -b / scale
    m10 = -c / scale
    m11 = a / scale

    m02 = m00 * (-cx - tx) + m01 * (-cy - ty) + cx
    m12 = m10 * (-cx - tx) + m11 * (-cy - ty) + cy
    return jnp.stack(
        [jnp.stack([m00, m01, m02]), jnp.stack([m10, m11, m12])]
    )


def forward_affine_matrix(inv_matrix: jnp.ndarray) -> jnp.ndarray:
    """Invert a (2, 3) inverse-affine matrix to the forward (2, 3) matrix
    (reference dataset.py:238 computes A = inv(A_inv) for landmarks)."""
    m = jnp.concatenate([inv_matrix, jnp.array([[0.0, 0.0, 1.0]])], axis=0)
    return jnp.linalg.inv(m)[:2, :]


def affine_warp(
    img: jnp.ndarray,
    inv_matrix: jnp.ndarray,
    order: int = 1,
    out_shape: tuple[int, int] | None = None,
    out_offset_xy: tuple[float, float] = (0.0, 0.0),
    mode: str = "constant",
) -> jnp.ndarray:
    """Bilinear/nearest affine warp of an (H, W) or (H, W, C) image.

    For each output pixel (x, y) samples the input at
    ``inv_matrix @ [x+ox+0.5, y+oy+0.5, 1] - 0.5`` — PIL's Image.AFFINE
    half-pixel-center convention used by the reference (dataset.py:193-198;
    PIL Geometry.c applies the matrix to pixel centers then subtracts 0.5
    before interpolating).

    ``out_shape``/``out_offset_xy`` let the output grid extend beyond the
    input (e.g. warping straight into the reflect-padded training frame);
    ``mode='mirror'`` equals np.pad-'reflect' boundary handling, which makes
    a direct warp mathematically identical to the reference's
    reflect-pad -> warp -> center-crop chain (dataset.py:158-203) while
    sampling ~4x fewer pixels.
    """
    squeeze = False
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    h, w, c = img.shape
    oh, ow = (h, w) if out_shape is None else out_shape
    ox, oy = out_offset_xy
    ys = jnp.arange(oh, dtype=jnp.float32) + 0.5 + oy
    xs = jnp.arange(ow, dtype=jnp.float32) + 0.5 + ox
    xg, yg = jnp.meshgrid(xs, ys)  # (oh, ow) each; xg varies along W
    in_x = inv_matrix[0, 0] * xg + inv_matrix[0, 1] * yg + inv_matrix[0, 2] - 0.5
    in_y = inv_matrix[1, 0] * xg + inv_matrix[1, 1] * yg + inv_matrix[1, 2] - 0.5

    def warp_chan(chan):
        return jax.scipy.ndimage.map_coordinates(
            chan, [in_y, in_x], order=order, mode=mode, cval=0.0
        )

    out = jax.vmap(warp_chan, in_axes=2, out_axes=2)(img)
    if squeeze:
        out = out[..., 0]
    return out


def transform_landmarks(
    lands_xy: jnp.ndarray, inv_matrix: jnp.ndarray, bounds_hw: tuple[int, int]
) -> jnp.ndarray:
    """Apply the forward affine to (2, L) landmarks (x=col, y=row layout,
    hdf5_layouts/Readme.md:114-117); out-of-bounds or originally-inf landmarks
    become inf.

    The reference's post-warp bounds check (dataset.py:245-247) contains an
    axis-mixing typo (``xform_l[1] < (orig_s_shape[0]-1)`` — `<` instead of
    `>`) that marks nearly every augmented landmark as out-of-bounds, zeroing
    its heatmap. We deliberately implement the *correct* check and document the
    divergence; see README "reference quirks".
    """
    fwd = forward_affine_matrix(inv_matrix)
    x = lands_xy[0, :]
    y = lands_xy[1, :]
    finite = jnp.isfinite(x) & jnp.isfinite(y)
    # inf * 0 would give nan; evaluate transform on zeros where non-finite.
    xs = jnp.where(finite, x, 0.0)
    ys = jnp.where(finite, y, 0.0)
    new_x = fwd[0, 0] * xs + fwd[0, 1] * ys + fwd[0, 2]
    new_y = fwd[1, 0] * xs + fwd[1, 1] * ys + fwd[1, 2]
    h, w = bounds_hw
    in_bounds = (new_x >= 0) & (new_x <= (w - 1)) & (new_y >= 0) & (new_y <= (h - 1))
    keep = finite & in_bounds
    inf = jnp.float32(np.inf)
    return jnp.stack([jnp.where(keep, new_x, inf), jnp.where(keep, new_y, inf)])
