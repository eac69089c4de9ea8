"""Pallas TPU kernel: bilinear/nearest affine warp.

Why a custom kernel: the augmentation hot path is the affine warp
(profiled at ~60% of the whole device-side augmentation program), and XLA
lowers ``map_coordinates`` to elementwise gathers that the TPU executes
poorly. This kernel reformulates the warp in vector-unit-friendly terms:

  * the image (mirror-pre-padded by the wrapper) lives wholly in VMEM
    (with a per-kernel vmem limit sized for the big geometries); the grid
    walks (row, column) tiles of the output, and for each tile the kernel
    dynamic-slices a static-height ROW BAND guaranteed to contain every
    input row the tile touches (band height derives from the augmentation
    parameter ranges — |rot| <= 5deg, shear <= 1deg, scale in [0.9, 1.1] —
    over the column-tile width, so the lerp temporaries stay O(w_pad *
    tile_w) at any geometry);
  * horizontal interpolation is a ONE-HOT MATMUL on the MXU (band @ W_h,
    where W_h carries the two-tap lerp weights) — lane-gathers in Mosaic
    cannot span multiple 128-lane vregs, but the systolic array computes
    the same thing at full throughput;
  * vertical interpolation is a masked reduction over the band rows
    (compare-select against the per-pixel target row, VPU-friendly).

The kernel is numerically exact bilinear (same half-pixel PIL convention as
ops.image.affine_warp); a pure-XLA fallback keeps every platform working.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile of output rows per grid step; band height covers the tile's entire
# preimage: TILE * max|m11| + max|m10| * TILE_W + filter support + slack.
_TILE = 8

# Tile of output COLUMNS per grid step. The kernel's internal temporaries
# (the one-hot lerp weights and the column iota) have shape
# (w_pad, tile_w): without column tiling they scale with the FULL output
# width and blow the ~16 MB scoped-VMEM stack at big geometries (measured:
# 30.5 MB scoped at the full-res 1436->1440 training warp, w_pad 1948 —
# remote-compile OOM). 256 lanes = 2 vregs keeps them a few hundred KB at
# every production geometry while the row band shrinks too (its height is
# driven by the x-extent the tile spans).
_TILE_W = 256


def _band_height(tile_w: int) -> int:
    # max |dy/dx| over the augmentation ranges: sin(5deg)*1.1 + tan(1deg) ~ 0.113;
    # +8 because the band start is rounded down to a sublane multiple
    band = int(np.ceil(_TILE * 1.12 + 0.115 * tile_w + 4)) + 8
    return int(np.ceil(band / 8.0) * 8)  # sublane-aligned


def _warp_kernel(order: int, band: int, out_hw: tuple[int, int], mat_ref, img_ref, out_ref):
    h_pad = img_ref.shape[0]
    out_w = out_ref.shape[1]  # = tile_w
    oh_real, ow_real = out_hw

    m00 = mat_ref[0, 0]
    m01 = mat_ref[0, 1]
    m02 = mat_ref[0, 2]
    m10 = mat_ref[0, 3]
    m11 = mat_ref[0, 4]
    m12 = mat_ref[0, 5]

    y0 = pl.program_id(0) * _TILE
    x0 = pl.program_id(1) * out_w

    # Mosaic's iota is integer-only; cast afterwards. Grid-padding garbage
    # coordinates (rows past oh_real, columns past ow_real — their outputs
    # are sliced away by the caller) are CLAMPED to the last real
    # row/column: the apron and band guarantees are derived from the real
    # output extent, and unclamped garbage coordinates would reach beyond
    # them (shifting the band start or sampling clamped border pixels).
    xs = jax.lax.broadcasted_iota(jnp.int32, (_TILE, out_w), 1).astype(jnp.float32) + (
        x0.astype(jnp.float32) + 0.5
    )
    xs = jnp.minimum(xs, ow_real - 0.5)
    ys = jax.lax.broadcasted_iota(jnp.int32, (_TILE, out_w), 0).astype(jnp.float32) + (
        y0.astype(jnp.float32) + 0.5
    )
    ys = jnp.minimum(ys, oh_real - 0.5)

    in_x = m00 * xs + m01 * ys + m02 - 0.5
    in_y = m10 * xs + m11 * ys + m12 - 0.5

    # band start: min input row the tile can touch, clamped into the image
    # and rounded down to a sublane multiple (Mosaic requires provable
    # 8-alignment for dynamic sublane slices)
    start_f = jnp.floor(jnp.min(in_y)) - 1.0
    start = jnp.clip(start_f.astype(jnp.int32), 0, h_pad - band)
    start = pl.multiple_of((start // 8) * 8, 8)
    band_rows = img_ref[pl.ds(start, band), :]  # (band, W_pad)

    w_pad = img_ref.shape[1]

    if order == 1:
        ix = jnp.floor(in_x)
        ax = in_x - ix
        iy = jnp.floor(in_y)
        by = in_y - iy
        ix = ix.astype(jnp.int32)
        iy = iy.astype(jnp.int32)
    else:
        # PIL NEAREST: floor of the matrix-mapped center coordinate, i.e.
        # round(in + 0.5 - 0.5) == floor(in + 0.5)
        ix = jnp.floor(in_x + 0.5).astype(jnp.int32)
        iy = jnp.floor(in_y + 0.5).astype(jnp.int32)

    ix = jnp.clip(ix, 0, w_pad - 2)
    rel = jnp.clip(iy - start, 0, band - 2)  # (TILE, out_w)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (band, out_w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (w_pad, out_w), 0)

    # Horizontal interpolation as a one-hot matmul on the MXU: Mosaic's
    # lane-gather cannot span multiple 128-lane vregs, but
    # band @ W_h with W_h[c, x] = (1-a_x)[c==i_x] + a_x[c==i_x+1] computes
    # the same two-tap lerp for every band row in one systolic pass.
    for t in range(_TILE):
        cols = ix[t][None, :]  # (1, out_w)
        if order == 1:
            w_h = jnp.where(col_ids == cols, (1.0 - ax[t])[None, :], 0.0) + jnp.where(
                col_ids == cols + 1, ax[t][None, :], 0.0
            )
        else:
            w_h = jnp.where(col_ids == cols, 1.0, 0.0)
        # HIGHEST precision: the default TPU matmul truncates f32 operands to
        # bf16, which breaks exactness of the one-hot weights
        gh = jnp.dot(
            band_rows,
            w_h,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (band, out_w)

        # vertical two-tap lerp as a masked reduction over the band rows
        if order == 1:
            r = rel[t][None, :]
            wv = jnp.where(row_ids == r, (1.0 - by[t])[None, :], 0.0) + jnp.where(
                row_ids == r + 1, by[t][None, :], 0.0
            )
        else:
            wv = jnp.where(row_ids == rel[t][None, :], 1.0, 0.0)
        out_ref[t, :] = jnp.sum(wv * gh, axis=0)


def pallas_warp_supported() -> bool:
    import jax

    return jax.default_backend() in ("tpu", "axon")


def _default_apron(out_dim: int) -> int:
    """Mirror apron sized for the worst legal augmentation draw: |translate|
    <= 20 plus the radial stretch of (scale 0.9, rot 5deg, shear 1deg) from
    the frame center (~0.28 * dim/2 combined; verified -72.7px at dim 384).
    Rounded up to a sublane multiple. Heuristic FLOOR only — the binding
    constraint is _required_apron, which is exact for the actual call
    geometry (this heuristic under-sizes when the input is smaller than the
    output frame, e.g. 180-pixel frames padded to 192: measured 0.6-2.9 px
    envelope violations at extreme legal draws)."""
    apron = int(np.ceil(24 + 0.16 * out_dim))
    return int(np.ceil(apron / 8.0) * 8)


# The documented augmentation parameter box (data/augment.py draws inside
# it): the correctness contract of the UNGUARDED hot path.
_AUG_ROT_DEG = 5.0
_AUG_SHEAR_DEG = 1.0
_AUG_SCALE = (0.9, 1.1)
_AUG_TRANS_PX = 20.0


def _aug_box_reach(in_hw, out_hw, out_offset_xy):
    """Static worst-case preimage bounds of the augmentation parameter box
    over the output corners, in UNPADDED input coords. Pure numpy (mirrors
    ops.image.inverse_affine_matrix's torchvision formula) so the apron can
    be derived at trace time with zero device dispatches. Returns
    (min_x, max_x, min_y, max_y)."""
    ih, iw = in_hw
    oh, ow = out_hw
    offx, offy = out_offset_xy
    cx, cy = iw * 0.5, ih * 0.5  # augment.py's image-warp center

    rot = np.deg2rad(np.linspace(-_AUG_ROT_DEG, _AUG_ROT_DEG, 41))[:, None, None]
    sx = np.deg2rad(np.array([-_AUG_SHEAR_DEG, 0.0, _AUG_SHEAR_DEG]))[None, :, None]
    sy = np.deg2rad(np.array([-_AUG_SHEAR_DEG, 0.0, _AUG_SHEAR_DEG]))[None, None, :]

    a = np.cos(rot - sy) / np.cos(sy)
    b = -np.cos(rot - sy) * np.tan(sx) / np.cos(sy) - np.sin(rot)
    c = np.sin(rot - sy) / np.cos(sy)
    d = -np.sin(rot - sy) * np.tan(sx) / np.cos(sy) + np.cos(rot)

    mins = np.array([np.inf, np.inf])
    maxs = np.array([-np.inf, -np.inf])
    for scale in _AUG_SCALE:
        m00, m01 = d / scale, -b / scale
        m10, m11 = -c / scale, a / scale
        for tx in (-_AUG_TRANS_PX, _AUG_TRANS_PX):
            for ty in (-_AUG_TRANS_PX, _AUG_TRANS_PX):
                m02 = m00 * (-cx - tx) + m01 * (-cy - ty) + cx
                m12 = m10 * (-cx - tx) + m11 * (-cy - ty) + cy
                for gx in (0.5 + offx, ow - 0.5 + offx):
                    for gy in (0.5 + offy, oh - 0.5 + offy):
                        in_x = m00 * gx + m01 * gy + m02 - 0.5
                        in_y = m10 * gx + m11 * gy + m12 - 0.5
                        mins = np.minimum(mins, [in_x.min(), in_y.min()])
                        maxs = np.maximum(maxs, [in_x.max(), in_y.max()])
    return mins[0], maxs[0], mins[1], maxs[1]


def _required_apron(in_hw, out_hw, out_offset_xy, band: int) -> int:
    """Exact mirror-apron (sublane multiple) guaranteeing the UNGUARDED
    kernel's envelope for every draw inside the augmentation box at this
    call geometry: covers the top/left clamp (min preimage >= 0 after the
    pad shift), the right clip (ix <= w_pad - 2), and the bottom clamp
    INCLUDING the band start's sublane round-down (deepest reachable row is
    ((h_pad - band)//8)*8 + band - 2). +1 px absorbs the rot-grid sampling
    of the reach bounds."""
    min_x, max_x, min_y, max_y = _aug_box_reach(in_hw, out_hw, out_offset_xy)
    ih, iw = in_hw
    p = max(0.0, 1.0 - min_x, 1.0 - min_y, (max_x + 1.0) - (iw - 2.0))
    p_int = int(np.ceil(p / 8.0) * 8)
    while True:  # the round-down loss depends on the pad itself: iterate
        h_pad = ih + 2 * p_int
        deepest = ((h_pad - band) // 8) * 8 + band - 2
        if max_y + 1.0 + p_int <= deepest:
            return p_int
        p_int += 8


def _envelope_ok(mat, band: int, tile_w: int, out_hw, h_pad: int, w_pad: int):
    """Traced predicate: does the folded matrix stay inside the kernel's
    correctness envelope?  Exactness needs (a) every tile's input-row span to
    fit the static band (incl. the floor(-1) start, the <=7px sublane
    round-down, and the 2-tap filter) and (b) the whole preimage to stay
    inside the mirror-padded frame (the kernel clamps, which would silently
    repeat border pixels).  Affine extremes live at the output corners
    (grid-padding garbage coordinates are clamped to the real extent inside
    the kernel, so the REAL corners are the extremes)."""
    oh, ow = out_hw
    m00, m01, m02 = mat[0, 0], mat[0, 1], mat[0, 2]
    m10, m11, m12 = mat[0, 3], mat[0, 4], mat[0, 5]
    cx = jnp.array([0.5, ow - 0.5], jnp.float32)
    cy = jnp.array([0.5, oh - 0.5], jnp.float32)
    xg, yg = jnp.meshgrid(cx, cy)
    in_x = m00 * xg + m01 * yg + m02 - 0.5
    in_y = m10 * xg + m11 * yg + m12 - 0.5
    span = jnp.abs(m10) * (tile_w - 1) + jnp.abs(m11) * (_TILE - 1)
    # Bottom bound: after the clamp to h_pad-band the start is ALSO rounded
    # down to a sublane multiple, so the deepest accessible row is
    # ((h_pad-band)//8)*8 + band - 1, not h_pad - 1 — when (h_pad-band)%8 != 0
    # the naive h_pad-2 bound admits matrices whose bottom taps the kernel
    # would silently clamp (border-row repeats).
    max_row = ((h_pad - band) // 8) * 8 + band - 2
    return (
        (span + 11.0 <= band)
        & (jnp.min(in_x) >= 0.0)
        & (jnp.max(in_x) <= w_pad - 2.0)
        & (jnp.min(in_y) >= 0.0)
        & (jnp.max(in_y) <= float(max_row))
    )


@partial(
    jax.jit,
    static_argnames=(
        "order",
        "out_shape",
        # static: every call site passes python numbers, and the apron
        # derivation (_required_apron) needs concrete offsets at trace time
        "out_offset_xy",
        "pad",
        "guarded",
        "interpret",
    ),
)
def affine_warp_pallas(
    img: jnp.ndarray,
    inv_matrix: jnp.ndarray,
    order: int = 1,
    out_shape: tuple[int, int] | None = None,
    out_offset_xy: tuple[float, float] = (0.0, 0.0),
    pad: int | None = None,
    guarded: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Mirror-boundary affine warp of an (H, W) image via the Pallas kernel.

    Semantics match ``ops.image.affine_warp(..., mode='mirror')``. With
    ``guarded=True`` (default) the envelope is checked at runtime against the
    actual matrix and the call falls back to the exact XLA warp when the
    kernel's static band/apron cannot represent it — so results are exact for
    ANY affine. Callers whose parameter ranges are statically inside the
    envelope (the augmentation pipeline: |rot|<=5deg, shear<=1deg,
    scale<=1.1, |translate|<=20px) pass ``guarded=False``: under ``vmap`` a
    ``lax.cond`` batches into a select that executes BOTH branches, which
    would forfeit the kernel's speedup on the hot path.

    ``interpret=True`` runs the kernel through the Pallas interpreter
    (CPU-testable)."""
    h, w = img.shape
    oh, ow = (h, w) if out_shape is None else out_shape
    tile_w = ow if ow <= _TILE_W else _TILE_W
    if pad is None:
        # exact for the augmentation parameter box at THIS geometry (the
        # heuristic under-sizes when the input is smaller than the output
        # frame); the heuristic stays as a floor for guarded callers whose
        # matrices range wider than the box
        pad = max(
            _default_apron(max(oh, ow)),
            _required_apron((h, w), (oh, ow), out_offset_xy, _band_height(tile_w)),
        )

    # mirror-pad once so the kernel needs no boundary logic
    img_pad = jnp.pad(img, ((pad, pad), (pad, pad)), mode="reflect")

    # fold the output offset and the pad translation into the matrix:
    # in_pad = M @ (out + off) + pad_vec
    ox, oy = out_offset_xy
    shift = inv_matrix[:, 0] * ox + inv_matrix[:, 1] * oy
    mat = jnp.array(
        [
            [
                inv_matrix[0, 0],
                inv_matrix[0, 1],
                inv_matrix[0, 2] + shift[0] + pad,
                inv_matrix[1, 0],
                inv_matrix[1, 1],
                inv_matrix[1, 2] + shift[1] + pad,
                0.0,
                0.0,
            ]
        ],
        jnp.float32,
    )

    band = _band_height(tile_w)
    oh_tiles = -(-oh // _TILE)
    oh_padded = oh_tiles * _TILE
    ow_tiles = -(-ow // tile_w)
    ow_padded = ow_tiles * tile_w

    def run_kernel():
        # Mosaic's default ~16 MB scoped-VMEM limit rejects the whole-image
        # operand at big geometries (the pipeline double-buffers it across
        # the vmap/batch grid dim: measured 30.5 MB at the full-res
        # 1436->1440 training warp, w_pad 1948 — remote-compile OOM).
        # Moving the image to memory_space=ANY + per-tile band DMAs is not
        # an option (Mosaic only lowers trivially-indexed ANY blocks, which
        # vmap's added batch index breaks), so raise the per-kernel limit to
        # what the operand pipeline + the column-tile temporaries need.
        # v5e has 128 MB of VMEM; the largest production geometry needs
        # ~40 MB, and the limit is a CAP, not a reservation.
        hp_t = -(-img_pad.shape[0] // 8) * 8
        wp_t = -(-img_pad.shape[1] // 128) * 128
        vmem_limit = max(
            32 * 1024 * 1024,
            2 * hp_t * wp_t * 4 + 4 * wp_t * tile_w * 4 + 8 * 1024 * 1024,
        )
        out = pl.pallas_call(
            partial(_warp_kernel, order, band, (oh, ow)),
            grid=(oh_tiles, ow_tiles),
            out_shape=jax.ShapeDtypeStruct((oh_padded, ow_padded), jnp.float32),
            in_specs=[
                pl.BlockSpec((1, 8), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (_TILE, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(vmem_limit, 100 * 1024 * 1024)
            ),
            interpret=interpret,
        )(mat, img_pad.astype(jnp.float32))
        return out[:oh, :ow]

    if not guarded:
        return run_kernel()

    def run_fallback():
        from deepfluoro_tpu.ops.image import affine_warp

        return affine_warp(
            img.astype(jnp.float32),
            inv_matrix,
            order=order,
            out_shape=(oh, ow),
            out_offset_xy=out_offset_xy,
            mode="mirror",
        )

    ok = _envelope_ok(mat, band, tile_w, (oh, ow), img_pad.shape[0], img_pad.shape[1])
    return jax.lax.cond(ok, run_kernel, run_fallback)
