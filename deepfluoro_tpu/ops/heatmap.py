"""Gaussian landmark-heatmap synthesis as vectorized XLA ops.

The reference synthesizes ground-truth heatmaps per sample on the host inside
DataLoader workers (dataset.py:296-326) with a Python loop over landmarks.
Here the whole synthesis is a closed-form broadcastable expression over
(H, W, L) so it fuses into the jitted train step; non-finite (out-of-view)
landmarks yield all-zero heatmaps.

The pdf is the unnormalized-sum Gaussian exp(-(dx^2+dy^2)/(2 sigma^2)) /
(2 pi sigma^2), exactly matching dataset.py:323 (the comment at :324 notes it
is deliberately NOT re-normalized to sum to 1; NCC is scale-invariant).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def gaussian_heatmap(
    num_rows: int,
    num_cols: int,
    sigma: float,
    peak_row: float | None = None,
    peak_col: float | None = None,
) -> jnp.ndarray:
    """Single (H, W) Gaussian heatmap; default peak at the image center
    (reference util.py:38-51, used for the landmark-detection template)."""
    if peak_row is None:
        peak_row = num_rows // 2
    if peak_col is None:
        peak_col = num_cols // 2
    ys = jnp.arange(num_rows, dtype=jnp.float32)[:, None]
    xs = jnp.arange(num_cols, dtype=jnp.float32)[None, :]
    d2 = (xs - peak_col) ** 2 + (ys - peak_row) ** 2
    return jnp.exp(d2 / (sigma * sigma * -2.0)) / (2.0 * math.pi * sigma * sigma)


def synthesize_heatmaps(
    lands_xy: jnp.ndarray,
    num_rows: int,
    num_cols: int,
    sigma: float = 2.5,
) -> jnp.ndarray:
    """All-landmark heatmap synthesis.

    Args:
      lands_xy: (2, L) landmark coordinates, row 0 = x (column), row 1 = y
        (row), with inf marking out-of-view landmarks (dataset.py:317-325).
      num_rows/num_cols: spatial size (the segmentation resolution).
      sigma: Gaussian sigma in pixels (reference hardcodes 2.5 for all
        landmarks, dataset.py:306).

    Returns:
      (H, W, L) float32 heatmaps; channels for non-finite landmarks are zero.
    """
    mu_x = lands_xy[0, :]  # (L,)
    mu_y = lands_xy[1, :]
    finite = jnp.isfinite(mu_x) & jnp.isfinite(mu_y)  # (L,)
    # Avoid inf - inf = nan in the subtraction below.
    mu_x = jnp.where(finite, mu_x, 0.0)
    mu_y = jnp.where(finite, mu_y, 0.0)

    ys = jnp.arange(num_rows, dtype=jnp.float32)[:, None, None]  # (H, 1, 1)
    xs = jnp.arange(num_cols, dtype=jnp.float32)[None, :, None]  # (1, W, 1)
    d2 = (xs - mu_x[None, None, :]) ** 2 + (ys - mu_y[None, None, :]) ** 2
    pdf = jnp.exp(d2 / (sigma * sigma * -2.0)) / (2.0 * math.pi * sigma * sigma)
    return jnp.where(finite[None, None, :], pdf, 0.0)
