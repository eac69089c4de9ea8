"""Tests for Gaussian heatmap synthesis (reference dataset.py:296-326,
util.py:38-51)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from deepfluoro_tpu.ops import gaussian_heatmap, synthesize_heatmaps


class TestGaussianHeatmap:
    def test_peak_value_and_location(self):
        sigma = 2.5
        h = np.asarray(gaussian_heatmap(25, 25, sigma))
        # peak at center (12, 12) with value 1/(2 pi sigma^2)
        assert h[12, 12] == pytest.approx(1.0 / (2 * math.pi * sigma * sigma), rel=1e-5)
        assert np.unravel_index(h.argmax(), h.shape) == (12, 12)

    def test_custom_peak(self):
        h = np.asarray(gaussian_heatmap(20, 30, 2.0, peak_row=5.0, peak_col=17.0))
        assert np.unravel_index(h.argmax(), h.shape) == (5, 17)

    def test_matches_torch_reference(self):
        torch = pytest.importorskip("torch")
        sigma = 2.5
        (Y, X) = torch.meshgrid(torch.arange(0, 25), torch.arange(0, 25), indexing="ij")
        Y, X = Y.float(), X.float()
        want = (
            torch.exp(((X - 12).pow(2) + (Y - 12).pow(2)) / (sigma * sigma * -2))
            / (2 * math.pi * sigma * sigma)
        ).numpy()
        got = np.asarray(gaussian_heatmap(25, 25, sigma))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestSynthesizeHeatmaps:
    def test_shapes_and_peaks(self):
        lands = jnp.array([[10.0, 3.0], [7.0, 14.0]])  # x row then y row; L=2
        h = np.asarray(synthesize_heatmaps(lands, 16, 20, sigma=2.5))
        assert h.shape == (16, 20, 2)
        assert np.unravel_index(h[..., 0].argmax(), (16, 20)) == (7, 10)
        assert np.unravel_index(h[..., 1].argmax(), (16, 20)) == (14, 3)

    def test_inf_landmark_zero_channel(self):
        lands = jnp.array([[10.0, np.inf], [7.0, np.inf]])
        h = np.asarray(synthesize_heatmaps(lands, 16, 16))
        assert np.all(h[..., 1] == 0.0)
        assert h[..., 0].max() > 0
        assert np.isfinite(h).all()

    def test_subpixel_peak(self):
        lands = jnp.array([[5.5], [5.5]])
        h = np.asarray(synthesize_heatmaps(lands, 12, 12))
        # four neighbors of (5.5, 5.5) are equal maxima
        assert h[5, 5] == pytest.approx(h[6, 6], rel=1e-5)
        assert h[5, 6] == pytest.approx(h[6, 5], rel=1e-5)
