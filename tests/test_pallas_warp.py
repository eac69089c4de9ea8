"""Correctness of the Pallas affine-warp kernel (interpret mode on CPU; the
compiled path is exercised on real TPU hardware by bench/profiling runs)."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import deepfluoro_tpu.ops.pallas.warp as W
from deepfluoro_tpu.ops.image import affine_warp, inverse_affine_matrix


def warp_interpret(img, m, order, out_shape, out_offset_xy, pad=64, guarded=False):
    """The production wrapper run through the Pallas interpreter."""
    return W.affine_warp_pallas(
        img, m, order=order, out_shape=out_shape, out_offset_xy=out_offset_xy,
        pad=pad, guarded=guarded, interpret=True,
    )


@pytest.mark.parametrize(
    "angle,trans,scale,shear",
    [
        (4.7, (12.0, -9.0), 1.08, (0.9, -0.6)),
        (-5.0, (0.0, 20.0), 0.9, (0.0, 0.0)),
        (0.0, (-14.0, 14.0), 1.1, (-1.0, 1.0)),
    ],
)
def test_bilinear_matches_xla(rng, angle, trans, scale, shear):
    img = jnp.asarray(rng.random((90, 90)), jnp.float32)
    m = inverse_affine_matrix((45.0, 45.0), angle, trans, scale, shear)
    want = np.asarray(
        affine_warp(img, m, order=1, out_shape=(96, 96), out_offset_xy=(-3, -3), mode="mirror")
    )
    got = np.asarray(warp_interpret(img, m, 1, (96, 96), (-3, -3)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_nearest_matches_xla(rng):
    img = jnp.asarray(rng.integers(0, 7, (90, 90)).astype(np.float32))
    m = inverse_affine_matrix((45.0, 45.0), 3.0, (8.0, -5.0), 1.05, (0.5, -0.5))
    want = np.asarray(affine_warp(img, m, order=0, mode="mirror"))
    got = np.asarray(warp_interpret(img, m, 0, (90, 90), (0.0, 0.0)))
    # .5-tie rounding may differ on a handful of pixels
    assert (got != want).mean() < 0.001


def test_identity(rng):
    img = jnp.asarray(rng.random((64, 64)), jnp.float32)
    m = inverse_affine_matrix((32.0, 32.0), 0.0, (0.0, 0.0), 1.0, (0.0, 0.0))
    got = np.asarray(warp_interpret(img, m, 1, (64, 64), (0.0, 0.0)))
    np.testing.assert_allclose(got, np.asarray(img), atol=1e-5)


class TestEnvelopeGuard:
    def test_in_envelope_guarded_matches_unguarded(self, rng):
        img = jnp.asarray(rng.random((90, 90)), jnp.float32)
        m = inverse_affine_matrix((45.0, 45.0), 4.0, (10.0, -10.0), 1.05, (0.5, 0.5))
        unguarded = np.asarray(warp_interpret(img, m, 1, (90, 90), (0.0, 0.0)))
        guarded = np.asarray(warp_interpret(img, m, 1, (90, 90), (0.0, 0.0), guarded=True))
        np.testing.assert_array_equal(guarded, unguarded)

    @pytest.mark.parametrize(
        "angle,trans,scale",
        [
            (40.0, (0.0, 0.0), 1.0),   # rotation far beyond the band's 5deg
            (0.0, (80.0, 0.0), 1.0),   # translation beyond the mirror apron
            (0.0, (0.0, 0.0), 0.4),    # zoom-out pulls preimage past the apron
        ],
    )
    def test_out_of_envelope_falls_back_exact(self, rng, angle, trans, scale):
        """An adversarial matrix outside the kernel envelope must return the
        EXACT mirror-warp result via the XLA fallback, not clamped pixels.
        Reference computed under jit: eager float contraction (FMA) differs
        from compiled and can flip floor() at pixel-boundary coordinates."""
        img = jnp.asarray(rng.random((90, 90)), jnp.float32)
        m = inverse_affine_matrix((45.0, 45.0), angle, trans, scale, (0.0, 0.0))
        want = np.asarray(
            jax.jit(partial(affine_warp, order=1, mode="mirror"))(img, m)
        )
        got = np.asarray(warp_interpret(img, m, 1, (90, 90), (0.0, 0.0), guarded=True))
        np.testing.assert_allclose(got, want, atol=1e-6)
        # sanity: the unguarded kernel genuinely corrupts this case (otherwise
        # the adversarial matrix isn't adversarial and the test proves nothing)
        raw = np.asarray(warp_interpret(img, m, 1, (90, 90), (0.0, 0.0)))
        assert not np.allclose(raw, want, atol=1e-3)

    def test_bottom_clamp_sublane_rounddown(self, rng):
        """Regression: when (h_pad - band) is not a multiple of 8, the band
        start's sublane round-down after the bottom clamp loses up to 7 rows
        of reach, so a translation whose preimage ends within those rows
        passed the old envelope check but sampled clamped (repeated) band
        rows. The guard must route such matrices to the exact XLA fallback."""
        img = jnp.asarray(rng.random((180, 180)), jnp.float32)
        # pure +y translation: preimage bottom = 243 + ty with pad=64
        # (h_pad=308, band=48, (308-48)%8=4 -> deepest reachable row 303,
        # old bound admitted up to 306)
        m = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 62.0]], jnp.float32)
        want = np.asarray(
            jax.jit(partial(affine_warp, order=1, mode="mirror"))(img, m)
        )
        got = np.asarray(warp_interpret(img, m, 1, (180, 180), (0.0, 0.0), guarded=True))
        np.testing.assert_allclose(got, want, atol=1e-6)
        # sanity: the unguarded kernel genuinely corrupts this case
        raw = np.asarray(warp_interpret(img, m, 1, (180, 180), (0.0, 0.0)))
        assert not np.allclose(raw, want, atol=1e-3)


def test_band_height_covers_ranges():
    # the static band must cover the worst-case preimage span of a tile for
    # the documented augmentation ranges
    for ow in (96, 192, 384):
        band = W._band_height(ow)
        worst = W._TILE * 1.12 + 0.115 * ow + 2
        assert band >= worst
        assert band % 8 == 0


def test_unguarded_aug_envelope_covers_bottom_rounddown():
    """The augmentation pipeline runs the kernel UNGUARDED (guarded=True's
    lax.cond executes both branches under vmap), so the static apron/band
    must cover the worst legal augmentation draw INCLUDING the sublane
    round-down after the bottom clamp (deepest reachable input row is
    ((h_pad-band)//8)*8 + band - 2, not h_pad - 2). Brute-forces the
    parameter extremes at every production dim."""
    for dim in (96, 128, 180, 192, 256, 364, 384):
        pad = W._default_apron(dim)
        band = W._band_height(dim)
        h_pad = dim + 2 * pad
        deepest_ok = ((h_pad - band) // 8) * 8 + band - 2
        worst = -1e9
        for ang in np.linspace(-5, 5, 9):
            for sh in np.linspace(-1, 1, 5):
                for sc in (0.9, 1.0, 1.1):
                    for t in (-20.0, 0.0, 20.0):
                        m = np.asarray(inverse_affine_matrix(
                            (dim / 2.0, dim / 2.0), float(ang), (t, t),
                            float(sc), (float(sh), float(sh))))
                        for ox in (0.5, dim - 0.5):
                            for oy in (0.5, dim - 0.5):
                                worst = max(
                                    worst,
                                    m[1, 0] * ox + m[1, 1] * oy + m[1, 2] + pad - 0.5,
                                )
        assert worst <= deepest_ok, (dim, worst, deepest_ok)
