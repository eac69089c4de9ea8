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


@pytest.mark.parametrize(
    "orig,out_dim",
    [
        (360, 360),   # 2 column tiles, 104 clamped garbage columns
        (300, 320),   # padded-up output frame AND partial final column tile
    ],
)
def test_column_tiled_geometry_matches_xla(rng, orig, out_dim):
    """Geometries wider than _TILE_W run the column-tiled grid (added when
    the full-res 1436->1440 training warp blew the 16 MB scoped-VMEM stack:
    the one-hot lerp temporaries scaled with the FULL output width). The
    clamped garbage coordinates of the grid-padding columns must not shift
    the band start or the apron reach for the real columns."""
    from deepfluoro_tpu.ops.image import calc_pad_amount

    assert out_dim > W._TILE_W and out_dim % W._TILE_W != 0
    extra = calc_pad_amount(out_dim, orig) if out_dim > orig else 0
    img = jnp.asarray(rng.random((orig, orig)), jnp.float32)
    # extreme-but-legal augmentation draw (the unguarded production contract)
    m = inverse_affine_matrix(
        (orig / 2.0, orig / 2.0), -5.0, (-20.0, 20.0), 0.9, (-1.0, 1.0)
    )
    want = np.asarray(jax.jit(partial(
        affine_warp, order=1, mode="mirror",
        out_shape=(out_dim, out_dim), out_offset_xy=(-extra, -extra),
    ))(img, m))
    got = np.asarray(W.affine_warp_pallas(
        img, m, order=1, out_shape=(out_dim, out_dim),
        out_offset_xy=(-extra, -extra), guarded=False, interpret=True,
    ))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_band_height_covers_ranges():
    # the static band must cover the worst-case preimage span of a tile for
    # the documented augmentation ranges
    for ow in (96, 192, 384):
        band = W._band_height(ow)
        worst = W._TILE * 1.12 + 0.115 * ow + 2
        assert band >= worst
        assert band % 8 == 0


def test_unguarded_aug_envelope_covers_production_geometries():
    """The augmentation pipeline runs the kernel UNGUARDED (guarded=True's
    lax.cond executes both branches under vmap), so the apron/band chosen
    for the ACTUAL call geometry — input frames REFLECT-PADDED UP to
    proj_unet_dim via out_shape/out_offset, which shrinks the padded input
    relative to the output reach — must cover the worst legal draw
    INCLUDING the sublane round-down after the bottom clamp (deepest
    reachable row is ((h_pad-band)//8)*8 + band - 2). Regression: the
    heuristic out-dim-only apron violated this at 90->96 through 180->192
    (the real-archive 8x geometry) by 0.6-2.9 px."""
    from deepfluoro_tpu.ops.image import calc_pad_amount

    for orig, out_dim in (
        (90, 96), (92, 96), (94, 96), (96, 96), (128, 128),
        (180, 192), (192, 192), (360, 364), (364, 364), (718, 736),
    ):
        extra = calc_pad_amount(out_dim, orig) if out_dim > orig else 0
        # both production calls: the image warp (padded-up output frame,
        # negative offsets) and the seg warp (same-size output)
        for ow, off in ((orig + 2 * extra, -extra), (orig, 0)):
            band = W._band_height(min(ow, W._TILE_W))
            pad = max(
                W._default_apron(ow),
                W._required_apron((orig, orig), (ow, ow), (off, off), band),
            )
            h_pad = orig + 2 * pad
            deepest_ok = ((h_pad - band) // 8) * 8 + band - 2
            worst, worst_lo = -1e9, 1e9
            for ang in np.linspace(-5, 5, 11):
                for shx in (-1.0, 1.0):
                    for shy in (-1.0, 1.0):
                        for sc in (0.9, 1.1):
                            for tx in (-20.0, 20.0):
                                for ty in (-20.0, 20.0):
                                    m = np.asarray(inverse_affine_matrix(
                                        (orig / 2.0, orig / 2.0), float(ang),
                                        (tx, ty), float(sc), (shx, shy)))
                                    for cx in (0.5, ow - 0.5):
                                        for cy in (0.5, ow - 0.5):
                                            gx, gy = cx + off, cy + off
                                            iny = (m[1, 0] * gx + m[1, 1] * gy
                                                   + m[1, 2] + pad - 0.5)
                                            worst = max(worst, iny)
                                            worst_lo = min(worst_lo, iny)
            assert worst <= deepest_ok, (orig, out_dim, worst, deepest_ok)
            assert worst_lo >= 0.0, (orig, out_dim, worst_lo)


def test_unguarded_extreme_draw_matches_xla_when_input_padded_up(rng):
    """Numeric regression for inputs smaller than the output frame (the
    production shape whenever orig < proj_unet_dim): at 92^2 frames padded
    to 96, an extreme-but-legal augmentation draw (rot -5deg, shear (-1,1),
    scale 0.9, translate (-20,-20)) reaches past the OLD out-dim-only
    apron's reachable band, silently repeating border rows in the UNGUARDED
    kernel. With the geometry-exact apron the unguarded output must equal
    the XLA mirror warp — and the old apron (pad=40) must demonstrably
    corrupt this case, or the regression proves nothing."""
    orig, out_dim = 92, 96
    from deepfluoro_tpu.ops.image import calc_pad_amount

    extra = calc_pad_amount(out_dim, orig)
    img = jnp.asarray(rng.random((orig, orig)), jnp.float32)
    m = inverse_affine_matrix(
        (orig / 2.0, orig / 2.0), -5.0, (-20.0, -20.0), 0.9, (-1.0, 1.0)
    )
    want = np.asarray(jax.jit(partial(
        affine_warp, order=1, mode="mirror",
        out_shape=(out_dim, out_dim), out_offset_xy=(-extra, -extra),
    ))(img, m))
    got = np.asarray(W.affine_warp_pallas(
        img, m, order=1, out_shape=(out_dim, out_dim),
        out_offset_xy=(-extra, -extra), guarded=False, interpret=True,
    ))
    np.testing.assert_allclose(got, want, atol=1e-4)
    # sanity: the pre-fix apron (heuristic from out_dim alone) corrupts
    old = np.asarray(W.affine_warp_pallas(
        img, m, order=1, out_shape=(out_dim, out_dim),
        out_offset_xy=(-extra, -extra), pad=W._default_apron(out_dim),
        guarded=False, interpret=True,
    ))
    assert not np.allclose(old, want, atol=1e-3)
