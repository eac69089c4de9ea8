"""Equivalence of the direct mirror-boundary warp against the reference's
reflect-pad -> warp -> center-crop chain (the chain is transcribed here as
the oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

from deepfluoro_tpu.ops.image import affine_warp, center_crop, inverse_affine_matrix


def reference_chain(img01, angle, trans, scale, shear, extra):
    """The padded chain exactly as the reference performs it
    (dataset.py:158-203), using the same warp primitive."""
    h, w = img01.shape
    pad1 = -(-h // 2) + extra
    pad2 = -(-w // 2) + extra
    p_pad = jnp.pad(jnp.asarray(img01), ((pad1, pad1), (pad2, pad2)), mode="reflect")
    hp, wp = p_pad.shape
    m = inverse_affine_matrix((wp * 0.5, hp * 0.5), angle, trans, scale, shear)
    out = affine_warp(p_pad, m, order=1)
    return np.asarray(center_crop(out, (h + 2 * extra, w + 2 * extra)))


def direct(img01, angle, trans, scale, shear, extra):
    h, w = img01.shape
    m = inverse_affine_matrix((w * 0.5, h * 0.5), angle, trans, scale, shear)
    return np.asarray(
        affine_warp(
            jnp.asarray(img01), m, order=1,
            out_shape=(h + 2 * extra, w + 2 * extra),
            out_offset_xy=(-extra, -extra),
            mode="mirror",
        )
    )


@pytest.mark.parametrize(
    "angle,trans,scale,shear",
    [
        (4.7, (12.0, -9.0), 1.08, (0.9, -0.6)),
        (-5.0, (0.0, 20.0), 0.9, (0.0, 0.0)),
        (0.0, (-14.0, 14.0), 1.1, (-1.0, 1.0)),
    ],
)
def test_direct_equals_padded_chain(rng, angle, trans, scale, shear):
    img = rng.random((90, 90)).astype(np.float32)
    extra = 3  # 16x-style extra pad
    want = reference_chain(img, angle, trans, scale, shear, extra)
    got = direct(img, angle, trans, scale, shear, extra)
    # differences are f32 rounding from the different (equivalent)
    # coordinate arithmetic, observed max ~1.4e-5
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_direct_equals_padded_chain_nearest(rng):
    img = rng.integers(0, 7, (90, 90)).astype(np.float32)
    h, w = img.shape
    angle, trans, scale, shear = 3.0, (8.0, -5.0), 1.05, (0.5, -0.5)

    pad1 = -(-h // 2)
    p_pad = jnp.pad(jnp.asarray(img), ((pad1, pad1), (pad1, pad1)), mode="reflect")
    hp = p_pad.shape[0]
    m_pad = inverse_affine_matrix((hp * 0.5, hp * 0.5), angle, trans, scale, shear)
    want = np.asarray(center_crop(affine_warp(p_pad, m_pad, order=0), (h, w)))

    m = inverse_affine_matrix((w * 0.5, h * 0.5), angle, trans, scale, shear)
    got = np.asarray(affine_warp(jnp.asarray(img), m, order=0, mode="mirror"))

    # nearest can differ on exact .5 ties at a handful of pixels
    assert (got != want).mean() < 0.001
