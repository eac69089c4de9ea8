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


def warp_interpret(img, m, order, out_shape, out_offset_xy, pad=64):
    """The production kernel body run through the Pallas interpreter."""
    h, w = img.shape
    oh, ow = out_shape
    img_pad = jnp.pad(img, ((pad, pad), (pad, pad)), mode="reflect")
    ox, oy = out_offset_xy
    shift = m[:, 0] * ox + m[:, 1] * oy
    mat = jnp.array(
        [[m[0, 0], m[0, 1], m[0, 2] + shift[0] + pad,
          m[1, 0], m[1, 1], m[1, 2] + shift[1] + pad, 0.0, 0.0]],
        jnp.float32,
    )
    band = W._band_height(ow)
    oh_tiles = -(-oh // W._TILE)
    out = pl.pallas_call(
        partial(W._warp_kernel, order, band),
        grid=(oh_tiles,),
        out_shape=jax.ShapeDtypeStruct((oh_tiles * W._TILE, ow), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W._TILE, ow), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=True,
    )(mat, img_pad.astype(jnp.float32))
    return out[:oh]


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


def test_band_height_covers_ranges():
    # the static band must cover the worst-case preimage span of a tile for
    # the documented augmentation ranges
    for ow in (96, 192, 384):
        band = W._band_height(ow)
        worst = W._TILE * 1.12 + 0.115 * ow + 2
        assert band >= worst
        assert band % 8 == 0
