"""Tests for center_crop / padding math / z-norm / affine warp, including
parity of the inverse-affine matrix against torchvision's implementation
(the reference transforms landmarks with TF._get_inverse_affine_matrix,
dataset.py:233-238)."""

import numpy as np
import jax.numpy as jnp
import pytest

from deepfluoro_tpu.ops.image import (
    affine_warp,
    calc_pad_amount,
    center_crop,
    forward_affine_matrix,
    inverse_affine_matrix,
    reflect_pad_to,
    transform_landmarks,
    znorm,
)


class TestPadMath:
    def test_even(self):
        assert calc_pad_amount(192, 180) == 6

    def test_odd(self):
        # ceil for odd deltas (dataset.py:33-38)
        assert calc_pad_amount(192, 181) == 6
        assert calc_pad_amount(192, 179) == 7

    def test_requires_growth(self):
        with pytest.raises(AssertionError):
            calc_pad_amount(100, 100)


class TestCenterCrop:
    def test_rank4_nhwc(self, rng):
        x = rng.random((2, 10, 12, 3)).astype(np.float32)
        out = center_crop(jnp.asarray(x), (6, 8))
        assert out.shape == (2, 6, 8, 3)
        np.testing.assert_array_equal(np.asarray(out), x[:, 2:8, 2:10, :])

    def test_rank2(self, rng):
        x = rng.random((9, 9)).astype(np.float32)
        out = center_crop(jnp.asarray(x), (4, 4))
        # floor((9-4)/2) = 2 start (util.py:100-104)
        np.testing.assert_array_equal(np.asarray(out), x[2:6, 2:6])

    def test_noop(self, rng):
        x = jnp.asarray(rng.random((3, 5, 5, 1)).astype(np.float32))
        assert center_crop(x, (5, 5)) is x

    def test_matches_reference_torch(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.random((2, 3, 11, 13)).astype(np.float32)  # NCHW for torch
        dst = (6, 7)
        src_nr, src_nc = 11, 13
        sr = int((src_nr - dst[0]) / 2)
        sc = int((src_nc - dst[1]) / 2)
        want = x[:, :, sr : sr + dst[0], sc : sc + dst[1]]
        got = center_crop(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), dst)
        np.testing.assert_array_equal(np.transpose(np.asarray(got), (0, 3, 1, 2)), want)


class TestReflectPad:
    def test_grow_to_dim(self, rng):
        x = rng.random((1, 8, 8, 1)).astype(np.float32)
        out = reflect_pad_to(jnp.asarray(x), 12)
        assert out.shape == (1, 12, 12, 1)
        want = np.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), "reflect")
        np.testing.assert_array_equal(np.asarray(out), want)

    def test_odd_overshoot(self, rng):
        # pad = ceil((12-7)/2) = 3 -> output 13, one larger than requested;
        # this matches the reference's calc_pad_amount + np.pad behavior.
        x = rng.random((1, 7, 7, 1)).astype(np.float32)
        out = reflect_pad_to(jnp.asarray(x), 12)
        assert out.shape == (1, 13, 13, 1)


class TestNorms:
    def test_znorm(self, rng):
        # torch.std() semantics: Bessel N-1 correction (reference
        # dataset.py:293) — pinned by tests/test_reference_golden.py too
        x = rng.random((16, 16)).astype(np.float32) * 50 + 3
        out = np.asarray(znorm(jnp.asarray(x)))
        assert abs(out.mean()) < 1e-4
        assert out.std(ddof=1) == pytest.approx(1.0, abs=1e-4)

class TestAffine:
    @staticmethod
    def _tv_inverse_affine_matrix(center, angle, translate, scale, shear):
        """NumPy oracle transcribing torchvision's public
        ``_get_inverse_affine_matrix`` convention, which the reference uses to
        transform landmarks (dataset.py:233-238)."""
        import math

        rot = math.radians(angle)
        sx, sy = [math.radians(s) for s in shear]
        cx, cy = center
        tx, ty = translate
        a = math.cos(rot - sy) / math.cos(sy)
        b = -math.cos(rot - sy) * math.tan(sx) / math.cos(sy) - math.sin(rot)
        c = math.sin(rot - sy) / math.cos(sy)
        d = -math.sin(rot - sy) * math.tan(sx) / math.cos(sy) + math.cos(rot)
        matrix = [d, -b, 0.0, -c, a, 0.0]
        matrix = [x / scale for x in matrix]
        matrix[2] += matrix[0] * (-cx - tx) + matrix[1] * (-cy - ty)
        matrix[5] += matrix[3] * (-cx - tx) + matrix[4] * (-cy - ty)
        matrix[2] += cx
        matrix[5] += cy
        return matrix

    def test_inverse_matrix_matches_torchvision_convention(self):
        for (angle, tr, sc, sh) in [
            (5.0, (3.0, -2.0), 1.05, (1.0, -0.5)),
            (-4.2, (0.0, 0.0), 0.9, (0.0, 0.0)),
            (0.0, (10.0, 5.0), 1.0, (0.7, 0.3)),
        ]:
            center = (45.5, 45.5)
            want = self._tv_inverse_affine_matrix(center, angle, tr, sc, sh)
            got = np.asarray(
                inverse_affine_matrix(center, angle, tr, sc, sh)
            ).reshape(-1)
            np.testing.assert_allclose(got, np.array(want), atol=1e-5)

    def test_identity_warp(self, rng):
        img = rng.random((16, 16)).astype(np.float32)
        m = inverse_affine_matrix((8.0, 8.0), 0.0, (0.0, 0.0), 1.0, (0.0, 0.0))
        out = np.asarray(affine_warp(jnp.asarray(img), m))
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_pure_translation_warp(self, rng):
        img = np.zeros((16, 16), np.float32)
        img[4, 6] = 1.0
        # translate by (+2, +3): output pixel (8, 7) should light up
        m = inverse_affine_matrix((8.0, 8.0), 0.0, (2.0, 3.0), 1.0, (0.0, 0.0))
        out = np.asarray(affine_warp(jnp.asarray(img), m))
        assert out[7, 8] == pytest.approx(1.0, abs=1e-4)

    def test_forward_matrix_roundtrip(self):
        m = inverse_affine_matrix((10.0, 10.0), 7.0, (2.0, -1.0), 1.1, (0.5, -0.2))
        f = forward_affine_matrix(m)
        pt = jnp.array([3.0, 4.0, 1.0])
        back = jnp.array(
            [
                m[0, 0] * (f[0, 0] * pt[0] + f[0, 1] * pt[1] + f[0, 2])
                + m[0, 1] * (f[1, 0] * pt[0] + f[1, 1] * pt[1] + f[1, 2])
                + m[0, 2],
                m[1, 0] * (f[0, 0] * pt[0] + f[0, 1] * pt[1] + f[0, 2])
                + m[1, 1] * (f[1, 0] * pt[0] + f[1, 1] * pt[1] + f[1, 2])
                + m[1, 2],
            ]
        )
        np.testing.assert_allclose(np.asarray(back), [3.0, 4.0], atol=1e-4)

    def test_landmark_transform_and_oob(self):
        m = inverse_affine_matrix((8.0, 8.0), 0.0, (2.0, 0.0), 1.0, (0.0, 0.0))
        lands = jnp.array([[4.0, 15.5, np.inf], [4.0, 8.0, np.inf]])
        out = np.asarray(transform_landmarks(lands, m, (16, 16)))
        # first landmark: translated +2 in x
        np.testing.assert_allclose(out[:, 0], [6.0, 4.0], atol=1e-4)
        # second: pushed past the right edge (15.5+2 > 15) -> inf
        assert np.isinf(out[:, 1]).all()
        # third: already inf -> stays inf
        assert np.isinf(out[:, 2]).all()

    def test_warp_matches_pil_affine(self, rng):
        """End-to-end parity of the device-side warp against PIL's AFFINE
        transform, which is what the reference ultimately calls through
        TF.affine (dataset.py:193-198)."""
        PIL = pytest.importorskip("PIL")
        from PIL import Image

        img = (rng.random((32, 32)).astype(np.float32) * 0.8 + 0.1)
        angle, tr, sc, sh = 4.0, (2.0, -3.0), 1.05, (0.8, -0.4)

        center = (32 * 0.5, 32 * 0.5)
        m = np.asarray(inverse_affine_matrix(center, angle, tr, sc, sh))

        pil_img = Image.fromarray(img, mode="F")
        pil_out = np.asarray(
            pil_img.transform(
                (32, 32), Image.AFFINE, tuple(m.reshape(-1)), resample=Image.BILINEAR
            )
        )

        got = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(m)))

        # interior pixels should agree closely (borders differ in fill handling)
        inner = (slice(4, 28), slice(4, 28))
        np.testing.assert_allclose(got[inner], pil_out[inner], atol=2e-2)
