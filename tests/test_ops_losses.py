"""Unit tests for soft Dice, NCC, and the joint loss, with closed-form oracles
and a torch-reference parity check (the reference implementation is PyTorch;
torch-CPU is available in the test environment, so we can verify numerics
directly against independently re-derived formulas)."""

import numpy as np
import jax.numpy as jnp
import pytest

from deepfluoro_tpu.ops import soft_dice_loss, ncc_2d, dice_and_heatmap_loss
from deepfluoro_tpu.ops.losses import heatmap_ncc_loss


def _np_soft_dice(pred, target, skip_bg):
    eps = 1e-4
    if skip_bg:
        pred = pred[..., 1:]
        target = target[..., 1:]
    num = -2 * np.sum(target * pred, axis=(1, 2)) + eps
    den = np.sum(target * target, axis=(1, 2)) + np.sum(pred * pred, axis=(1, 2)) + eps
    return np.mean(np.sum(num / den, axis=1) / pred.shape[-1])


class TestSoftDice:
    def test_perfect_prediction_all_classes_present(self):
        t = np.zeros((2, 8, 8, 3), np.float32)
        t[..., 0] = 1.0
        t[:, 2:5, 2:5, 0] = 0.0
        t[:, 2:5, 2:5, 1] = 1.0
        t[:, 6:8, 6:8, 0] = 0.0
        t[:, 6:8, 6:8, 2] = 1.0
        loss = soft_dice_loss(jnp.asarray(t), jnp.asarray(t), skip_bg=False)
        # eps=1e-4 in num+den biases tiny classes slightly away from -1
        assert float(loss) == pytest.approx(-1.0, abs=1e-4)

    def test_empty_vs_empty_replicates_reference_quirk(self):
        # (+eps)/(+eps) = +1 for a both-empty class: the reference comment
        # (dice.py:21-24) claims -1 but the formula (dice.py:29) gives +1.
        # We replicate the formula exactly; see losses.py docstring.
        t = np.zeros((1, 4, 4, 2), np.float32)
        t[..., 0] = 1.0  # class 1 empty in both
        loss = soft_dice_loss(jnp.asarray(t), jnp.asarray(t), skip_bg=True)
        assert float(loss) == pytest.approx(1.0, abs=1e-5)

    def test_matches_numpy_oracle(self, rng):
        pred = rng.random((3, 16, 16, 7)).astype(np.float32)
        pred /= pred.sum(-1, keepdims=True)
        labels = rng.integers(0, 7, (3, 16, 16))
        target = np.eye(7, dtype=np.float32)[labels]
        for skip_bg in (True, False):
            got = float(soft_dice_loss(jnp.asarray(pred), jnp.asarray(target), skip_bg=skip_bg))
            want = _np_soft_dice(pred, target, skip_bg)
            assert got == pytest.approx(want, rel=1e-5)

    def test_matches_torch_reference_semantics(self, rng):
        """Cross-check against a direct torch transcription of dice.py:20-55."""
        torch = pytest.importorskip("torch")
        pred = rng.random((2, 12, 12, 4)).astype(np.float32)
        target = (rng.random((2, 12, 12, 4)) > 0.5).astype(np.float32)
        got = float(soft_dice_loss(jnp.asarray(pred), jnp.asarray(target), skip_bg=True))

        tp = torch.from_numpy(pred).permute(0, 3, 1, 2)
        tt = torch.from_numpy(target).permute(0, 3, 1, 2)
        eps = 1.0e-4
        nums = -2 * torch.sum(torch.sum(tt[:, 1:] * tp[:, 1:], dim=3), dim=2) + eps
        dens = (
            torch.sum(torch.sum(tt[:, 1:] * tt[:, 1:], dim=3), dim=2)
            + torch.sum(torch.sum(tp[:, 1:] * tp[:, 1:], dim=3), dim=2)
            + eps
        )
        want = float(torch.mean(torch.sum(nums / dens, dim=1) / (pred.shape[-1] - 1)))
        assert got == pytest.approx(want, rel=1e-5)


class TestNCC:
    def test_self_correlation_is_n_minus_one_over_n(self, rng):
        # reference quirk (ncc.py:30-38): denominator N*sd with sample (N-1)
        # std makes self-NCC = (N-1)/N, not exactly 1
        x = rng.random((3, 10, 12)).astype(np.float32)
        out = np.asarray(ncc_2d(jnp.asarray(x), jnp.asarray(x)))
        assert out.shape == (3,)
        np.testing.assert_allclose(out, 119.0 / 120.0, atol=1e-4)

    def test_negated_correlation(self, rng):
        x = rng.random((10, 12)).astype(np.float32)
        out = float(ncc_2d(jnp.asarray(x), jnp.asarray(-x)))
        assert out == pytest.approx(-119.0 / 120.0, abs=1e-4)

    def test_zero_input_is_zero(self):
        x = np.random.default_rng(1).random((8, 8)).astype(np.float32)
        z = np.zeros((8, 8), np.float32)
        # 0/(0 + 1e-8) = 0 (ncc.py:38)
        assert float(ncc_2d(jnp.asarray(x), jnp.asarray(z))) == pytest.approx(0.0, abs=1e-6)

    def test_scale_invariance(self, rng):
        x = rng.random((6, 6)).astype(np.float32)
        y = rng.random((6, 6)).astype(np.float32)
        a = float(ncc_2d(jnp.asarray(x), jnp.asarray(y)))
        b = float(ncc_2d(jnp.asarray(x * 7.0 + 3.0), jnp.asarray(y)))
        assert a == pytest.approx(b, rel=1e-3)

    def test_nhwc_axes(self, rng):
        x = rng.random((2, 8, 8, 5)).astype(np.float32)
        out = np.asarray(ncc_2d(jnp.asarray(x), jnp.asarray(x), axes=(1, 2)))
        assert out.shape == (2, 5)
        np.testing.assert_allclose(out, 63.0 / 64.0, atol=1e-4)

    def test_sample_std_uses_n_minus_one(self, rng):
        """The denominator is N * sd(N-1 norm) + 1e-8 (ncc.py:30-38)."""
        x = rng.random((4, 4)).astype(np.float64)
        y = rng.random((4, 4)).astype(np.float64)
        n = 16
        xm, ym = x - x.mean(), y - y.mean()
        sd = lambda z: np.sqrt((z * z).sum() / (n - 1))
        want = (xm * ym).sum() / (n * sd(xm) * sd(ym) + 1e-8)
        got = float(ncc_2d(jnp.asarray(x.astype(np.float32)), jnp.asarray(y.astype(np.float32))))
        assert got == pytest.approx(want, rel=1e-4)


class TestJointLoss:
    def test_weighting(self, rng):
        pred_seg = rng.random((2, 8, 8, 3)).astype(np.float32)
        pred_seg /= pred_seg.sum(-1, keepdims=True)
        tgt_seg = np.eye(3, dtype=np.float32)[rng.integers(0, 3, (2, 8, 8))]
        ph = rng.random((2, 8, 8, 4)).astype(np.float32)
        th = rng.random((2, 8, 8, 4)).astype(np.float32)

        dice = float(soft_dice_loss(jnp.asarray(pred_seg), jnp.asarray(tgt_seg), skip_bg=False))
        heat = float(heatmap_ncc_loss(jnp.asarray(ph), jnp.asarray(th)))
        for w in (0.25, 0.5, 0.9):
            got = float(
                dice_and_heatmap_loss(
                    jnp.asarray(pred_seg), jnp.asarray(ph),
                    jnp.asarray(tgt_seg), jnp.asarray(th),
                    skip_bg=False, heatmap_wgt=w,
                )
            )
            assert got == pytest.approx((1 - w) * dice + w * heat, rel=1e-5)

    def test_heatmap_ncc_range(self, rng):
        h = rng.random((2, 8, 8, 3)).astype(np.float32)
        # identical heatmaps -> ncc (N-1)/N -> loss ((N-1)/N + 1) * -0.5
        want = -(63.0 / 64.0 + 1.0) * 0.5
        assert float(heatmap_ncc_loss(jnp.asarray(h), jnp.asarray(h))) == pytest.approx(want, abs=1e-4)
        # zero prediction vs target -> ncc 0 -> loss -0.5
        z = np.zeros_like(h)
        assert float(heatmap_ncc_loss(jnp.asarray(z), jnp.asarray(h))) == pytest.approx(-0.5, abs=1e-5)
