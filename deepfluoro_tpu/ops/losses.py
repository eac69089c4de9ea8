"""Training losses: soft Dice, 2D NCC, and the joint Dice + heatmap-NCC loss.

Semantics mirror the reference implementation (reference: train_test_code/dice.py,
train_test_code/ncc.py) but operate on NHWC arrays and are pure jittable
functions suitable for ``jax.value_and_grad`` on TPU:

- soft Dice (reference dice.py:20-55): negated differentiable Dice with
  eps=1e-4 added to numerator and denominator; optional background skip;
  per-class -> per-image mean -> batch mean. NOTE a deliberate replication of
  a reference quirk: for a class empty in both prediction and target the
  formula yields (+eps)/(+eps) = +1, the WORST score, even though the
  reference's comment (dice.py:21-24) claims the case scores -1 (the sign
  flip on the numerator's eps was evidently unintended). The gradient is
  exactly zero either way, so training dynamics are unaffected, but we keep
  the reference's loss *values* bit-comparable for parity testing.
- 2D NCC (reference ncc.py:12-38): normalized cross-correlation over the two
  spatial dims, sample standard deviation with N-1, eps=1e-8 in the
  denominator.
- joint loss (reference dice.py:57-86): (1-w)*dice + w*mean((ncc+1)*-0.5).
"""

from __future__ import annotations

import jax.numpy as jnp

_DICE_EPS = 1.0e-4
_NCC_EPS = 1.0e-8


def per_sample_dice(pred: jnp.ndarray, target: jnp.ndarray, skip_bg: bool) -> jnp.ndarray:
    """Per-image (negated) soft Dice, (B,) — the single implementation of the
    eps-sensitive dice expression; scalar losses and validation statistics
    both build on it."""
    if skip_bg:
        pred = pred[..., 1:]
        target = target[..., 1:]
    num_classes = pred.shape[-1]
    # Sum over spatial dims (H, W) -> (B, C)
    numerators = -2.0 * jnp.sum(target * pred, axis=(1, 2)) + _DICE_EPS
    denominators = (
        jnp.sum(target * target, axis=(1, 2))
        + jnp.sum(pred * pred, axis=(1, 2))
        + _DICE_EPS
    )
    dices = numerators / denominators  # (B, C)
    return jnp.sum(dices, axis=1) / num_classes  # (B,)


def soft_dice_loss(pred: jnp.ndarray, target: jnp.ndarray, skip_bg: bool = True) -> jnp.ndarray:
    """Differentiable (negated) Dice over softmax probabilities vs one-hot targets.

    Args:
      pred:   (B, H, W, C) softmax class probabilities.
      target: (B, H, W, C) one-hot ground truth.
      skip_bg: exclude channel 0 (background) from the average.

    Returns a scalar loss; -1 is a perfect segmentation. Nominally in
    [-1, 0], but a class empty in BOTH pred and target contributes +1 (the
    replicated eps quirk, see module doc), so batches missing a foreground
    class can score above 0.
    """
    assert pred.ndim == 4 and target.ndim == 4
    return jnp.mean(per_sample_dice(pred, target, skip_bg))


def ncc_2d(x: jnp.ndarray, y: jnp.ndarray, axes: tuple[int, int] = (-2, -1)) -> jnp.ndarray:
    """Normalized cross-correlation over two spatial axes.

    Mirrors reference ncc.py:12-38: zero-mean both inputs over the spatial
    axes, divide by N * sample std (N-1 normalization) with eps=1e-8. Works on
    any rank >= 2; returns an array with the spatial axes reduced away.
    """
    n = x.shape[axes[0]] * x.shape[axes[1]]
    assert n > 1
    # mismatched spatial dims would broadcast into a finite but wrong
    # correlation (n and y's moments computed over different extents)
    assert (
        x.shape[axes[0]] == y.shape[axes[0]] and x.shape[axes[1]] == y.shape[axes[1]]
    ), (x.shape, y.shape)
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)

    mu_x = jnp.mean(x, axis=axes, keepdims=True)
    x_zm = x - mu_x
    x_sd = jnp.sqrt(jnp.sum(x_zm * x_zm, axis=axes) / (n - 1))

    mu_y = jnp.mean(y, axis=axes, keepdims=True)
    y_zm = y - mu_y
    y_sd = jnp.sqrt(jnp.sum(y_zm * y_zm, axis=axes) / (n - 1))

    return jnp.sum(x_zm * y_zm, axis=axes) / ((n * (x_sd * y_sd)) + _NCC_EPS)


def per_sample_heatmap_ncc(pred_heats: jnp.ndarray, target_heats: jnp.ndarray) -> jnp.ndarray:
    """Per-image heatmap NCC loss, (B,): per-landmark NCC mapped to [-1, 0]
    (reference dice.py:81-86) averaged over landmarks."""
    nccs = ncc_2d(pred_heats, target_heats, axes=(1, 2))  # (B, L)
    return jnp.mean((nccs + 1.0) * -0.5, axis=1)


def per_sample_joint(pred_seg, pred_heats, tgt_seg, tgt_heats, heat_coeff: float) -> jnp.ndarray:
    """Per-image joint loss, (B,) — shared by training and the batch-1-style
    validation statistics (util.py:116-165 computes mean AND std over
    per-image losses)."""
    dice = per_sample_dice(pred_seg, tgt_seg, skip_bg=False)
    heat = per_sample_heatmap_ncc(pred_heats, tgt_heats)
    return (1.0 - heat_coeff) * dice + heat_coeff * heat


def heatmap_ncc_loss(pred_heats: jnp.ndarray, target_heats: jnp.ndarray) -> jnp.ndarray:
    """Scalar heatmap NCC loss (reference dice.py:81-86)."""
    return jnp.mean(per_sample_heatmap_ncc(pred_heats, target_heats))


def dice_and_heatmap_loss(
    pred_seg: jnp.ndarray,
    pred_heats: jnp.ndarray,
    target_seg: jnp.ndarray,
    target_heats: jnp.ndarray,
    skip_bg: bool = False,
    heatmap_wgt: float = 0.5,
) -> jnp.ndarray:
    """Joint segmentation + landmark loss: (1-w)*dice + w*heatmap-NCC.

    Mirrors reference dice.py:57-86 (the training loop constructs it with
    skip_bg=False, train.py:324).
    """
    assert 1.0e-8 < heatmap_wgt < 1.0 + 1.0e-8
    dice = soft_dice_loss(pred_seg, target_seg, skip_bg=skip_bg)
    heat = heatmap_ncc_loss(pred_heats, target_heats)
    return (1.0 - heatmap_wgt) * dice + heatmap_wgt * heat
