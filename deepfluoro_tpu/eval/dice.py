"""Hard (non-differentiable) Dice between estimated and ground-truth label
maps (reference compute_actual_dice_on_test.py:63-93).

Per projection, per class 1..num_classes-1:
  dice = 2*|est ∩ gt| / (|est| + |gt|); both-empty (sum <= 0.1) -> 1.0.

Computed as one vectorized program over (N, C-1) instead of the reference's
python double loop.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def _hard_dice(gt_segs, est_segs, class_ids):
    # gt/est: (N, H, W) int; class_ids: (C-1,)
    def per_class(c):
        gt = (gt_segs == c).astype(jnp.float32)
        est = (est_segs == c).astype(jnp.float32)
        inter = jnp.sum(est * gt, axis=(1, 2))
        gt_sum = jnp.sum(gt, axis=(1, 2))
        est_sum = jnp.sum(est, axis=(1, 2))
        tot = gt_sum + est_sum
        d = jnp.where(tot > 0.1, (2.0 * inter) / jnp.maximum(tot, 1e-12), 1.0)
        # TPU lowers divide to multiply-by-reciprocal, which can round a
        # perfect-overlap ratio to 1.0000001; clamp to the valid range
        return jnp.clip(d, 0.0, 1.0)

    return jax.vmap(per_class, out_axes=1)(class_ids)  # (N, C-1)


def hard_dice(gt_segs: np.ndarray, est_segs: np.ndarray, num_classes: int = 7) -> np.ndarray:
    """Returns (N, num_classes-1) Dice for classes 1..num_classes-1."""
    assert gt_segs.shape == est_segs.shape
    class_ids = jnp.arange(1, num_classes)
    out = _hard_dice(
        jnp.asarray(gt_segs.astype(np.int32)),
        jnp.asarray(est_segs.astype(np.int32)),
        class_ids,
    )
    return np.asarray(out)


def write_dice_csv(
    out_path: str,
    pat_ind: int,
    dices: np.ndarray,
    no_hdr: bool = False,
) -> None:
    """CSV contract of compute_actual_dice_on_test.py:59-93:
    header ``pat,proj,label,dice``, rows '{},{},{},{:.2f}'."""
    with open(out_path, "w") as csv_out:
        if not no_hdr:
            csv_out.write("pat,proj,label,dice\n")
        n, cm1 = dices.shape
        for proj in range(n):
            for li in range(cm1):
                d = float(dices[proj, li])
                assert -1.0e-8 < d < 1 + 1.0e-8
                csv_out.write("{},{},{},{:.2f}\n".format(pat_ind, proj, li + 1, d))
        csv_out.flush()
