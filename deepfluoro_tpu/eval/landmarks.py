"""Landmark extraction from estimated heatmaps — the reference's "rule 3"
(est_lands_csv.py:100-124) as a batched jitted program.

Per (projection, landmark):
  1. restrict the heatmap argmax to pixels whose estimated segmentation class
     matches the landmark's associated structure (hardcoded name -> label
     map, est_lands_csv.py:56-73); reject if the class is absent;
  2. take a 25x25 ROI around the peak from the 12px reflect-padded heatmap
     (the peak index was computed in the unpadded image, so it *is* the ROI
     start in the padded image, est_lands_csv.py:113-119);
  3. gate on NCC(template, ROI) >= 0.9 against a sigma=2.5 Gaussian template
     (est_lands_csv.py:87,121-122).

The reference loops in Python per projection x landmark on CPU
(est_lands_csv.py:90-134); here the whole (N, L) grid is evaluated in one
XLA program (vmap over landmarks, lax.map over projections).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from deepfluoro_tpu.ops.heatmap import gaussian_heatmap
from deepfluoro_tpu.ops.losses import ncc_2d

# landmark name -> estimated-seg label used to gate detection
# (est_lands_csv.py:56-73; labels per README.md:33-41)
SEG_LABELS_TO_USE_FOR_LANDS = {
    "FH-l": 5, "FH-r": 6,
    "GSN-l": 1, "GSN-r": 2,
    "IOF-l": 1, "IOF-r": 2,
    "MOF-l": 1, "MOF-r": 2,
    "SPS-l": 1, "SPS-r": 2,
    "IPS-l": 1, "IPS-r": 2,
    "ASIS-l": 1, "ASIS-r": 2,
    "PSIS-l": 1, "PSIS-r": 2,
    "PIIS-l": 1, "PIIS-r": 2,
}

_ROI = 25
_PAD = 12
_NCC_THRESH = 0.9


def _gate_labels(land_names, use_seg: bool) -> np.ndarray:
    """(L,) int32 seg label per landmark; -1 disables gating."""
    if not use_seg:
        return np.full((len(land_names),), -1, np.int32)
    return np.array(
        [SEG_LABELS_TO_USE_FOR_LANDS.get(nm, -1) for nm in land_names], np.int32
    )


@partial(jax.jit, static_argnums=(3,))
def _detect_all(heats, segs, seg_labels, use_seg: bool):
    """heats: (N, L, H, W); segs: (N, H, W) int (dummy when use_seg=False);
    seg_labels: (L,) int32, -1 disables gating for that landmark.
    Returns (rows (N, L) int32, cols (N, L) int32) with -1 for not-found."""
    template = gaussian_heatmap(_ROI, _ROI, 2.5)

    def one_land(heat, seg, label):
        # heat: (H, W); seg: (H, W)
        gate = use_seg
        masked = jnp.where((seg == label) | (label < 0), heat, -jnp.inf) if gate else heat
        flat_idx = jnp.argmax(masked)
        h, w = heat.shape
        r = flat_idx // w
        c = flat_idx % w
        found = jnp.isfinite(masked.reshape(-1)[flat_idx])

        heat_pad = jnp.pad(heat, ((_PAD, _PAD), (_PAD, _PAD)), mode="reflect")
        roi = jax.lax.dynamic_slice(heat_pad, (r, c), (_ROI, _ROI))
        found = found & (ncc_2d(template, roi) >= _NCC_THRESH)

        r = jnp.where(found, r, -1)
        c = jnp.where(found, c, -1)
        return r.astype(jnp.int32), c.astype(jnp.int32)

    def one_proj(args):
        heat_l, seg = args  # (L, H, W), (H, W)
        return jax.vmap(lambda h, lbl: one_land(h, seg, lbl))(heat_l, seg_labels)

    rows, cols = jax.lax.map(one_proj, (heats, segs))
    return rows, cols


def detect_landmarks(
    heats: np.ndarray,
    land_names: list[str],
    segs: np.ndarray | None = None,
):
    """Detect all landmarks in all projections.

    Args:
      heats: (N, L, H, W) estimated heatmaps (the ``nn-heats`` layout).
      land_names: L landmark names (drives the seg-class gating).
      segs: optional (N, H, W) estimated label maps (``nn-segs``).

    Returns (rows, cols): two (N, L) int arrays, -1 where not found.
    """
    n, l, h, w = heats.shape
    assert len(land_names) == l
    use_seg = segs is not None
    labels = _gate_labels(land_names, use_seg)
    if use_seg:
        segs_arr = jnp.asarray(segs.astype(np.int32))
    else:
        # the kernel never reads seg when use_seg=False (static gate), so
        # carry a token-sized dummy instead of an (N, H, W) zeros upload
        segs_arr = jnp.zeros((n, 1, 1), jnp.int32)
    rows, cols = _detect_all(
        jnp.asarray(heats, jnp.float32), segs_arr, jnp.asarray(labels), use_seg
    )
    return np.asarray(rows), np.asarray(cols)


def detect_landmarks_timed(
    heats: np.ndarray,
    land_names: list[str],
    segs: np.ndarray | None = None,
):
    """Like :func:`detect_landmarks` but measured per projection so the CSV
    ``time`` column varies per row like the reference's per-detection timing
    (est_lands_csv.py:94,131-133).

    One dispatch of the batched program per projection (compile excluded by a
    warm-up call); each row's time is that projection's wall-clock divided
    evenly over its L landmarks — an honest per-batch division, since the L
    detections execute as one fused device program rather than the
    reference's per-landmark Python loop.

    Returns (rows (N, L), cols (N, L), times (N, L) seconds).
    """
    import time

    n, l, h, w = heats.shape
    assert len(land_names) == l
    use_seg = segs is not None
    labels_dev = jnp.asarray(_gate_labels(land_names, use_seg))

    heats_f = heats.astype(np.float32, copy=False)
    segs_i = None if segs is None else segs.astype(np.int32, copy=False)

    def one(i):
        hv = jnp.asarray(heats_f[i : i + 1])
        sv = (
            jnp.asarray(segs_i[i : i + 1])
            if use_seg
            else jnp.zeros((1, 1, 1), jnp.int32)
        )
        r, c = _detect_all(hv, sv, labels_dev, use_seg)
        return np.asarray(r), np.asarray(c)

    one(0)  # warm-up: compile outside the timed region

    rows = np.empty((n, l), np.int32)
    cols = np.empty((n, l), np.int32)
    times = np.empty((n, l), np.float64)
    for i in range(n):
        t0 = time.perf_counter()
        r, c = one(i)
        dt = time.perf_counter() - t0
        rows[i] = r[0]
        cols[i] = c[0]
        times[i] = dt / l
    return rows, cols, times


def write_landmarks_csv(
    out_path: str,
    pat_ind: int,
    rows: np.ndarray,
    cols: np.ndarray,
    per_land_time: float | np.ndarray = 0.0,
    no_hdr: bool = False,
):
    """CSV contract of est_lands_csv.py:75-134: header ``pat,proj,land,row,
    col,time``; -1,-1 marks not-found; '{:3f}' time formatting.

    ``per_land_time`` is a scalar or an (N, L) array of per-detection times.
    """
    n, l = rows.shape
    times = np.broadcast_to(np.asarray(per_land_time, np.float64), (n, l))
    with open(out_path, "w") as csv_out:
        if not no_hdr:
            csv_out.write("pat,proj,land,row,col,time\n")
        for i in range(n):
            for land_ind in range(l):
                csv_out.write(
                    "{},{},{},{},{},{:3f}\n".format(
                        pat_ind, i, land_ind,
                        int(rows[i, land_ind]), int(cols[i, land_ind]),
                        times[i, land_ind],
                    )
                )
