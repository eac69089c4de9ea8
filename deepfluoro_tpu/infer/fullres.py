"""Fused full-resolution ensemble inference: raw archive -> nn-segs/nn-heats.

The reference cannot serve raw frames: its test pipeline consumes
server-side preprocessed per-level archives (hdf5_layouts/Readme.md:42-45,
README.md:84-95) and runs test_ensemble.py on those. Here ONE compiled
program per rung folds the whole preprocess (crop 50 px -> Beer-Lambert
log -> conditional rot-180 -> downsample -> reflect-pad -> z-norm) into the
ensemble forward + averaging + argmax, so deployment serves raw 1536^2
frames directly at every downsample factor (BASELINE.md ladder: 2177 /
505 / 107 / 19.1 frames/s at 8x / 4x / 2x / 1x on one v5e chip).

Output contract is seg_dataset_ensemble's exactly (reference
util.py:293-377): ``nn-segs`` (N, h, w) u1 gzip-9 and ``nn-heats``
(N, L, h, w), indexed in (specimen, projection-key) order, in the
PREPROCESSED orientation — downstream est_lands_csv / compute_actual_dice
consume them unchanged against a preprocessed GT archive of the same
factor.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from deepfluoro_tpu.data.preprocess import BORDER_CROP_PX, make_fullres_prep
from deepfluoro_tpu.infer.ensemble import (
    make_ensemble_forward,
    stack_variables,
)
from deepfluoro_tpu.native import write_dataset_direct


def list_fullres_frames(src, specimens=None):
    """(specimen, projection-key) index of a full-res archive, in stable
    (specimen order given, sorted projection key) order. ``specimens``
    defaults to every specimen group in file order."""
    if specimens is None:
        specimens = [k for k in src.keys() if k != "proj-params"]
    entries = []
    for spec in specimens:
        if spec not in src:
            raise ValueError(
                "specimen group '{}' not in the archive (has: {})".format(
                    spec, ", ".join(k for k in src.keys() if k != "proj-params")
                )
            )
        for pk in sorted(src[spec]["projections"].keys()):
            entries.append((spec, pk))
    return entries


def fullres_land_names(src, entries):
    """Landmark names from the first projection carrying gt-landmarks
    (sorted-key order, the full_res_to_preprocessed convention), or None."""
    for spec, pk in entries:
        pg = src[spec]["projections"][pk]
        if "gt-landmarks" in pg:
            return sorted(pg["gt-landmarks"].keys())
    return None


def seg_fullres_dataset(
    src,
    specimens,
    models_and_vars,
    h5_f,
    ds_factor: int,
    num_lands: int = 0,
    times: list | None = None,
    batch_size: int = 4,
    pad_img_dim: int = 0,
    quantized: bool = False,
    int8_float_levels: int = 0,
):
    """Run the ensemble over raw full-res frames and write nn-segs/nn-heats.

    src: an open full-res HDF5 archive; specimens: group names (None = all).
    Partial final batches are padded (repeating the last frame) so the whole
    run is ONE program specialization; their --times entries report the
    full-batch wall-clock split over the real images. ``quantized`` runs the
    w8a8 path with activation scales calibrated on the first batch run
    through the SAME fused prep (worth it only at the 8x rung — 0.49-0.60x
    at 2x/4x, BASELINE.md).
    """
    entries = list_fullres_frames(src, specimens)
    n = len(entries)
    if n == 0:
        raise ValueError("no projections selected")

    model = models_and_vars[0][0]
    full_hw = tuple(src[entries[0][0]]["projections"][entries[0][1]]["image/pixels"].shape)
    hc = (full_hw[0] - 2 * BORDER_CROP_PX) // ds_factor
    wc = (full_hw[1] - 2 * BORDER_CROP_PX) // ds_factor
    if hc != wc:
        raise ValueError("square frames expected, got {} -> {}x{}".format(full_hw, hc, wc))
    if pad_img_dim < hc:
        raise ValueError(
            "checkpoint proj_unet_dim {} is smaller than the {}x frame size "
            "{} — these nets were trained for a different downsample factor".format(
                pad_img_dim, ds_factor, hc
            )
        )
    orig_hw = (hc, wc)
    batch_size = min(batch_size, n)

    def read_batch(i0, i1):
        projs = np.empty((i1 - i0, *full_hw), np.float32)
        rots = np.empty((i1 - i0,), bool)
        for j, (spec, pk) in enumerate(entries[i0:i1]):
            pg = src[spec]["projections"][pk]
            projs[j] = pg["image/pixels"][:]
            rots[j] = bool(np.asarray(pg["rot-180-for-up"][()]))
        return projs, rots

    prep, _ = make_fullres_prep(ds_factor, pad_img_dim, full_hw)

    if quantized:
        from deepfluoro_tpu.infer.quantized import (
            make_quantized_ensemble_forward,
            prepare_quantized_ensemble,
        )

        calib_p, calib_r = read_batch(0, batch_size)
        calib_x = jax.jit(prep)(jnp.asarray(calib_p), jnp.asarray(calib_r))
        stacked = prepare_quantized_ensemble(models_and_vars, [calib_x])
        net_fwd = make_quantized_ensemble_forward(
            model, num_lands, orig_hw, float_levels=int8_float_levels
        )
    else:
        stacked = stack_variables([v for _, v in models_and_vars])
        net_fwd = make_ensemble_forward(model, num_lands, orig_hw)

    fwd = jax.jit(lambda sv, p, r: net_fwd(sv, prep(p, r)))

    dst_ds = h5_f.create_dataset(
        "nn-segs", (n, hc, wc), dtype="u1", chunks=(1, hc, wc),
        compression="gzip", compression_opts=9,
    )
    dst_heats_ds = None
    if num_lands > 0:
        dst_heats_ds = h5_f.create_dataset(
            "nn-heats", (n, num_lands, hc, wc), chunks=(1, 1, hc, wc),
            compression="gzip", compression_opts=9,
        )

    # warm the single (batch_size) specialization outside the timed region
    warm = (
        jnp.ones((batch_size, *full_hw), jnp.float32),
        jnp.zeros((batch_size,), bool),
    )
    _ = np.asarray(fwd(stacked, *warm)[2])

    for i0 in range(0, n, batch_size):
        i1 = min(i0 + batch_size, n)
        real_b = i1 - i0
        projs, rots = read_batch(i0, i1)  # host HDF5 read, untimed
        if real_b < batch_size:
            pad = batch_size - real_b
            projs = np.concatenate([projs, np.repeat(projs[-1:], pad, axis=0)])
            rots = np.concatenate([rots, np.repeat(rots[-1:], pad)])
        start_time = time.time()
        _, avg_heats, pred_labels = fwd(stacked, jnp.asarray(projs), jnp.asarray(rots))
        # scalar-readback drain inside the timed region (the paper's
        # latency metric; block_until_ready can return early on remote
        # transports)
        _ = np.asarray(pred_labels[0, 0, 0])
        stop_time = time.time()
        if times is not None:
            times.extend([(stop_time - start_time) / real_b] * real_b)

        pred_labels = np.asarray(pred_labels[:real_b])
        write_dataset_direct(dst_ds, i0, pred_labels)
        if dst_heats_ds is not None:
            write_dataset_direct(
                dst_heats_ds, i0,
                np.transpose(np.asarray(avg_heats[:real_b]), (0, 3, 1, 2)),
            )

    return entries
