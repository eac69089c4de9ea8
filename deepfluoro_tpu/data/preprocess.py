"""Full-resolution -> preprocessed pipeline as fused device-side programs.

The reference *describes* this preprocessing but does not implement it
(README.md:84-95): crop 50 px from each border (collimator effects),
Beer-Lambert log transform (bone-is-dark -> bone-is-bright), rotate 180
degrees when the DICOM metadata says the patient is not "up"
(``rot-180-for-up``), and 2x/4x/8x/16x downsampling. Segmentations are
downsampled to the same grid (the reference ray-casts them server-side;
direct downsampling "should also work and may yield smoother labelings",
README.md:93-95 — we downsample directly with nearest sampling).

Here the whole chain is one jitted XLA program per (shape, factor), so
full-res inference (BASELINE configs 4-5) can run crop -> log -> rotate ->
downsample -> U-Net -> argmax as a single compiled program
(``make_fused_fullres_infer``).

Full-res archive schema: hdf5_layouts/Readme.md:16-93.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

BORDER_CROP_PX = 50  # README.md:84


def beer_lambert_log(proj: jnp.ndarray, eps: float = 1.0e-6) -> jnp.ndarray:
    """Approximate line-integral conversion: mu*l = log(I0) - log(I), with I0
    taken as the per-image max intensity. Maps bone-dark to bone-bright
    (README.md:86-88)."""
    i0 = jnp.max(proj)
    p = jnp.maximum(proj, eps)
    return jnp.log(i0 + eps) - jnp.log(p)


@partial(jax.jit, static_argnums=(1, 2, 3))
def preprocess_projection(
    img: jnp.ndarray,
    ds_factor: int,
    rot_180: bool = False,
    is_seg: bool = False,
) -> jnp.ndarray:
    """Crop borders -> (log) -> (rot180) -> downsample one (H, W) frame.

    Intensity frames are resized with linear (area-like) interpolation;
    label maps with nearest so labels stay discrete.
    """
    h, w = img.shape
    img = img[BORDER_CROP_PX : h - BORDER_CROP_PX, BORDER_CROP_PX : w - BORDER_CROP_PX]
    if not is_seg:
        img = beer_lambert_log(img)
    if rot_180:
        img = img[::-1, ::-1]
    hc, wc = img.shape
    out_h, out_w = hc // ds_factor, wc // ds_factor
    method = "nearest" if is_seg else "linear"
    return jax.image.resize(img, (out_h, out_w), method=method)


def preprocess_landmarks(
    lands_xy: np.ndarray,
    full_hw: tuple[int, int],
    ds_factor: int,
    rot_180: bool = False,
) -> np.ndarray:
    """Map (2, L) full-res landmark coords through the same geometry:
    -50 px crop offset, optional 180-degree rotation, divide by factor.
    Out-of-crop landmarks are NOT marked here — the preprocessed-archive
    loader applies the bounds->inf rule (hdf5.mark_oob_landmarks_inf)."""
    h, w = full_hw
    hc, wc = h - 2 * BORDER_CROP_PX, w - 2 * BORDER_CROP_PX
    out = np.asarray(lands_xy, np.float64).copy()
    out[0] -= BORDER_CROP_PX
    out[1] -= BORDER_CROP_PX
    if rot_180:
        out[0] = (wc - 1) - out[0]
        out[1] = (hc - 1) - out[1]
    # match jax.image.resize's actual scale (out_dim / cropped_dim), which
    # differs from 1/ds_factor when the cropped dim is not divisible by the
    # factor (e.g. 1336 @ 16x -> 83 px, scale 16.096 not 16)
    scale_x = (wc // ds_factor) / wc
    scale_y = (hc // ds_factor) / hc
    out[0] = (out[0] + 0.5) * scale_x - 0.5
    out[1] = (out[1] + 0.5) * scale_y - 0.5
    return out.astype(np.float32)


def full_res_to_preprocessed(
    src_path: str,
    dst_path: str,
    ds_factor: int,
    spec_id_map: dict[str, int] | None = None,
    land_names: list[str] | None = None,
) -> str:
    """Convert a full-resolution archive into the preprocessed schema
    (hdf5_layouts/Readme.md:95-117) at the given downsampling factor.

    spec_id_map: {full-res specimen group name -> output index}; defaults to
    the paper's mapping (README.md:74-80) when those groups exist, else
    enumeration order.
    """
    import h5py as h5

    PAPER_MAP = {
        "17-1882": 1, "18-1109": 2, "18-0725": 3,
        "18-2799": 4, "18-2800": 5, "17-1905": 6,
    }

    with h5.File(src_path, "r") as src, h5.File(dst_path, "w") as dst:
        spec_names = [k for k in src.keys() if k != "proj-params"]
        if spec_id_map is None:
            if all(n in PAPER_MAP for n in spec_names):
                spec_id_map = {n: PAPER_MAP[n] for n in spec_names}
            else:
                spec_id_map = {n: i + 1 for i, n in enumerate(sorted(spec_names))}

        all_land_names = land_names
        for spec_name in spec_names:
            spec_g = src[spec_name]
            projs_g = spec_g["projections"]
            proj_keys = sorted(projs_g.keys())

            projs_out, segs_out, lands_out = [], [], []
            for pk in proj_keys:
                pg = projs_g[pk]
                img = np.asarray(pg["image/pixels"][:], np.float32)
                rot = bool(np.asarray(pg["rot-180-for-up"][()]))
                proj_pp = np.asarray(preprocess_projection(jnp.asarray(img), ds_factor, rot, False))
                projs_out.append(proj_pp)

                if "gt-seg" in pg:
                    seg = np.asarray(pg["gt-seg/pixels"][:], np.float32)
                    seg_pp = np.asarray(preprocess_projection(jnp.asarray(seg), ds_factor, rot, True))
                    segs_out.append(seg_pp.astype(np.uint8))

                if "gt-landmarks" in pg:
                    lg = pg["gt-landmarks"]
                    if all_land_names is None:
                        all_land_names = sorted(lg.keys())
                    # not-visible landmarks must be FINITE out-of-bounds
                    # coords in the archive: the loader asserts isfinite and
                    # then converts OOB (<0) to inf itself (hdf5.py:157-158,
                    # matching the reference dataset.py:419-429)
                    pts = np.full((2, len(all_land_names)), -1.0, np.float32)
                    for li, name in enumerate(all_land_names):
                        if name in lg:
                            xy = np.asarray(lg[name][:], np.float64).reshape(-1)[:2]
                            pts[:, li] = preprocess_landmarks(
                                xy.reshape(2, 1), img.shape, ds_factor, rot
                            )[:, 0]
                    lands_out.append(pts)

            # segs/lands datasets index-align with projs, so partial GT
            # (some projections annotated, others not) cannot be stacked —
            # it would silently pair projection i with the labels of a later
            # projection. All-or-none per specimen, enforced loudly.
            if segs_out and len(segs_out) != len(projs_out):
                raise ValueError(
                    "specimen {}: {} of {} projections have gt-seg — "
                    "stacked 'segs' would misalign with 'projs'".format(
                        spec_name, len(segs_out), len(projs_out)
                    )
                )
            if lands_out and len(lands_out) != len(projs_out):
                raise ValueError(
                    "specimen {}: {} of {} projections have gt-landmarks — "
                    "stacked 'lands' would misalign with 'projs'".format(
                        spec_name, len(lands_out), len(projs_out)
                    )
                )
            og = dst.create_group("{:02d}".format(spec_id_map[spec_name]))
            og.create_dataset("projs", data=np.stack(projs_out))
            if segs_out:
                og.create_dataset("segs", data=np.stack(segs_out))
            if lands_out:
                og.create_dataset("lands", data=np.stack(lands_out))

        if all_land_names:
            lg = dst.create_group("land-names")
            lg["num-lands"] = len(all_land_names)
            for li, name in enumerate(all_land_names):
                lg["land-{:02d}".format(li)] = name

    return dst_path


def make_sharded_fullres_infer(
    model, variables, ds_factor: int, pad_dim: int, full_hw: tuple[int, int], mesh,
    apply_fn=None,
):
    """Spatially-sharded fused full-res inference: the (B, H_full, W_full)
    frames are sharded over 'data' (batch) and 'spatial' (H) mesh axes; the
    GSPMD partitioner emits the convolution halo exchanges over ICI
    (SURVEY.md §2.3's spatial-parallel analogue at the 1436^2 scale, where
    per-chip HBM and FLOPs favor splitting the frame). ``apply_fn``
    overrides the float forward exactly as in
    :func:`make_fused_fullres_infer` (int8 composes: the w8a8 convs
    partition like the float ones)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    infer = make_fused_fullres_infer(
        model, variables, ds_factor, pad_dim, full_hw, apply_fn=apply_fn
    )

    data = "data" if "data" in mesh.axis_names else None
    spatial = "spatial" if "spatial" in mesh.axis_names else None
    proj_sh = NamedSharding(mesh, P(data, spatial, None))
    repl = NamedSharding(mesh, P())
    out_sh = (NamedSharding(mesh, P(data, None, None)), NamedSharding(mesh, P(data, None, None, None)))

    jit_infer = jax.jit(
        lambda projs, rots: infer(projs, rots),
        in_shardings=(proj_sh, NamedSharding(mesh, P(data))),
        out_shardings=out_sh,
    )

    def place(projs, rots):
        return (
            jax.device_put(projs, proj_sh),
            jax.device_put(rots, NamedSharding(mesh, P(data))),
        )

    return jit_infer, place


def make_fullres_prep(ds_factor: int, pad_dim: int, full_hw: tuple[int, int]):
    """The device-side prep half of the fused full-res program: crop 50 px
    borders -> Beer-Lambert log -> conditional rot-180 -> downsample ->
    reflect-pad to ``pad_dim`` -> z-norm (ddof=1, the training contract).

    Returns (prep, (hc, wc)): ``prep(projs (B, H_full, W_full), rot_flags
    (B,)) -> (B, pad, pad, 1)`` ready for the U-Net, plus the pre-pad crop
    size the network outputs are center-cropped back to. Shared by the
    float and int8 fused-inference constructors (int8 calibration must see
    EXACTLY the tensors the quantized forward will consume)."""
    from deepfluoro_tpu.ops.image import calc_pad_amount, znorm

    h, w = full_hw
    hc = (h - 2 * BORDER_CROP_PX) // ds_factor
    wc = (w - 2 * BORDER_CROP_PX) // ds_factor
    assert hc == wc, "square frames expected"
    extra = calc_pad_amount(pad_dim, hc) if pad_dim > hc else 0

    def prep_one(img, rot):
        x = img[BORDER_CROP_PX : h - BORDER_CROP_PX, BORDER_CROP_PX : w - BORDER_CROP_PX]
        x = beer_lambert_log(x)
        x = jnp.where(rot, x[::-1, ::-1], x)
        x = jax.image.resize(x, (hc, wc), method="linear")
        if extra > 0:
            x = jnp.pad(x, ((extra, extra), (extra, extra)), mode="reflect")
        x = znorm(x)  # ddof=1, matching the training pipeline exactly
        return x[..., None]

    return jax.vmap(prep_one), (hc, wc)


def make_fused_fullres_infer(
    model, variables, ds_factor: int, pad_dim: int, full_hw: tuple[int, int],
    apply_fn=None,
):
    """One compiled program: full-res frames -> crop/log/rot/downsample ->
    reflect-pad + z-norm -> U-Net -> argmax (+heats). BASELINE config 5.

    Returns jitted fn(projs (B, H_full, W_full), rot_flags (B,)) ->
    (labels (B, h, w) uint8, heats (B, h, w, L) | None).

    ``apply_fn(x) -> seg | (seg, heats)`` overrides the float forward
    (``model.apply``); :func:`make_quantized_fullres_infer` passes the int8
    engine through it.
    """
    from deepfluoro_tpu.ops.image import center_crop

    prep, (hc, wc) = make_fullres_prep(ds_factor, pad_dim, full_hw)
    if apply_fn is None:
        apply_fn = lambda x: model.apply(variables, x, train=False)

    @jax.jit
    def infer(projs, rot_flags):
        x = prep(projs, rot_flags)
        out = apply_fn(x)
        if isinstance(out, tuple):
            seg, heats = out
        else:
            seg, heats = out, None
        seg = center_crop(seg, (hc, wc))
        labels = jnp.argmax(seg, axis=-1).astype(jnp.uint8)
        if heats is not None:
            heats = center_crop(heats, (hc, wc))
        return labels, heats

    return infer


def make_quantized_fullres_infer(
    model, variables, ds_factor: int, pad_dim: int, full_hw: tuple[int, int],
    calib_projs, calib_rot_flags, mesh=None, float_levels: int = 0,
):
    """int8 variant of :func:`make_fused_fullres_infer` (the deployment
    path measured 1.22x at the 8x geometry, BASELINE.md): activation scales
    are calibrated on ``calib_projs`` run through the SAME fused prep the
    inference program uses, weights are per-tensor symmetric-quantized, and
    the returned program is identical to the float one except the U-Net
    convs run w8a8 on the MXU (infer/quantized.py).

    ``calib_projs``: (B, H_full, W_full) raw frames (>=1); ``calib_rot_flags``
    their rot-180 flags. Same return contract as the float constructors:
    the fused program, or ``(jit_infer, place)`` when ``mesh`` is given
    (:func:`make_sharded_fullres_infer`).
    """
    from deepfluoro_tpu.infer.quantized import (
        calibrate, make_level_filter, quantize_weights, quantized_apply,
    )

    calib_projs = jnp.asarray(calib_projs)
    if calib_projs.ndim != 3 or calib_projs.shape[0] < 1:
        raise ValueError(
            "int8 calibration needs at least one (B, H, W) raw frame; got "
            "shape {}".format(calib_projs.shape)
        )
    prep, _ = make_fullres_prep(ds_factor, pad_dim, full_hw)
    calib_x = jax.jit(prep)(calib_projs, jnp.asarray(calib_rot_flags))
    scales = calibrate(model, variables, [calib_x])
    qweights = quantize_weights(model, variables)
    int8_points = make_level_filter(float_levels, model.depth)
    apply_fn = lambda x: quantized_apply(
        model, qweights, variables, scales, x, int8_points=int8_points
    )

    if mesh is not None:
        return make_sharded_fullres_infer(
            model, variables, ds_factor, pad_dim, full_hw, mesh, apply_fn=apply_fn
        )
    return make_fused_fullres_infer(
        model, variables, ds_factor, pad_dim, full_hw, apply_fn=apply_fn
    )
