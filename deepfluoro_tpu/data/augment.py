"""Device-side data augmentation + batch preparation as one jitted program.

The reference runs its augmentation chain per-sample on the host inside
DataLoader worker processes (dataset.py:91-328, 8 workers, train.py:293-296):
invert -> noise -> gamma -> PIL affine -> random erase -> reflect pad ->
z-norm -> Gaussian heatmap synthesis. On TPU we fuse the entire chain into a
single XLA program vmapped over the batch with stateless PRNG keys; host
workers are reduced to slicing numpy arrays. All shapes are static, so the
program compiles once per (batch, image) shape.

Stage-by-stage semantics (citations into reference dataset.py):
  aug gate       : P(augment sample) = 0.5            (:63,107)
  invert         : p = max(p) - p, P=0.5              (:110-118)
  noise          : sigma ~ U(0.005, 0.01) on [0,1]-scaled data (:120-133)
  gamma          : gamma ~ U(0.7, 1.3) on [0,1]-scaled data    (:135-148)
  affine         : reflect-pad by ceil(dim/2) (+ the final pad amount),
                   rotate U(-5,5) deg, translate U(0,20)px in a uniformly
                   random direction, shear U(-1,1) deg both axes, scale
                   U(0.9,1.1); bilinear for the projection, nearest for the
                   label map; landmarks transformed analytically by the
                   forward matrix with out-of-bounds -> inf (:150-251)
  erase          : P=0.25; 1-5 boxes, dims ~ round(N(mu, mu)), mu = 15% of
                   each dim; strong noise sigma = 0.2*(roi max-min) (:253-283)
  pad            : reflect pad to proj_pad_dim (:287-290)
  z-norm         : zero mean / unit std              (:292-293)
  heatmaps       : sigma=2.5 Gaussians at seg resolution, inf -> zeros
                   (:296-326)

Documented divergences from the reference (all flagged in SURVEY.md §2.4):
  * the post-affine landmark bounds check uses the corrected comparison (the
    reference's `<` typo at dataset.py:247 marks nearly every augmented
    landmark out-of-bounds, silently zeroing heatmap supervision for ~50% of
    training samples);
  * the landmark transform uses the exact center of the image warp
    (index W/2-0.5) rather than the reference's (rows/2+0.5, cols/2+0.5)
    which is 1px off from its own image warp;
  * erase-box dims are clipped into the valid range instead of
    rejection-resampled (dataset.py:267-277) — same distribution family,
    no data-dependent loop in the compiled program;
  * when do_affine=False (a combination no reference CLI exercises), the
    reflect pad to proj_pad_dim happens before random erase rather than
    after, so erase boxes are sized from (and may land in) the padded
    frame; with affine enabled — every documented configuration — the
    order matches the reference;
  * when pad_data_for_affine=False AND proj_pad_dim is set (also never
    exercised by a reference CLI), the warp writes constant-fill borders
    directly into the extended frame rather than reflect-padding the
    warped result afterwards.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from deepfluoro_tpu.ops.heatmap import synthesize_heatmaps
from deepfluoro_tpu.ops.image import (
    affine_warp,
    calc_pad_amount,
    inverse_affine_matrix,
    transform_landmarks,
    znorm,
)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Static (hashable) configuration; a jit specialization per value."""

    num_classes: int = 7
    proj_pad_dim: int = 0  # 0 disables padding
    prob_of_aug: float = 0.5  # 0 disables the whole augmentation subgraph
    do_invert: bool = True
    do_noise: bool = True
    do_gamma: bool = True
    do_affine: bool = True
    do_erase: bool = True
    erase_prob: float = 0.25
    pad_data_for_affine: bool = True
    do_norm_01_scale: bool = True
    include_heat_map: bool = True
    heat_sigma: float = 2.5
    max_erase_boxes: int = 5
    # None = auto (Pallas kernel on TPU backends, XLA elsewhere)
    use_pallas_warp: bool | None = None


def _extra_pad(cfg: AugmentConfig, img_dim: int) -> int:
    if cfg.proj_pad_dim > img_dim:
        return calc_pad_amount(cfg.proj_pad_dim, img_dim)
    return 0


def _rescale01(p):
    lo, hi = jnp.min(p), jnp.max(p)
    return (p - lo) / (hi - lo), lo, hi


def _augment_proj_seg_lands(cfg: AugmentConfig, key, p, s, lands):
    """The augmented branch: full chain on one (H, W) sample."""
    h, w = p.shape
    extra = _extra_pad(cfg, h)
    keys = jax.random.split(key, 16)

    if cfg.do_invert:
        do_inv = jax.random.uniform(keys[0]) < 0.5
        p = jnp.where(do_inv, jnp.max(p) - p, p)

    if cfg.do_noise:
        p01, lo, hi = _rescale01(p)
        sigma = jax.random.uniform(keys[1], minval=0.005, maxval=0.01)
        p01 = p01 + jax.random.normal(keys[2], p.shape) * sigma
        p = p01 * (hi - lo) + lo

    if cfg.do_gamma:
        p01, lo, hi = _rescale01(p)
        gamma = jax.random.uniform(keys[3], minval=0.7, maxval=1.3)
        p01 = jnp.power(jnp.maximum(p01, 0.0), gamma)
        p = p01 * (hi - lo) + lo

    if cfg.do_affine:
        p01, lo, hi = _rescale01(p)

        rot_ang = jax.random.uniform(keys[4], minval=-5.0, maxval=5.0)
        trans = jax.random.normal(keys[5], (2,))
        trans = trans / jnp.linalg.norm(trans)
        trans = trans * jax.random.uniform(keys[6]) * 20.0
        shear = jax.random.uniform(keys[7], (2,), minval=-1.0, maxval=1.0)
        scale = jax.random.uniform(keys[8], minval=0.9, maxval=1.1)

        # The reference reflect-pads by ceil(dim/2)+extra, warps about the
        # padded center, then center-crops (dataset.py:158-203). Because the
        # matrix conjugates cleanly through the frame translation, that is
        # identical to warping straight into the (h+2*extra) output frame
        # about the ORIGINAL image center with mirror boundary handling —
        # ~4x fewer sampled pixels, no padded intermediate. (Identical as
        # long as displacements stay within one reflection period; the
        # sampled ranges — rot 5deg, shear 1deg, scale 1.1, translate 20px —
        # reach at most ~50px, far below the dim/2 period.)
        m = inverse_affine_matrix(
            (w * 0.5, h * 0.5), rot_ang, (trans[0], trans[1]), scale, (shear[0], shear[1])
        )
        if cfg.pad_data_for_affine:
            mode = "mirror"
        else:
            mode = "constant"

        use_pallas = cfg.use_pallas_warp
        if use_pallas is None:
            from deepfluoro_tpu.ops.pallas.warp import pallas_warp_supported

            use_pallas = mode == "mirror" and pallas_warp_supported()
        elif use_pallas and mode != "mirror":
            # the Pallas kernel only implements mirror boundaries; honoring
            # an explicit use_pallas_warp=True here would silently change
            # the constant-fill semantics pad_data_for_affine=False selects
            use_pallas = False

        if use_pallas:
            from deepfluoro_tpu.ops.pallas.warp import affine_warp_pallas

            # guarded=False: the sampled ranges above (rot 5deg, shear 1deg,
            # scale [0.9,1.1], translate 20px) are statically inside the
            # kernel's band/apron envelope, and the runtime guard's lax.cond
            # would batch into a both-branches select under this vmap
            p_warp = affine_warp_pallas(
                p01, m, order=1,
                out_shape=(h + 2 * extra, w + 2 * extra),
                out_offset_xy=(-extra, -extra),
                guarded=False,
            )
            if s is not None:
                s = affine_warp_pallas(s.astype(jnp.float32), m, order=0, guarded=False)
        else:
            p_warp = affine_warp(
                p01, m, order=1,
                out_shape=(h + 2 * extra, w + 2 * extra),
                out_offset_xy=(-extra, -extra),
                mode=mode,
            )
            if s is not None:
                s = affine_warp(s.astype(jnp.float32), m, order=0, mode=mode)
        p = p_warp * (hi - lo) + lo

        if lands is not None:
            # Exact center of the image warp in index space (see module doc).
            ml = inverse_affine_matrix(
                (w / 2.0 - 0.5, h / 2.0 - 0.5),
                rot_ang,
                (trans[0], trans[1]),
                scale,
                (shear[0], shear[1]),
            )
            lands = transform_landmarks(lands, ml, (h, w))
    else:
        if extra > 0:
            p = jnp.pad(p, ((extra, extra), (extra, extra)), mode="reflect")

    if cfg.do_erase:
        hp2, wp2 = p.shape
        do_erase = jax.random.uniform(keys[9]) < cfg.erase_prob
        num_boxes = jax.random.randint(keys[10], (), 1, cfg.max_erase_boxes + 1)
        box_mean = jnp.array([hp2 * 0.15, wp2 * 0.15])
        rows = jnp.arange(hp2)[:, None]
        cols = jnp.arange(wp2)[None, :]
        box_keys = jax.random.split(keys[11], cfg.max_erase_boxes)
        for b in range(cfg.max_erase_boxes):
            bk = jax.random.split(box_keys[b], 4)
            dims = jnp.round(jax.random.normal(bk[0], (2,)) * box_mean + box_mean)
            dims = jnp.clip(dims, 1, jnp.array([hp2, wp2])).astype(jnp.int32)
            start_r = jnp.floor(
                jax.random.uniform(bk[1]) * (hp2 - dims[0] + 1).astype(jnp.float32)
            ).astype(jnp.int32)
            start_c = jnp.floor(
                jax.random.uniform(bk[2]) * (wp2 - dims[1] + 1).astype(jnp.float32)
            ).astype(jnp.int32)
            active = do_erase & (b < num_boxes)
            mask = (
                (rows >= start_r)
                & (rows < start_r + dims[0])
                & (cols >= start_c)
                & (cols < start_c + dims[1])
            )
            roi_max = jnp.max(jnp.where(mask, p, -jnp.inf))
            roi_min = jnp.min(jnp.where(mask, p, jnp.inf))
            sigma_noise = (roi_max - roi_min) * 0.2
            noise = jax.random.normal(bk[3], p.shape) * sigma_noise
            p = p + jnp.where(mask & active, noise, 0.0)

    return p, s, lands


def _prepare_one(cfg: AugmentConfig, key, p, s, lands):
    """Prepare a single sample: maybe-augment, pad, z-norm, one-hot, heatmaps.

    p: (H, W) float32; s: (H, W) uint8/int or None; lands: (2, L) or None.
    Returns (proj (Hp, Wp, 1), seg_onehot (H, W, C) | None, lands (2, L) |
    None, heats (H, W, L) | None).
    """
    h, w = p.shape
    # the whole chain (pad amounts, warp frames, erase boxes) assumes the
    # reference's square frames (dataset.py:85) — fail at trace time, not
    # with silently wrong geometry
    assert h == w, "only square projections supported (reference dataset.py:85)"
    extra = _extra_pad(cfg, h)

    k_gate, k_aug = jax.random.split(key)

    if cfg.prob_of_aug > 0:
        p_aug, s_aug, l_aug = _augment_proj_seg_lands(cfg, k_aug, p, s, lands)
        p_plain = (
            jnp.pad(p, ((extra, extra), (extra, extra)), mode="reflect") if extra > 0 else p
        )
        take_aug = jax.random.uniform(k_gate) < cfg.prob_of_aug
        p = jnp.where(take_aug, p_aug, p_plain)
        if s is not None:
            s = jnp.where(take_aug, s_aug, s.astype(jnp.float32))
        if lands is not None:
            lands = jnp.where(take_aug, l_aug, lands)
    else:
        if extra > 0:
            p = jnp.pad(p, ((extra, extra), (extra, extra)), mode="reflect")

    if cfg.do_norm_01_scale:
        p = znorm(p)

    seg_onehot = None
    if s is not None:
        labels = jnp.clip(jnp.round(s).astype(jnp.int32), 0, cfg.num_classes - 1)
        seg_onehot = jax.nn.one_hot(labels, cfg.num_classes, dtype=jnp.float32)

    heats = None
    if cfg.include_heat_map and lands is not None:
        heats = synthesize_heatmaps(lands, h, w, sigma=cfg.heat_sigma)

    return p[..., None], seg_onehot, lands, heats


@partial(jax.jit, static_argnums=(0,))
def prepare_batch(cfg: AugmentConfig, key, projs, segs=None, lands=None):
    """Vectorized batch preparation.

    Args:
      cfg: static AugmentConfig.
      key: PRNG key; split per sample.
      projs: (B, H, W) float32.
      segs:  (B, H, W) integer label maps or None.
      lands: (B, 2, L) float32 (inf marks out-of-view) or None.

    Returns dict with 'proj' (B, Hp, Wp, 1) and, when inputs are given,
    'seg' (B, H, W, C) one-hot, 'lands' (B, 2, L), 'heats' (B, H, W, L).
    """
    b = projs.shape[0]
    keys = jax.random.split(key, b)

    def one(k, p, s, l):
        return _prepare_one(cfg, k, p, s, l)

    if segs is not None and lands is not None:
        proj, seg, lnd, heats = jax.vmap(one)(keys, projs, segs, lands)
        return {"proj": proj, "seg": seg, "lands": lnd, "heats": heats}
    if segs is not None:
        fn = lambda k, p, s: _prepare_one(cfg, k, p, s, None)[:2]
        proj, seg = jax.vmap(fn)(keys, projs, segs)
        return {"proj": proj, "seg": seg}
    if lands is not None:
        fn = lambda k, p, l: _prepare_one(cfg, k, p, None, l)
        proj, _, lnd, heats = jax.vmap(fn)(keys, projs, lands)
        return {"proj": proj, "lands": lnd, "heats": heats}
    fn = lambda k, p: _prepare_one(cfg, k, p, None, None)[0]
    proj = jax.vmap(fn)(keys, projs)
    return {"proj": proj}
