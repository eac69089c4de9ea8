"""Tests for the int8 post-training-quantized inference path
(infer/quantized.py).

Strategy:
- the float replay of the traversal must match ``model.apply`` exactly —
  this pins the mirrored graph structure to the Flax module for every
  architectural flag;
- an exact-arithmetic fixture (one-hot +-1 kernels, integer activations,
  unit scales) makes symmetric int8 quantization lossless, so the whole
  int8 plumbing (weight quant, activation quant, s8xs8->s32 convs,
  dequant) must reproduce the float forward bit-for-bit;
- a statistical fixture (random weights, calibrated scales) bounds the
  quantization noise on realistic values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfluoro_tpu.infer.quantized import (
    calibrate,
    calibration_stats,
    float_apply,
    quantize_weight,
    quantize_weights,
    quantized_apply,
)
from deepfluoro_tpu.models.unet import UNet


def _init(model, shape, seed=0):
    x = jnp.asarray(np.random.default_rng(seed).random(shape), jnp.float32)
    variables = jax.jit(lambda k, xx: model.init(k, xx, train=False))(
        jax.random.PRNGKey(seed), x
    )
    return variables, x


CONFIGS = [
    # paper-style: padding, BN, learned downsample, lands head
    dict(n_classes=4, depth=3, wf=2, padding=True, batch_norm=True,
         max_pool=False, num_lands=3),
    # upsample decoder
    dict(n_classes=3, depth=2, wf=2, padding=True, batch_norm=False,
         up_mode="upsample", num_lands=2),
    # circular padding
    dict(n_classes=3, depth=2, wf=2, padding=True, pad_mode="circular",
         batch_norm=True, num_lands=0),
    # VALID convs, no residual, max pool, lands conv stack, raw logits
    dict(n_classes=3, depth=2, wf=2, padding=False, do_res=False,
         max_pool=True, num_lands=2, lands_block_depth=1,
         lands_num_1x1=1, do_soft_max=False),
]


@pytest.mark.parametrize("kw", CONFIGS, ids=["paper", "upsample", "circ", "valid"])
def test_float_replay_matches_flax(kw):
    model = UNet(**kw)
    dim = 48 if not kw.get("padding", False) else 32
    variables, x = _init(model, (2, dim, dim, 1))
    want = model.apply(variables, x, train=False)
    got = float_apply(model, variables, x)
    for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=0, atol=0)


def _selector_kernel(shape, rng):
    """A kernel with exactly one +-1 tap per output channel: conv output =
    (+-) one input element, so integer activations never grow."""
    kh, kw, ci, co = shape
    k = np.zeros(shape, np.float32)
    for o in range(co):
        k[rng.integers(kh), rng.integers(kw), o % ci, o] = rng.choice([-1.0, 1.0])
    return jnp.asarray(k)


@pytest.mark.parametrize("pad_mode", ["zeros", "circular"])
def test_int8_exact_on_selector_network(pad_mode):
    """With one-hot +-1 kernels, zero biases, integer inputs and unit
    activation scales, int8 quantization is exact through every layer:
    activations re-snap to integers at each quantization point, so the
    only float artifact left in the outputs is the final dequantization's
    127*fl(1/127) factor (~1 ulp)."""
    model = UNet(
        n_classes=3, depth=3, wf=1, padding=True, pad_mode=pad_mode,
        batch_norm=False, max_pool=False, num_lands=2, do_soft_max=False,
    )
    variables, _ = _init(model, (1, 16, 16, 1))
    rng = np.random.default_rng(3)

    def rewrite(tree):
        out = {}
        for name, sub in tree.items():
            if isinstance(sub, dict):
                out[name] = rewrite(sub)
            elif name == "kernel":
                out[name] = _selector_kernel(sub.shape, rng)
            else:  # bias
                out[name] = jnp.zeros_like(sub)
        return out

    variables = {"params": rewrite(jax.tree.map(np.asarray, variables["params"]))}

    x = jnp.asarray(
        rng.integers(-7, 8, (2, 16, 16, 1)).astype(np.float32)
    )
    want_seg, want_heats = float_apply(model, variables, x)

    _, stats = calibration_stats(model, variables, x)
    scales = {k: jnp.float32(1.0) for k in stats}
    qweights = quantize_weights(model, variables)
    got_seg, got_heats = quantized_apply(model, qweights, variables, scales, x)

    np.testing.assert_allclose(
        np.asarray(got_seg), np.asarray(want_seg), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_heats), np.asarray(want_heats), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("up_mode", ["upconv", "upsample"])
def test_quantized_close_on_random_network(up_mode):
    """Calibrated int8 inference stays close to float on a random model:
    the quantization noise through a depth-3 net must not disturb relative
    outputs beyond a few percent."""
    model = UNet(
        n_classes=4, depth=3, wf=3, padding=True, batch_norm=True,
        max_pool=False, num_lands=3, up_mode=up_mode,
    )
    variables, x = _init(model, (2, 32, 32, 1), seed=1)

    scales = calibrate(model, variables, [x])
    qweights = quantize_weights(model, variables)
    want_seg, want_heats = float_apply(model, variables, x)
    got_seg, got_heats = quantized_apply(model, qweights, variables, scales, x)

    def rel_err(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)

    assert rel_err(got_seg, want_seg) < 0.05, rel_err(got_seg, want_seg)
    assert rel_err(got_heats, want_heats) < 0.10, rel_err(got_heats, want_heats)
    # argmax label agreement: the decisions, not just the values. A
    # random-INIT net's class logits are near-tied everywhere, so a few
    # percent of flips is expected noise here (trained-model agreement is
    # the real quality gate — measured on the synthetic archive, see
    # BASELINE.md's int8 row); this bound just catches gross breakage.
    agree = np.mean(
        np.argmax(np.asarray(got_seg), -1) == np.argmax(np.asarray(want_seg), -1)
    )
    assert agree > 0.9, agree


class TestHybridFloatLevels:
    """--int8-float-levels (VERDICT r4 weak #3): the hybrid mode keeps the
    finest N levels in float and quantizes only the deep MXU-bound levels
    (the big-frame rungs lose on early-level s32 accumulator traffic)."""

    def _setup(self, depth=3):
        model = UNet(
            n_classes=4, depth=depth, wf=3, padding=True, batch_norm=True,
            max_pool=False, num_lands=3,
        )
        variables, x = _init(model, (2, 32, 32, 1), seed=1)
        scales = calibrate(model, variables, [x])
        qweights = quantize_weights(model, variables)
        return model, variables, x, scales, qweights

    def test_level_filter_mapping(self):
        from deepfluoro_tpu.infer.quantized import make_level_filter

        assert make_level_filter(0, 6) is None
        f = make_level_filter(2, depth=6)  # levels 0,1 float; >=2 int8
        # encoder: down_i / downsample_i run at level i
        assert not f("down_0/x0") and not f("down_1/x1")
        assert not f("downsample_1/x")
        assert f("down_2/x0") and f("downsample_2/x") and f("down_5/x0")
        # decoder: up_j produces level depth-2-j
        assert f("up_0/up_in") and f("up_0/conv_block/x0")  # level 4: int8
        assert f("up_2/conv_block/x0")                      # level 2: int8
        assert not f("up_3/conv_block/x1")                  # level 1: float
        # heads run at the finest level
        assert not f("seg/x") and not f("lands_1x1_0/x")
        assert not f("lands_block/x0")

    def test_all_levels_float_is_bitexact_float(self):
        """float_levels >= depth opts every point out — the 'quantized'
        engine must then reproduce the float replay EXACTLY (every conv
        takes the float path from the full-precision kernels)."""
        from deepfluoro_tpu.infer.quantized import make_level_filter

        model, variables, x, scales, qweights = self._setup()
        want = float_apply(model, variables, x)
        got = quantized_apply(
            model, qweights, variables, scales, x,
            int8_points=make_level_filter(model.depth, model.depth),
        )
        for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    def test_partial_hybrid_between_float_and_int8(self):
        """float_levels=1 must (a) still run int8 somewhere (differ from
        float), (b) not be farther from float than the fully-quantized
        net, and (c) differ from full int8 (the early levels changed)."""
        from deepfluoro_tpu.infer.quantized import make_level_filter

        model, variables, x, scales, qweights = self._setup()
        want_seg, _ = float_apply(model, variables, x)
        full_seg, _ = quantized_apply(model, qweights, variables, scales, x)
        hyb_seg, _ = quantized_apply(
            model, qweights, variables, scales, x,
            int8_points=make_level_filter(1, model.depth),
        )

        def rel_err(a, b):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)

        e_full = rel_err(full_seg, want_seg)
        e_hyb = rel_err(hyb_seg, want_seg)
        assert e_hyb > 1e-7  # int8 still active on the deep levels
        assert e_hyb <= e_full * 1.05, (e_hyb, e_full)
        assert rel_err(hyb_seg, full_seg) > 1e-7

    def test_cli_flag_reaches_engine(self, tmp_path):
        """--int8-float-levels=depth through the single-net CLI path must
        reproduce the float run's labels exactly (same mechanism as
        test_all_levels_float_is_bitexact_float, driven end-to-end)."""
        import h5py

        from deepfluoro_tpu.data.fixtures import write_synthetic_dataset
        from deepfluoro_tpu.data.hdf5 import load_dataset
        from deepfluoro_tpu.infer.ensemble import seg_dataset_ensemble
        from deepfluoro_tpu.train import TrainConfig, make_train_state

        h5 = str(tmp_path / "d.h5")
        write_synthetic_dataset(h5, num_specimens=1, num_projs=3, img_dim=32)
        data = load_dataset(h5, [1])
        cfg = TrainConfig(
            num_classes=7, batch_size=3, proj_unet_dim=36, depth=2,
            init_feats_exp=3, batch_norm=True, padding=True,
            no_max_pool=True, num_lands=14,
        )
        _, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        from deepfluoro_tpu.train import build_model

        model = build_model(cfg)
        mv = [(model, {"params": state.params, "batch_stats": state.batch_stats})]

        outs = {}
        for name, kw in (
            ("float", dict()),
            ("int8_all_float", dict(quantized=True, calib_batches=1,
                                    int8_float_levels=cfg.depth)),
        ):
            p = str(tmp_path / (name + ".h5"))
            with h5py.File(p, "w") as f:
                seg_dataset_ensemble(
                    data, mv, f, num_lands=14, batch_size=3,
                    pad_img_dim=36, num_classes=7, **kw
                )
            with h5py.File(p, "r") as f:
                outs[name] = np.asarray(f["nn-segs"][:])
        np.testing.assert_array_equal(outs["float"], outs["int8_all_float"])


def test_quantize_weights_covers_every_conv():
    model = UNet(
        n_classes=3, depth=3, wf=2, padding=True, batch_norm=True,
        max_pool=False, num_lands=2,
    )
    variables, _ = _init(model, (1, 16, 16, 1))
    qweights = quantize_weights(model, variables)
    kernels = [
        "/".join(map(str, p))
        for p, leaf in jax.tree_util.tree_flatten_with_path(
            variables["params"]
        )[0] if "kernel" in str(p)
    ]
    n_kernels = sum(
        1 for p in jax.tree_util.tree_leaves_with_path(variables["params"])
        if "kernel" in str(p[0])
    )
    assert len(qweights) == n_kernels, (sorted(qweights), kernels)
    for kq, ws in qweights.values():
        assert kq.dtype == jnp.int8
        assert ws.shape == (kq.shape[-1],)


def test_quantize_weight_per_channel_roundtrip():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(0, [[0.1, 3.0]], (4, 2)).reshape(1, 1, 4, 2))
    kq, scale = quantize_weight(k)
    # each channel uses its own scale: dequant error bounded by scale/2
    err = np.abs(np.asarray(kq, np.float32) * np.asarray(scale) - np.asarray(k))
    assert (err <= np.asarray(scale) / 2 + 1e-7).all()
    # and the big channel's scale did not bleed into the small one
    assert scale[0] < scale[1] / 5


def test_calibrate_aggregates_max_over_batches():
    model = UNet(n_classes=2, depth=2, wf=1, padding=True, num_lands=0)
    variables, x = _init(model, (1, 16, 16, 1))
    s1 = calibrate(model, variables, [x])
    s2 = calibrate(model, variables, [x, 3.0 * x])
    assert set(s1) == set(s2)
    assert float(s2["down_0/x0"]) >= float(s1["down_0/x0"]) * 2.9


def test_quantized_ensemble_laxmap_fallback_beyond_unroll_limit():
    """For K past _UNROLL_NET_LIMIT the quantized forward must fall through
    map_over_nets' lax.map path (bounding compile time) and still average
    exactly like a hand-unrolled per-net loop — int8 kernels, per-net
    scales dict and all riding the mapped axis."""
    from deepfluoro_tpu.infer.ensemble import _UNROLL_NET_LIMIT
    from deepfluoro_tpu.infer.quantized import (
        make_quantized_ensemble_forward,
        prepare_quantized_ensemble,
    )

    k = _UNROLL_NET_LIMIT + 1
    model = UNet(n_classes=3, depth=2, wf=1, padding=True, batch_norm=False,
                 max_pool=False, num_lands=2)
    members = []
    for i in range(k):
        variables, x = _init(model, (2, 16, 16, 1), seed=i)
        members.append((model, variables))
    qargs = prepare_quantized_ensemble(members, [x])
    assert jax.tree.leaves(qargs)[0].shape[0] == k

    fwd = make_quantized_ensemble_forward(model, num_lands=2, orig_hw=(16, 16))
    avg_seg, avg_heats, labels = fwd(qargs, x)

    # hand-unrolled oracle with the same scales/qweights
    from deepfluoro_tpu.infer.ensemble import postprocess_net_output
    from deepfluoro_tpu.infer.quantized import quantized_member_apply

    segs, heats = [], []
    for i in range(k):
        member = jax.tree.map(lambda a: a[i], qargs)
        s, h = postprocess_net_output(
            quantized_member_apply(model, member, x), (16, 16), 2
        )
        segs.append(np.asarray(s))
        heats.append(np.asarray(h))
    np.testing.assert_allclose(
        np.asarray(avg_seg), np.mean(segs, axis=0), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(avg_heats), np.mean(heats, axis=0), atol=1e-6
    )
    assert labels.dtype == jnp.uint8


# ---------------------------------------------------------------------------
# the --int8 inference surface (cli/test_ensemble + seg_dataset_ensemble)


class TestInt8EnsembleSurface:
    def _checkpoints(self, tmp_path, cfg, k):
        from deepfluoro_tpu.train import make_train_state
        from deepfluoro_tpu.train.checkpoint import save_checkpoint

        paths = []
        for i in range(k):
            _, state = make_train_state(cfg, jax.random.PRNGKey(i), (36, 36))
            p = str(tmp_path / "net{}.pt".format(i))
            save_checkpoint(
                p, meta=cfg.to_checkpoint_meta(), epoch=1, best_valid_loss=-0.5,
                params=state.params, batch_stats=state.batch_stats,
            )
            paths.append(p)
        return paths

    def test_cli_int8_matches_library_and_tracks_float(self, tmp_path):
        """`--int8` must produce exactly the library-level quantized run
        (pins the CLI plumbing: calibration protocol, scale/weight reuse,
        output contract), and its heatmaps must track the float run closely
        (the quantization-noise bound; argmax agreement on a random-init
        net is inherently loose, see test_quantized_close_on_random_network)."""
        import h5py as h5

        from deepfluoro_tpu.cli import test_ensemble as te_cli
        from deepfluoro_tpu.data.fixtures import write_synthetic_dataset
        from deepfluoro_tpu.data.hdf5 import load_dataset
        from deepfluoro_tpu.infer import (
            load_net_from_checkpoint,
            seg_dataset_ensemble,
        )
        from deepfluoro_tpu.train import TrainConfig

        h5p = write_synthetic_dataset(
            str(tmp_path / "ds.h5"), num_specimens=1, num_projs=6, img_dim=32
        )
        cfg = TrainConfig(
            num_classes=7, depth=2, init_feats_exp=2, batch_norm=True,
            padding=True, no_max_pool=True, num_lands=14, proj_unet_dim=36,
        )
        paths = self._checkpoints(tmp_path, cfg, 2)

        out_q = str(tmp_path / "q.h5")
        te_cli.main([h5p, out_q, "--pats", "1", "--nets", *paths,
                     "--batch-size", "4", "--no-gpu", "--int8",
                     "--int8-calib-batches", "1"])

        # library-level quantized run with the same calibration protocol
        nets = [load_net_from_checkpoint(p, verbose=False) for p in paths]
        data = load_dataset(h5p, [1], no_seg=True)
        out_lib = str(tmp_path / "lib.h5")
        with h5.File(out_lib, "w") as f:
            seg_dataset_ensemble(
                data, [(m, v) for m, v, _ in nets], f, num_lands=14,
                batch_size=4, pad_img_dim=36, quantized=True, calib_batches=1,
            )
        out_f = str(tmp_path / "f.h5")
        with h5.File(out_f, "w") as f:
            seg_dataset_ensemble(
                data, [(m, v) for m, v, _ in nets], f, num_lands=14,
                batch_size=4, pad_img_dim=36,
            )

        with h5.File(out_q, "r") as fq, h5.File(out_lib, "r") as fl, \
             h5.File(out_f, "r") as ff:
            np.testing.assert_array_equal(fq["nn-segs"][:], fl["nn-segs"][:])
            np.testing.assert_allclose(
                fq["nn-heats"][:], fl["nn-heats"][:], atol=1e-6
            )
            # int8 vs float: min-max-normalized heatmaps stay close
            np.testing.assert_allclose(
                fq["nn-heats"][:], ff["nn-heats"][:], atol=0.15
            )
            assert fq["nn-segs"].dtype == np.uint8
            assert fq["nn-segs"].shape == ff["nn-segs"].shape

    def test_cli_int8_composes_with_meshes(self, tmp_path):
        """--int8 x --ensemble-devices/--dp-devices: sharding the quantized
        member tree is pure parallelism — same calibration protocol, same
        scales/qweights — so nn-segs must match the unsharded int8 run
        exactly and nn-heats to psum-reordering tolerance, including the
        padded final partial batch (6 projections at batch 4)."""
        import h5py as h5

        from deepfluoro_tpu.cli import test_ensemble as te_cli
        from deepfluoro_tpu.data.fixtures import write_synthetic_dataset
        from deepfluoro_tpu.train import TrainConfig

        h5p = write_synthetic_dataset(
            str(tmp_path / "ds.h5"), num_specimens=1, num_projs=6, img_dim=32
        )
        cfg = TrainConfig(
            num_classes=7, depth=2, init_feats_exp=2, batch_norm=True,
            padding=True, no_max_pool=True, num_lands=14, proj_unet_dim=36,
        )
        paths = self._checkpoints(tmp_path, cfg, 4)

        out_plain = str(tmp_path / "plain.h5")
        te_cli.main([h5p, out_plain, "--pats", "1", "--nets", *paths,
                     "--batch-size", "4", "--no-gpu", "--int8",
                     "--int8-calib-batches", "1"])
        out_mesh = str(tmp_path / "mesh.h5")
        te_cli.main([h5p, out_mesh, "--pats", "1", "--nets", *paths,
                     "--batch-size", "4", "--no-gpu", "--int8",
                     "--int8-calib-batches", "1",
                     "--ensemble-devices", "2", "--dp-devices", "2"])

        with h5.File(out_plain, "r") as f1, h5.File(out_mesh, "r") as f2:
            np.testing.assert_array_equal(f1["nn-segs"][:], f2["nn-segs"][:])
            np.testing.assert_allclose(
                f1["nn-heats"][:], f2["nn-heats"][:], atol=1e-5
            )

    def test_int8_rejects_zero_calib_batches(self, tmp_path):
        """calib_batches < 1 used to fail later with an opaque KeyError in
        the quantized forward's tracing; it must be a clear error at the
        boundary."""
        from deepfluoro_tpu.cli import test_ensemble as te_cli
        from deepfluoro_tpu.data.fixtures import write_synthetic_dataset
        from deepfluoro_tpu.train import TrainConfig

        h5p = write_synthetic_dataset(
            str(tmp_path / "ds.h5"), num_specimens=1, num_projs=2, img_dim=32
        )
        cfg = TrainConfig(
            num_classes=7, depth=2, init_feats_exp=2, batch_norm=True,
            padding=True, no_max_pool=True, num_lands=14, proj_unet_dim=36,
        )
        paths = self._checkpoints(tmp_path, cfg, 1)
        with pytest.raises(ValueError, match="calibration batch"):
            te_cli.main([h5p, str(tmp_path / "o.h5"), "--pats", "1",
                         "--nets", *paths, "--no-gpu", "--int8",
                         "--int8-calib-batches", "0"])
