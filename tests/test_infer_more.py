"""Tests for ensemble loss evaluation, the single-net seg_dataset alias, and
the fused full-resolution inference program."""

import h5py as h5
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfluoro_tpu.data.fixtures import (
    write_synthetic_dataset,
    write_synthetic_fullres_dataset,
)
from deepfluoro_tpu.data.hdf5 import load_dataset
from deepfluoro_tpu.data.preprocess import make_fused_fullres_infer
from deepfluoro_tpu.infer import seg_dataset
from deepfluoro_tpu.infer import test_dataset_ensemble as ensemble_eval
from deepfluoro_tpu.train import TrainConfig, build_model, make_train_state


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("inf2")
    h5p = write_synthetic_dataset(str(d / "ds.h5"), num_specimens=1, num_projs=6, img_dim=32)
    cfg = TrainConfig(
        num_classes=7, depth=2, init_feats_exp=2, batch_norm=True, padding=True,
        no_max_pool=True, num_lands=14, proj_unet_dim=36,
    )
    model, state = make_train_state(cfg, jax.random.PRNGKey(0), (36, 36))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return d, h5p, cfg, model, variables


class TestEnsembleEval:
    def test_mean_std_shapes(self, setup):
        _, h5p, cfg, model, variables = setup
        data = load_dataset(h5p, [1])
        mean, std = ensemble_eval(
            data, [(model, variables), (model, variables)],
            num_lands=14, batch_size=3, pad_img_dim=36,
        )
        assert np.isfinite(mean) and np.isfinite(std)
        # joint loss bounded in [-1, 1]
        assert -1.0 <= mean <= 1.0

    def test_dice_only_flag(self, setup):
        _, h5p, cfg, model, variables = setup
        data = load_dataset(h5p, [1])
        mean, std = ensemble_eval(
            data, [(model, variables)], num_lands=14, dice_only=True,
            batch_size=3, pad_img_dim=36,
        )
        assert np.isfinite(mean)

    def test_heat_coeff_threading(self, setup):
        """Ensemble loss eval honors the configured heat_coeff: the 0.7 run
        must equal the exact recombination of the dice-only and 0.5 runs."""
        _, h5p, cfg, model, variables = setup
        data = load_dataset(h5p, [1])
        nets = [(model, variables)]
        m05, _ = ensemble_eval(data, nets, num_lands=14, batch_size=3,
                               pad_img_dim=36, heat_coeff=0.5)
        m07, _ = ensemble_eval(data, nets, num_lands=14, batch_size=3,
                               pad_img_dim=36, heat_coeff=0.7)
        mdice, _ = ensemble_eval(data, nets, num_lands=14, dice_only=True,
                                 batch_size=3, pad_img_dim=36)
        heat = (m05 - 0.5 * mdice) / 0.5
        assert m07 == pytest.approx(0.3 * mdice + 0.7 * heat, rel=1e-4)
        assert m05 != pytest.approx(m07, rel=1e-6)

    def test_identical_nets_match_single(self, setup):
        """Averaging K identical nets must equal the single net's loss."""
        _, h5p, cfg, model, variables = setup
        data = load_dataset(h5p, [1])
        m1, _ = ensemble_eval(data, [(model, variables)], num_lands=14,
                                      batch_size=2, pad_img_dim=36)
        m3, _ = ensemble_eval(data, [(model, variables)] * 3, num_lands=14,
                                      batch_size=2, pad_img_dim=36)
        assert m1 == pytest.approx(m3, rel=1e-4)


class TestValidConvTemplate:
    def test_deep_valid_conv_checkpoint_loads(self, tmp_path):
        """A deep padding=False (VALID-conv) checkpoint must rebuild: the
        init template has to absorb per-level 3x3 shrinkage, not just the
        2**depth halvings (previously crashed at load)."""
        from deepfluoro_tpu.infer.ensemble import _template_dim, load_net_from_checkpoint
        from deepfluoro_tpu.train.checkpoint import save_checkpoint

        cfg = TrainConfig(
            num_classes=7, depth=4, init_feats_exp=1, batch_norm=False,
            padding=False, no_max_pool=True, num_lands=14, proj_unet_dim=64,
        )
        dim = _template_dim(cfg)
        assert dim > 2 ** (cfg.depth + 2)  # the old bound was insufficient
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (dim, dim))
        p = str(tmp_path / "valid.pt")
        save_checkpoint(
            p, meta=cfg.to_checkpoint_meta(), params=state.params,
            batch_stats=state.batch_stats, opt_state=state.opt_state,
        )
        model2, variables, cfg2 = load_net_from_checkpoint(p, verbose=False)
        assert cfg2.padding is False and cfg2.depth == 4
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(variables["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSegDatasetSingle:
    def test_output_contract(self, setup, tmp_path):
        _, h5p, cfg, model, variables = setup
        data = load_dataset(h5p, [1], no_seg=True)
        p = str(tmp_path / "out.h5")
        with h5.File(p, "w") as f:
            seg_dataset(data, (model, variables), f, num_lands=14,
                        batch_size=2, pad_img_dim=36)
        with h5.File(p, "r") as f:
            assert f["nn-segs"].shape == (6, 32, 32)
            assert f["nn-heats"].shape == (6, 14, 32, 32)


class TestShardedFullRes:
    def test_matches_unsharded(self, tmp_path, rng):
        """Spatially-sharded full-res inference (H sharded over 'spatial',
        batch over 'data') must reproduce the single-device program."""
        from deepfluoro_tpu.data.preprocess import make_sharded_fullres_infer
        from deepfluoro_tpu.parallel import make_mesh

        cfg = TrainConfig(
            num_classes=7, depth=2, init_feats_exp=2, batch_norm=True, padding=True,
            no_max_pool=True, num_lands=4, proj_unet_dim=28,
        )
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (28, 28))
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        projs = np.asarray(rng.random((2, 148, 148)), np.float32) + 0.1
        rots = np.array([True, False])

        infer1 = make_fused_fullres_infer(model, variables, 2, 28, (148, 148))
        labels1, heats1 = infer1(jnp.asarray(projs), jnp.asarray(rots))

        mesh = make_mesh({"data": 2, "spatial": 4})
        inferN, place = make_sharded_fullres_infer(model, variables, 2, 28, (148, 148), mesh)
        pN, rN = place(projs, rots)
        labelsN, heatsN = inferN(pN, rN)

        np.testing.assert_array_equal(np.asarray(labels1), np.asarray(labelsN))
        np.testing.assert_allclose(np.asarray(heats1), np.asarray(heatsN), atol=1e-5)

    def test_quantized_sharded_matches_unsharded(self, rng):
        """int8 composes with the data x spatial mesh: the sharded w8a8
        program must reproduce the single-device quantized one (the halo
        exchanges partition the quantized convs like the float ones)."""
        from deepfluoro_tpu.data.preprocess import make_quantized_fullres_infer
        from deepfluoro_tpu.parallel import make_mesh

        cfg = TrainConfig(
            num_classes=7, depth=2, init_feats_exp=2, batch_norm=True, padding=True,
            no_max_pool=True, num_lands=4, proj_unet_dim=28,
        )
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (28, 28))
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        projs = np.asarray(rng.random((2, 148, 148)), np.float32) + 0.1
        rots = np.array([True, False])

        infer1 = make_quantized_fullres_infer(
            model, variables, 2, 28, (148, 148), projs, rots
        )
        labels1, heats1 = infer1(jnp.asarray(projs), jnp.asarray(rots))

        mesh = make_mesh({"data": 2, "spatial": 4})
        inferN, place = make_quantized_fullres_infer(
            model, variables, 2, 28, (148, 148), projs, rots, mesh=mesh
        )
        pN, rN = place(projs, rots)
        labelsN, heatsN = inferN(pN, rN)

        np.testing.assert_array_equal(np.asarray(labels1), np.asarray(labelsN))
        np.testing.assert_allclose(np.asarray(heats1), np.asarray(heatsN), atol=1e-5)


class TestFusedFullRes:
    def test_end_to_end_shapes_and_match(self, tmp_path):
        fr = write_synthetic_fullres_dataset(
            str(tmp_path / "fr.h5"), num_specimens=1, num_projs=2, img_dim=148
        )
        cfg = TrainConfig(
            num_classes=7, depth=2, init_feats_exp=2, batch_norm=True, padding=True,
            no_max_pool=True, num_lands=14, proj_unet_dim=28,
        )
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (28, 28))
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        infer = make_fused_fullres_infer(model, variables, ds_factor=2, pad_dim=28, full_hw=(148, 148))

        with h5.File(fr, "r") as f:
            pg = f["17-1882/projections"]
            projs = np.stack([pg["000/image/pixels"][:], pg["001/image/pixels"][:]]).astype(np.float32)
            rots = np.array([bool(pg["000/rot-180-for-up"][()]), bool(pg["001/rot-180-for-up"][()])])

        labels, heats = infer(jnp.asarray(projs), jnp.asarray(rots))
        assert labels.shape == (2, 24, 24)
        assert labels.dtype == jnp.uint8
        assert heats.shape == (2, 24, 24, 14)
        assert np.isfinite(np.asarray(heats)).all()
        assert set(np.unique(np.asarray(labels))) <= set(range(7))

    def test_quantized_matches_float(self, tmp_path):
        """make_quantized_fullres_infer keeps the float program's contract:
        same shapes/dtypes, argmax labels in high agreement (int8 quality
        bound on trained nets: Dice delta -1e-5, BASELINE.md), finite
        heats. Calibration runs the raw calib frames through the SAME
        fused prep the inference program applies."""
        from deepfluoro_tpu.data.preprocess import make_quantized_fullres_infer

        fr = write_synthetic_fullres_dataset(
            str(tmp_path / "fr.h5"), num_specimens=1, num_projs=2, img_dim=148
        )
        cfg = TrainConfig(
            num_classes=7, depth=2, init_feats_exp=2, batch_norm=True, padding=True,
            no_max_pool=True, num_lands=14, proj_unet_dim=28,
        )
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (28, 28))
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        with h5.File(fr, "r") as f:
            pg = f["17-1882/projections"]
            projs = np.stack([pg["000/image/pixels"][:], pg["001/image/pixels"][:]]).astype(np.float32)
            rots = np.array([bool(pg["000/rot-180-for-up"][()]), bool(pg["001/rot-180-for-up"][()])])

        fl = make_fused_fullres_infer(model, variables, 2, 28, (148, 148))
        labels_f, heats_f = fl(jnp.asarray(projs), jnp.asarray(rots))

        qi = make_quantized_fullres_infer(
            model, variables, 2, 28, (148, 148), projs, rots
        )
        labels_q, heats_q = qi(jnp.asarray(projs), jnp.asarray(rots))

        assert labels_q.shape == labels_f.shape and labels_q.dtype == jnp.uint8
        assert heats_q.shape == heats_f.shape
        assert np.isfinite(np.asarray(heats_q)).all()
        agree = float(np.mean(np.asarray(labels_q) == np.asarray(labels_f)))
        assert agree > 0.9, "int8 argmax agreement {:.3f}".format(agree)

        with pytest.raises(ValueError, match="calibration"):
            make_quantized_fullres_infer(
                model, variables, 2, 28, (148, 148),
                np.zeros((0, 148, 148), np.float32), np.zeros((0,), bool),
            )


class TestMapOverNets:
    def test_unroll_and_laxmap_branches_match_vmap(self):
        """map_over_nets == vmap semantics on both sides of the unroll/lax.map
        threshold (the combinator exists purely for MXU performance)."""
        from deepfluoro_tpu.infer.ensemble import map_over_nets

        rng = np.random.default_rng(1)

        def one_net(variables):
            return variables["w"] * 2.0 + variables["b"], jnp.sum(variables["w"])

        for k in (3, 10):  # 3 -> unrolled, 10 -> lax.map
            stacked = {
                "w": jnp.asarray(rng.random((k, 4, 5)), jnp.float32),
                "b": jnp.asarray(rng.random((k, 1, 5)), jnp.float32),
            }
            got = map_over_nets(one_net, stacked)
            want = jax.vmap(one_net)(stacked)
            np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), rtol=1e-6)
            np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]), rtol=1e-6)


class TestSegDatasetEnsembleMesh:
    """seg_dataset_ensemble on a device mesh (cli/test_ensemble
    --ensemble-devices/--dp-devices): sharding the net and batch axes is
    pure parallelism — the written nn-segs/nn-heats must match the
    unsharded run, including the padded final partial batch."""

    def _nets(self, cfg, k):
        out = []
        model = None
        for i in range(k):
            model, state = make_train_state(cfg, jax.random.PRNGKey(i), (36, 36))
            out.append((model, {"params": state.params,
                                "batch_stats": state.batch_stats}))
        return out

    def test_matches_unsharded(self, setup, tmp_path):
        from deepfluoro_tpu.infer import seg_dataset_ensemble
        from deepfluoro_tpu.parallel import make_mesh

        _, h5p, cfg, _, _ = setup
        nets = self._nets(cfg, 4)
        data = load_dataset(h5p, [1], no_seg=True)  # 6 projections

        p1 = str(tmp_path / "plain.h5")
        with h5.File(p1, "w") as f:
            seg_dataset_ensemble(data, nets, f, num_lands=14,
                                 batch_size=4, pad_img_dim=36)

        # 4 nets over 2 ensemble-devices x batch 4 over 2 data-devices;
        # 6 projections -> the final 2-image batch exercises the padding
        mesh = make_mesh({"ensemble": 2, "data": 2}, devices=jax.devices()[:4])
        p2 = str(tmp_path / "mesh.h5")
        times: list = []
        with h5.File(p2, "w") as f:
            seg_dataset_ensemble(data, nets, f, num_lands=14,
                                 batch_size=4, pad_img_dim=36,
                                 mesh=mesh, times=times)

        with h5.File(p1, "r") as f1, h5.File(p2, "r") as f2:
            np.testing.assert_array_equal(f1["nn-segs"][:], f2["nn-segs"][:])
            np.testing.assert_allclose(
                f1["nn-heats"][:], f2["nn-heats"][:], atol=1e-5
            )
        assert len(times) == 6  # per real image, not per padded slot

    def test_cli_flags(self, setup, tmp_path):
        """CLI-level: --ensemble-devices/--dp-devices reproduce the plain
        CLI run's outputs (checkpoints written first, as a user would)."""
        from deepfluoro_tpu.cli import test_ensemble as te_cli
        from deepfluoro_tpu.train.checkpoint import save_checkpoint

        _, h5p, cfg, _, _ = setup
        nets = self._nets(cfg, 2)
        paths = []
        for i, (_, variables) in enumerate(nets):
            p = str(tmp_path / "net{}.pt".format(i))
            save_checkpoint(
                p, meta=cfg.to_checkpoint_meta(), epoch=1, best_valid_loss=-0.5,
                params=variables["params"], batch_stats=variables["batch_stats"],
            )
            paths.append(p)

        out1 = str(tmp_path / "o1.h5")
        te_cli.main([h5p, out1, "--pats", "1", "--nets", *paths,
                     "--batch-size", "2", "--no-gpu"])
        out2 = str(tmp_path / "o2.h5")
        te_cli.main([h5p, out2, "--pats", "1", "--nets", *paths,
                     "--batch-size", "2", "--no-gpu",
                     "--ensemble-devices", "2", "--dp-devices", "2"])

        with h5.File(out1, "r") as f1, h5.File(out2, "r") as f2:
            np.testing.assert_array_equal(f1["nn-segs"][:], f2["nn-segs"][:])
            np.testing.assert_allclose(
                f1["nn-heats"][:], f2["nn-heats"][:], atol=1e-5
            )

    def test_cli_rejects_mixed_configs(self, setup, tmp_path):
        """Members trained at different padded resolutions (or class/landmark
        counts) cannot share one ensemble program; the CLI must fail loudly
        instead of silently running nets at the wrong resolution."""
        import dataclasses

        import pytest

        from deepfluoro_tpu.cli import test_ensemble as te_cli
        from deepfluoro_tpu.train.checkpoint import save_checkpoint

        _, h5p, cfg, _, _ = setup
        cfg_b = dataclasses.replace(cfg, proj_unet_dim=cfg.proj_unet_dim + 8)
        paths = []
        for i, c in enumerate([cfg, cfg_b]):
            _, state = make_train_state(c, jax.random.PRNGKey(i), (36, 36))
            p = str(tmp_path / "mixed{}.pt".format(i))
            save_checkpoint(
                p, meta=c.to_checkpoint_meta(), epoch=1,
                params=state.params, batch_stats=state.batch_stats,
            )
            paths.append(p)

        out = str(tmp_path / "mixed_out.h5")
        with pytest.raises(ValueError, match="proj_unet_dim"):
            te_cli.main([h5p, out, "--pats", "1", "--nets", *paths, "--no-gpu"])


class TestSegFullresCLI:
    def test_fused_cli_matches_two_step_path(self, tmp_path):
        """cli.seg_fullres (raw archive -> fused preprocess+ensemble ->
        nn-segs/nn-heats) must reproduce the two-step workflow
        (full_res_to_preprocessed -> seg_dataset_ensemble) exactly on
        labels and closely on heats — both run crop/log/rot/downsample/
        pad/znorm with the same math, one fused and one through an
        intermediate archive. Also pins the land-names passthrough and the
        padded final partial batch (5 projs, batch 2)."""
        from deepfluoro_tpu.cli import seg_fullres as sf_cli
        from deepfluoro_tpu.data.hdf5 import get_land_names_from_dataset, load_dataset
        from deepfluoro_tpu.data.preprocess import full_res_to_preprocessed
        from deepfluoro_tpu.infer import load_net_from_checkpoint, seg_dataset_ensemble
        from deepfluoro_tpu.train.checkpoint import save_checkpoint

        fr = write_synthetic_fullres_dataset(
            str(tmp_path / "fr.h5"), num_specimens=1, num_projs=5, img_dim=148
        )
        cfg = TrainConfig(
            num_classes=7, depth=2, init_feats_exp=2, batch_norm=True, padding=True,
            no_max_pool=True, num_lands=14, proj_unet_dim=28,
        )
        paths = []
        for i in range(2):
            _, state = make_train_state(cfg, jax.random.PRNGKey(i), (28, 28))
            p = str(tmp_path / "net{}.pt".format(i))
            save_checkpoint(
                p, meta=cfg.to_checkpoint_meta(), epoch=1,
                params=state.params, batch_stats=state.batch_stats,
            )
            paths.append(p)

        out_fused = str(tmp_path / "fused.h5")
        sf_cli.main([fr, out_fused, "--ds-factor", "2", "--nets", *paths,
                     "--pats", "17-1882", "--batch-size", "2", "--no-gpu"])

        pp = full_res_to_preprocessed(fr, str(tmp_path / "pp.h5"), 2)
        data = load_dataset(pp, [1], no_seg=True)
        out_two = str(tmp_path / "two.h5")
        nets = [load_net_from_checkpoint(p, verbose=False)[:2] for p in paths]
        with h5.File(out_two, "w") as f:
            seg_dataset_ensemble(
                data, nets, f, num_lands=14, batch_size=2, pad_img_dim=28,
            )

        with h5.File(out_fused, "r") as ff, h5.File(out_two, "r") as ft:
            assert ff["nn-segs"].shape == ft["nn-segs"].shape == (5, 24, 24)
            np.testing.assert_array_equal(ff["nn-segs"][:], ft["nn-segs"][:])
            np.testing.assert_allclose(
                ff["nn-heats"][:], ft["nn-heats"][:], atol=1e-4
            )
            names = get_land_names_from_dataset(out_fused)
            assert len(names) == 14

    def test_rejects_wrong_rung_nets(self, tmp_path):
        """Nets trained at a smaller geometry than the requested rung must
        be rejected loudly (proj_unet_dim < frame size)."""
        from deepfluoro_tpu.cli import seg_fullres as sf_cli
        from deepfluoro_tpu.train.checkpoint import save_checkpoint

        fr = write_synthetic_fullres_dataset(
            str(tmp_path / "fr.h5"), num_specimens=1, num_projs=1, img_dim=148
        )
        cfg = TrainConfig(
            num_classes=7, depth=2, init_feats_exp=2, batch_norm=True, padding=True,
            no_max_pool=True, num_lands=0, proj_unet_dim=28,
        )
        _, state = make_train_state(cfg, jax.random.PRNGKey(0), (28, 28))
        p = str(tmp_path / "net.pt")
        save_checkpoint(
            p, meta=cfg.to_checkpoint_meta(), epoch=1,
            params=state.params, batch_stats=state.batch_stats,
        )
        with pytest.raises(ValueError, match="proj_unet_dim"):
            sf_cli.main([fr, str(tmp_path / "o.h5"), "--ds-factor", "1",
                         "--nets", p, "--no-gpu"])
