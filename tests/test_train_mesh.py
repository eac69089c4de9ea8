"""Mesh-sharded fit(): the flagship single-fold training path on a device
mesh (VERDICT r2 item 1). The same fit() loop — device-resident fused step
or streaming — must reproduce the single-device run exactly when its batch
is sharded over 'data' (and rows over 'spatial'), at the CLI level too.
Multi-host fit() coverage lives in tests/test_multiprocess.py +
tests/mh_fit_worker.py (real jax.distributed processes).
"""

import os

import numpy as np
import jax
import pytest

from deepfluoro_tpu.data.fixtures import write_synthetic_dataset
from deepfluoro_tpu.parallel import make_mesh
from deepfluoro_tpu.train import TrainConfig, fit


@pytest.fixture(scope="module")
def fixture_h5(tmp_path_factory):
    path = tmp_path_factory.mktemp("train_mesh") / "synthetic.h5"
    return write_synthetic_dataset(str(path), num_specimens=3, num_projs=8, img_dim=32)


def small_cfg(**kw):
    base = dict(
        num_classes=7,
        batch_size=4,
        proj_unet_dim=36,
        optim_type="sgd",
        init_lr=0.05,
        momentum=0.9,
        nesterov=True,
        wgt_decay=1e-4,
        lr_sched_meth="plateau",
        max_num_epochs=1,
        depth=2,
        init_feats_exp=3,
        batch_norm=True,
        padding=True,
        no_max_pool=True,
        num_lands=14,
        heat_coeff=0.5,
        train_valid_split=0.8,
        data_aug=False,
        checkpoint_freq=1,
        seed=0,
    )
    base.update(kw)
    return TrainConfig(**base)


def run_fit(fixture_h5, tmp_path, tag, **fit_kw):
    cfg = small_cfg()
    out = fit(
        fixture_h5, [1, 2], cfg,
        checkpoint_filename=str(tmp_path / f"c{tag}.pt"),
        best_valid_filename=str(tmp_path / f"b{tag}.pt"),
        train_loss_txt=str(tmp_path / f"t{tag}.txt"),
        valid_loss_txt=str(tmp_path / f"v{tag}.txt"),
        verbose=False,
        **fit_kw,
    )
    train_losses = [float(x) for x in open(str(tmp_path / f"t{tag}.txt"))]
    valid_losses = [float(x) for x in open(str(tmp_path / f"v{tag}.txt"))]
    return out, train_losses, valid_losses


class TestMeshFit:
    def test_data_spatial_mesh_matches_single_device(self, tmp_path, fixture_h5):
        """fit() on a {'data': 4, 'spatial': 2} mesh (the full 2-D layout:
        batch over data, image rows over spatial with conv halo exchange)
        must reproduce the plain single-device run: same per-step train
        losses, same validation losses, same final parameters."""
        out1, tl1, vl1 = run_fit(fixture_h5, tmp_path, "plain")

        mesh = make_mesh({"data": 4, "spatial": 2})
        out2, tl2, vl2 = run_fit(
            fixture_h5, tmp_path, "mesh", mesh=mesh, shard_spatial=True
        )

        np.testing.assert_allclose(tl2, tl1, rtol=1e-5)
        np.testing.assert_allclose(vl2, vl1, rtol=1e-5)
        for a, b in zip(
            jax.tree.leaves(out1["state"].params), jax.tree.leaves(out2["state"].params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
        # the mesh run's state really lives on the mesh (replicated)
        leaf = jax.tree.leaves(out2["state"].params)[0]
        assert len(leaf.sharding.device_set) == 8

    def test_stream_data_on_mesh_matches_single_device(self, tmp_path, fixture_h5):
        """stream_data=True with a pure-DP mesh: PrefetchIterator places each
        batch sharded over 'data' and the streaming step reproduces the
        plain run."""
        out1, tl1, vl1 = run_fit(fixture_h5, tmp_path, "plain_s")

        mesh = make_mesh({"data": 4}, devices=jax.devices()[:4])
        out2, tl2, vl2 = run_fit(
            fixture_h5, tmp_path, "mesh_s", mesh=mesh, stream_data=True
        )

        np.testing.assert_allclose(tl2, tl1, rtol=1e-5)
        np.testing.assert_allclose(vl2, vl1, rtol=1e-5)
        for a, b in zip(
            jax.tree.leaves(out1["state"].params), jax.tree.leaves(out2["state"].params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_resume_onto_mesh(self, tmp_path, fixture_h5):
        """A checkpoint written by a plain run resumes onto a mesh (state is
        re-placed replicated) and continues training."""
        ck = str(tmp_path / "cr.pt")
        cfg = small_cfg(max_num_epochs=1)
        fit(
            fixture_h5, [1, 2], cfg,
            checkpoint_filename=ck,
            best_valid_filename=str(tmp_path / "br.pt"),
            train_loss_txt=str(tmp_path / "tr.txt"),
            valid_loss_txt=str(tmp_path / "vr.txt"),
            verbose=False,
        )
        mesh = make_mesh({"data": 4, "spatial": 2})
        cfg2 = small_cfg(max_num_epochs=2)
        out = fit(
            fixture_h5, [1, 2], cfg2,
            checkpoint_filename=ck,
            best_valid_filename=str(tmp_path / "br.pt"),
            train_loss_txt=str(tmp_path / "tr.txt"),
            valid_loss_txt=str(tmp_path / "vr.txt"),
            verbose=False, mesh=mesh, shard_spatial=True,
        )
        assert out["epoch"] == 2


class TestMeshCLI:
    def test_cli_dp_spatial_matches_plain_cli(self, tmp_path, fixture_h5):
        """CLI-level parity (VERDICT r2 item 1 'done' criterion (a)): the
        train CLI with --dp-devices/--spatial-devices reproduces the plain
        CLI run's loss streams exactly."""
        from deepfluoro_tpu.cli.train import main

        common = [
            fixture_h5, "--train-pats", "1,2", "--num-classes", "7",
            "--batch-size", "4", "--unet-img-dim", "36", "--unet-num-lvls", "2",
            "--unet-init-feats-exp", "3", "--unet-batch-norm", "--unet-padding",
            "--unet-no-max-pool", "--use-lands", "--train-valid-split", "0.8",
            "--max-num-epochs", "1", "--lr-sched", "plateau", "--init-lr", "0.05",
            "--momentum", "0.9", "--nesterov", "--wgt-decay", "1e-4",
            "--no-gpu",
        ]

        def run(tag, extra):
            args = common + [
                "--checkpoint-net", str(tmp_path / f"c{tag}.pt"),
                "--best-net", str(tmp_path / f"b{tag}.pt"),
                "--train-loss-txt", str(tmp_path / f"t{tag}.txt"),
                "--valid-loss-txt", str(tmp_path / f"v{tag}.txt"),
            ] + extra
            main(args)
            return (
                [float(x) for x in open(str(tmp_path / f"t{tag}.txt"))],
                [float(x) for x in open(str(tmp_path / f"v{tag}.txt"))],
            )

        tl1, vl1 = run("plain", [])
        tl2, vl2 = run("mesh", ["--dp-devices", "4", "--spatial-devices", "2"])
        np.testing.assert_allclose(tl2, tl1, rtol=1e-5)
        np.testing.assert_allclose(vl2, vl1, rtol=1e-5)
        assert os.path.exists(str(tmp_path / "cmesh.pt"))


class TestTensorParallelFit:
    """fit() with a 'model' mesh axis: parameters/optimizer state live
    channel-sharded (tensor parallelism), composing with 'data' — must
    reproduce the single-device run and write a normal (gathered)
    checkpoint."""

    def test_dp_tp_mesh_matches_single_device(self, tmp_path, fixture_h5):
        out1, tl1, vl1 = run_fit(fixture_h5, tmp_path, "plain_tp")

        mesh = make_mesh({"data": 2, "model": 2}, devices=jax.devices()[:4])
        out2, tl2, vl2 = run_fit(fixture_h5, tmp_path, "mesh_tp", mesh=mesh)

        np.testing.assert_allclose(tl2, tl1, rtol=1e-5)
        np.testing.assert_allclose(vl2, vl1, rtol=1e-5)
        for a, b in zip(
            jax.tree.leaves(out1["state"].params), jax.tree.leaves(out2["state"].params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
        # some conv kernel really is channel-sharded over the 'model' axis
        sharded = [
            x for x in jax.tree.leaves(out2["state"].params)
            if hasattr(x, "sharding") and x.ndim == 4
            and not x.sharding.is_fully_replicated
        ]
        assert sharded, "no conv kernel ended up sharded"
        # and the checkpoint written from sharded state restores normally
        from deepfluoro_tpu.infer.ensemble import load_net_from_checkpoint

        _, variables, _ = load_net_from_checkpoint(
            str(tmp_path / "cmesh_tp.pt"), verbose=False
        )

    def test_cli_tp_matches_plain_cli(self, tmp_path, fixture_h5):
        """--tp-devices at the CLI reproduces the plain CLI loss streams."""
        from deepfluoro_tpu.cli.train import main

        common = [
            fixture_h5, "--train-pats", "1,2", "--num-classes", "7",
            "--batch-size", "4", "--unet-img-dim", "36", "--unet-num-lvls", "2",
            "--unet-init-feats-exp", "3", "--unet-batch-norm", "--unet-padding",
            "--unet-no-max-pool", "--use-lands", "--train-valid-split", "0.8",
            "--max-num-epochs", "1", "--lr-sched", "plateau", "--init-lr", "0.05",
            "--momentum", "0.9", "--nesterov", "--wgt-decay", "1e-4",
            "--no-gpu",
        ]

        def run(tag, extra):
            args = common + [
                "--checkpoint-net", str(tmp_path / f"c{tag}.pt"),
                "--best-net", str(tmp_path / f"b{tag}.pt"),
                "--train-loss-txt", str(tmp_path / f"t{tag}.txt"),
                "--valid-loss-txt", str(tmp_path / f"v{tag}.txt"),
            ] + extra
            main(args)
            return (
                [float(x) for x in open(str(tmp_path / f"t{tag}.txt"))],
                [float(x) for x in open(str(tmp_path / f"v{tag}.txt"))],
            )

        tl1, vl1 = run("plain2", [])
        tl2, vl2 = run("tp", ["--tp-devices", "4"])
        np.testing.assert_allclose(tl2, tl1, rtol=1e-5)
        np.testing.assert_allclose(vl2, vl1, rtol=1e-5)

    def test_spatial_tp_rejected(self, tmp_path, fixture_h5):
        from deepfluoro_tpu.cli.train import main

        with pytest.raises(AssertionError, match="spatial"):
            main([
                fixture_h5, "--train-pats", "1,2", "--num-classes", "7",
                "--batch-size", "4", "--no-gpu",
                "--spatial-devices", "2", "--tp-devices", "2",
            ])


class TestShardedEvaluate:
    def test_data_sharded_eval_parity(self, fixture_h5):
        """On a single-host mesh with a 'data' axis, evaluate() shards each
        batch over the axis (d-way faster validation) — per-sample losses
        are row-local, so mean/std must be BIT-identical to the no-mesh
        path, including the padded-and-masked uneven tail batch and on a
        2-D data x spatial mesh."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from deepfluoro_tpu.data.augment import AugmentConfig
        from deepfluoro_tpu.data.hdf5 import load_dataset
        from deepfluoro_tpu.train import make_train_state
        from deepfluoro_tpu.train.loop import evaluate, make_eval_step

        data = load_dataset(fixture_h5, [1, 2]).subset(np.arange(11))
        cfg = small_cfg()
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (36, 36))
        aug = AugmentConfig(num_classes=7, proj_pad_dim=36, prob_of_aug=0.0)
        step = make_eval_step(cfg, model)
        key = jax.random.PRNGKey(3)

        m0, s0 = evaluate(step, state, data, aug, 4, key)
        mesh = make_mesh({"data": 4}, devices=jax.devices()[:4])
        m1, s1 = evaluate(
            step, jax.device_put(state, NamedSharding(mesh, P())),
            data, aug, 4, key, mesh=mesh,
        )
        mesh2 = make_mesh({"data": 4, "spatial": 2})
        m2, s2 = evaluate(
            step, jax.device_put(state, NamedSharding(mesh2, P())),
            data, aug, 4, key, mesh=mesh2,
        )
        assert m0 == m1 == m2
        assert s0 == s1 == s2
