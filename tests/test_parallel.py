"""Multi-device tests on the 8-virtual-CPU-device mesh: DP training step,
ensemble-sharded inference, manual halo exchange, and the driver's
dryrun_multichip entry."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from deepfluoro_tpu.parallel import make_mesh, make_sharded_train_step, shard_batch
from deepfluoro_tpu.parallel.halo import halo_exchange, sharded_conv2d
from deepfluoro_tpu.train import TrainConfig, make_train_state
from deepfluoro_tpu.train.step import make_optimizer, make_train_step


def small_cfg(**kw):
    base = dict(
        num_classes=7, batch_size=8, proj_unet_dim=32, depth=2, init_feats_exp=2,
        batch_norm=True, padding=True, no_max_pool=True, num_lands=4,
        optim_type="sgd", init_lr=0.1, momentum=0.9, nesterov=True, wgt_decay=1e-4,
    )
    base.update(kw)
    return TrainConfig(**base)


def make_batch(rng, b, h, w, num_lands=4):
    proj = jnp.asarray(rng.random((b, h, w, 1)), jnp.float32)
    seg = jnp.asarray(np.eye(7, dtype=np.float32)[rng.integers(0, 7, (b, h, w))])
    heats = jnp.asarray(rng.random((b, h, w, num_lands)), jnp.float32)
    return proj, seg, heats


class TestMesh:
    def test_1d_default(self):
        mesh = make_mesh()
        assert mesh.axis_names == ("data",)
        assert mesh.devices.size == 8

    def test_2d(self):
        mesh = make_mesh({"data": 4, "spatial": 2})
        assert mesh.devices.shape == (4, 2)

    def test_bad_factorization(self):
        with pytest.raises(AssertionError):
            make_mesh({"data": 3})


class TestShardedTrainStep:
    def test_dp_matches_single_device(self, rng):
        """The 8-way DP step must produce the same loss and parameters as the
        unsharded step on the identical batch."""
        cfg = small_cfg()
        # two independent (deterministically identical) states: the single-
        # device step donates its input buffers
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        _, state_b = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        tx = make_optimizer(cfg)
        proj, seg, heats = make_batch(rng, 8, 32, 32)

        mesh = make_mesh({"data": 8})
        stepN, place = make_sharded_train_step(cfg, model, tx, mesh)
        stateN = place(state_b)
        pN, sN, hN = shard_batch(mesh, proj, seg, heats)

        # single-device reference
        step1 = make_train_step(cfg, model, tx)
        s1, loss1 = step1(state, proj, seg, heats, 0.1)

        s2, loss2 = stepN(stateN, pN, sN, hN, 0.1)

        assert float(loss1) == pytest.approx(float(loss2), rel=1e-5)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_dp_spatial_2d_mesh(self, rng):
        cfg = small_cfg()
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        _, state_b = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        tx = make_optimizer(cfg)
        proj, seg, heats = make_batch(rng, 4, 32, 32)

        mesh = make_mesh({"data": 4, "spatial": 2})
        stepN, place = make_sharded_train_step(cfg, model, tx, mesh, spatial=True)
        stateN = place(state_b)
        pN, sN, hN = shard_batch(mesh, proj, seg, heats, spatial=True)

        step1 = make_train_step(cfg, model, tx)
        s1, loss1 = step1(state, proj, seg, heats, 0.1)

        s2, loss2 = stepN(stateN, pN, sN, hN, 0.1)
        assert float(loss1) == pytest.approx(float(loss2), rel=1e-4)


class TestHalo:
    def test_halo_exchange_matches_reflect_pad(self, rng):
        mesh = make_mesh({"spatial": 8})
        x = jnp.asarray(rng.random((2, 32, 16, 3)), jnp.float32)
        out = halo_exchange(mesh, x, halo=1, axis="spatial")
        # each of 8 shards of 4 rows gains 2 rows -> global H = 32 + 16
        assert out.shape == (2, 32 + 16, 16, 3)
        # interior shard halos must equal neighbor rows: shard 1's first halo
        # row is global row 3 (last row of shard 0)
        out_np = np.asarray(out)
        x_np = np.asarray(x)
        shard1 = out_np[:, 6:12]  # shard 1 occupies rows 6..11 (4+2 rows)
        np.testing.assert_allclose(shard1[:, 0], x_np[:, 3])  # halo from above
        np.testing.assert_allclose(shard1[:, -1], x_np[:, 8])  # halo from below

    def test_sharded_conv_matches_unsharded(self, rng):
        mesh = make_mesh({"spatial": 8})
        x = jnp.asarray(rng.random((2, 32, 16, 3)), jnp.float32)
        k = jnp.asarray(rng.random((3, 3, 3, 5)), jnp.float32)

        got = sharded_conv2d(mesh, x, k, axis="spatial")

        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        want = jax.lax.conv_general_dilated(
            xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestEnsembleSharding:
    def test_matches_unsharded(self, rng):
        from deepfluoro_tpu.infer.ensemble import stack_variables
        from deepfluoro_tpu.parallel import make_mesh
        from deepfluoro_tpu.parallel.sharding import make_sharded_ensemble_forward
        from deepfluoro_tpu.train import make_train_state

        cfg = small_cfg()
        variables_list = []
        model = None
        for k in range(4):
            model, state = make_train_state(cfg, jax.random.PRNGKey(k), (32, 32))
            variables_list.append({"params": state.params, "batch_stats": state.batch_stats})
        stacked = stack_variables(variables_list)
        proj = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)

        # unsharded reference
        from deepfluoro_tpu.infer.ensemble import make_ensemble_forward

        fwd1 = make_ensemble_forward(model, 4, (32, 32))
        seg1, heats1, labels1 = fwd1(stacked, proj)

        mesh = make_mesh({"ensemble": 4, "data": 2})
        fwdN, place = make_sharded_ensemble_forward(model, 4, (32, 32), mesh)
        stackedN = place(stacked)
        segN, heatsN, labelsN = fwdN(stackedN, proj)

        np.testing.assert_allclose(np.asarray(seg1), np.asarray(segN), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(labels1), np.asarray(labelsN))


class TestGraftEntry:
    @staticmethod
    def _graft_entry():
        # __graft_entry__ lives at the repo root, outside the editable
        # install — each test imports it through its own path shim so the
        # tests are order-independent (and the shim is removed afterwards)
        import importlib
        import os
        import sys

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, root)
        try:
            return importlib.import_module("__graft_entry__")
        finally:
            sys.path.remove(root)

    def test_dryrun_multichip_8(self):
        self._graft_entry().dryrun_multichip(8)

    def test_dryrun_multichip_odd(self):
        self._graft_entry().dryrun_multichip(1)


class TestDeepSpatialSharding:
    def test_depth6_receptive_field_spatial_parity(self, rng):
        """SURVEY §7 hard part (e): halo-exchange correctness for depth-6
        receptive fields under spatial sharding. The partitioner must insert
        correct halos through 6 encoder levels (receptive field spans many
        shard boundaries at 192^2 split 2-ways)."""
        cfg = small_cfg(
            depth=6, init_feats_exp=1, num_lands=2, proj_unet_dim=192, batch_size=2,
        )
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (192, 192))
        _, state_b = make_train_state(cfg, jax.random.PRNGKey(0), (192, 192))
        tx = make_optimizer(cfg)
        proj, seg, heats = make_batch(rng, 2, 192, 192, num_lands=2)

        mesh = make_mesh({"data": 2, "spatial": 4})
        stepN, place = make_sharded_train_step(cfg, model, tx, mesh, spatial=True)
        stateN = place(state_b)
        pN, sN, hN = shard_batch(mesh, proj, seg, heats, spatial=True)

        step1 = make_train_step(cfg, model, tx)
        s1, loss1 = step1(state, proj, seg, heats, 0.1)
        s2, loss2 = stepN(stateN, pN, sN, hN, 0.1)

        assert float(loss1) == pytest.approx(float(loss2), rel=1e-4)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


class TestTensorParallel:
    def test_tp_step_matches_single_device(self, rng):
        """Channel-sharded (TP) train step == unsharded step: same loss and
        same updated parameters on a 4-way 'model' mesh."""
        from deepfluoro_tpu.parallel.sharding import make_tp_train_step

        cfg = TrainConfig(
            num_classes=7, depth=2, init_feats_exp=3, batch_norm=True,
            padding=True, no_max_pool=True, num_lands=14, proj_unet_dim=32,
            optim_type="sgd", init_lr=0.1, momentum=0.9, nesterov=True,
            wgt_decay=1e-4,
        )
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        tx = make_optimizer(cfg)

        proj = jnp.asarray(rng.random((4, 32, 32, 1)), jnp.float32)
        seg = jnp.asarray(np.eye(7, dtype=np.float32)[rng.integers(0, 7, (4, 32, 32))])
        heats = jnp.asarray(rng.random((4, 32, 32, 14)), jnp.float32)

        step1 = make_train_step(cfg, model, tx)
        s1, loss1 = step1(state, proj, seg, heats, 0.1)

        mesh = make_mesh({"model": 4}, devices=jax.devices()[:4])
        model2, state2 = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        tp_step, place = make_tp_train_step(cfg, model2, tx, mesh, state2)
        s2, loss2 = tp_step(place(state2), proj, seg, heats, 0.1)

        assert float(loss1) == pytest.approx(float(loss2), rel=1e-4)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
        # the first conv kernel really is channel-sharded over 4 devices
        kern = jax.tree.leaves_with_path(s2.params)
        sharded_leaves = [
            x for _, x in kern
            if hasattr(x, "sharding") and x.ndim == 4
            and not x.sharding.is_fully_replicated
        ]
        assert sharded_leaves, "no conv kernel ended up sharded"

    def test_dp_tp_2d_mesh_matches_single_device(self, rng):
        """Combined DP x TP on one 2-D mesh — batch over 'data', channels
        over 'model' (2x4 = 8 virtual devices) — must reproduce the
        unsharded step: the partitioner composes the batch split with the
        channel collectives. (Measured exact: max param diff 0.0.)"""
        from deepfluoro_tpu.parallel.sharding import make_tp_train_step, shard_batch

        cfg = TrainConfig(
            num_classes=7, depth=2, init_feats_exp=3, batch_norm=True,
            padding=True, no_max_pool=True, num_lands=4, proj_unet_dim=32,
            optim_type="sgd", init_lr=0.1, momentum=0.9, nesterov=True,
            wgt_decay=1e-4,
        )
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        tx = make_optimizer(cfg)

        proj = jnp.asarray(rng.random((4, 32, 32, 1)), jnp.float32)
        seg = jnp.asarray(np.eye(7, dtype=np.float32)[rng.integers(0, 7, (4, 32, 32))])
        heats = jnp.asarray(rng.random((4, 32, 32, 4)), jnp.float32)

        step1 = make_train_step(cfg, model, tx)
        s1, loss1 = step1(state, proj, seg, heats, 0.1)

        mesh = make_mesh({"data": 2, "model": 4})
        model2, state2 = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        tp_step, place = make_tp_train_step(cfg, model2, tx, mesh, state2)
        pN, sN, hN = shard_batch(mesh, proj, seg, heats)
        s2, loss2 = tp_step(place(state2), pN, sN, hN, 0.1)

        assert float(loss1) == pytest.approx(float(loss2), rel=1e-4)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
        # the batch really is data-sharded AND kernels model-sharded
        assert not pN.sharding.is_fully_replicated

    def test_spatial_tp_combination_rejected(self):
        """spatial x TP mis-partitions first-conv weight grads in GSPMD
        (measured ~1e-3 error) — the constructor must refuse it loudly
        rather than train wrong."""
        from deepfluoro_tpu.parallel.sharding import make_tp_train_step

        cfg = TrainConfig(
            num_classes=7, depth=2, init_feats_exp=3, batch_norm=True,
            padding=True, no_max_pool=True, num_lands=0, proj_unet_dim=32,
        )
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        tx = make_optimizer(cfg)
        mesh = make_mesh({"spatial": 2, "model": 4})
        with pytest.raises(NotImplementedError):
            make_tp_train_step(cfg, model, tx, mesh, state, spatial=True)

    def test_spatial_tp_rejected_in_fused_step_too(self):
        """The shared fused/streaming step builders (the library path fit()
        uses) must refuse the same composition — previously only the CLI and
        make_tp_train_step guarded it, so fit(mesh=..., shard_spatial=True)
        on a {'model','spatial'} mesh trained on corrupted gradients."""
        from deepfluoro_tpu.data.augment import AugmentConfig
        from deepfluoro_tpu.train.step import (
            make_fused_train_step,
            make_streaming_train_step,
        )

        cfg = TrainConfig(
            num_classes=7, depth=2, init_feats_exp=3, batch_norm=True,
            padding=True, no_max_pool=True, num_lands=0, proj_unet_dim=32,
        )
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        tx = make_optimizer(cfg)
        mesh = make_mesh({"spatial": 2, "model": 4})
        aug = AugmentConfig(num_classes=7, proj_pad_dim=32, prob_of_aug=0.0)
        with pytest.raises(NotImplementedError):
            make_fused_train_step(cfg, model, tx, aug, mesh=mesh, spatial=True,
                                  state_template=state)
        with pytest.raises(NotImplementedError):
            make_streaming_train_step(cfg, model, tx, aug, mesh=mesh,
                                      spatial=True, state_template=state)


class TestMultihost:
    def test_local_shard_indices_partition(self):
        """Single-process: the shard must be a permutation of all indices;
        the (seed, epoch) pair fully determines it."""
        from deepfluoro_tpu.parallel.multihost import local_shard_indices

        a = local_shard_indices(100, seed=3, epoch=0)
        b = local_shard_indices(100, seed=3, epoch=0)
        np.testing.assert_array_equal(a, b)  # deterministic
        assert sorted(a.tolist()) == list(range(100))  # full coverage (1 proc)
        c = local_shard_indices(100, seed=3, epoch=1)
        assert not np.array_equal(a, c)  # reshuffled per epoch

    def test_global_batch_from_local(self, rng):
        from deepfluoro_tpu.parallel.multihost import global_batch_from_local

        mesh = make_mesh({"data": 8})
        local = rng.random((8, 4, 4)).astype(np.float32)
        arr = global_batch_from_local(mesh, local)
        assert arr.shape == (8, 4, 4)
        np.testing.assert_allclose(np.asarray(arr), local)

    def test_uneven_shards_drop_tail_equal_sizes(self, monkeypatch):
        """n % num_processes != 0: every process must get the SAME shard
        size (make_array_from_process_local_data needs consistent global
        shapes), dropping the epoch-dependent tail."""
        from deepfluoro_tpu.parallel import multihost

        monkeypatch.setattr(jax, "process_count", lambda: 4)
        shards = []
        for p in range(4):
            monkeypatch.setattr(jax, "process_index", lambda p=p: p)
            shards.append(multihost.local_shard_indices(103, seed=3, epoch=0))
        sizes = {len(s) for s in shards}
        assert sizes == {25}  # 103 -> 100 kept, 25 each
        union = np.concatenate(shards)
        assert len(np.unique(union)) == 100  # disjoint
        # the dropped tail rotates with the epoch-dependent permutation
        e1_all = []
        for p in range(4):
            monkeypatch.setattr(jax, "process_index", lambda p=p: p)
            e1_all.append(multihost.local_shard_indices(103, 3, 1))
        assert set(np.concatenate(e1_all).tolist()) != set(union.tolist())

    def test_single_writer_checkpointing(self, tmp_path, monkeypatch):
        """Only process 0 writes checkpoint files (multi-host safety); the
        others' saves are silent no-ops."""
        from deepfluoro_tpu.train.checkpoint import (
            AsyncCheckpointer,
            load_checkpoint,
            save_checkpoint,
        )

        params = {"w": np.ones((3,), np.float32)}
        p1 = str(tmp_path / "proc1.pt")
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        save_checkpoint(p1, meta={"depth": 2}, params=params)
        ck = AsyncCheckpointer()
        ck.save(str(tmp_path / "proc1b.pt"), meta={"depth": 2}, params=params)
        ck.wait()
        assert not os.path.exists(p1)
        assert not os.path.exists(str(tmp_path / "proc1b.pt"))

        monkeypatch.setattr(jax, "process_index", lambda: 0)
        p0 = str(tmp_path / "proc0.pt")
        save_checkpoint(p0, meta={"depth": 2}, params=params)
        assert os.path.exists(p0)
        assert load_checkpoint(p0)["meta"]["depth"] == 2
