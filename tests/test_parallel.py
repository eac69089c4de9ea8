"""Multi-device tests on the 8-virtual-CPU-device mesh: DP training step,
ensemble-sharded inference, manual halo exchange, and the driver's
dryrun_multichip entry."""

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
    def test_dryrun_multichip_8(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_dryrun_multichip_odd(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(1)


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
