"""Orbax-backed sharded checkpoints: save/restore round trips across
topologies (replicated <-> tensor-parallel), payload-contract parity with
the single-file format, and the incomplete-directory guard."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfluoro_tpu.parallel import make_mesh, tp_state_shardings
from deepfluoro_tpu.train import TrainConfig, make_train_state
from deepfluoro_tpu.train.sharded_checkpoint import (
    load_sharded_checkpoint,
    restore_typed,
    save_sharded_checkpoint,
)
from deepfluoro_tpu.train.step import make_optimizer, make_train_step


def small_cfg(**kw):
    base = dict(
        num_classes=7, batch_size=4, proj_unet_dim=32, depth=2, init_feats_exp=2,
        batch_norm=True, padding=True, no_max_pool=True, num_lands=4,
        optim_type="sgd", init_lr=0.1, momentum=0.9, nesterov=True, wgt_decay=1e-4,
    )
    base.update(kw)
    return TrainConfig(**base)


def leaves_close(a_tree, b_tree, atol=0.0):
    la, lb = jax.tree.leaves(a_tree), jax.tree.leaves(b_tree)
    # a truncated/empty restored tree must FAIL, not pass vacuously
    assert len(la) == len(lb), (len(la), len(lb))
    assert la, "empty trees compared"
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


def save_state(path, cfg, state, **kw):
    save_sharded_checkpoint(
        path,
        meta=cfg.to_checkpoint_meta(),
        params=state.params,
        batch_stats=state.batch_stats,
        opt_state=state.opt_state,
        **kw,
    )


class TestRoundTrip:
    def test_partial_restore_params_only(self, tmp_path):
        """A checkpoint saved with full state restores with just a params
        template (the inference case) — the docstring's 'pass None for parts
        that are not wanted' contract."""
        cfg = small_cfg()
        _, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        path = str(tmp_path / "ck")
        save_state(path, cfg, state, epoch=3)

        _, tmpl = make_train_state(cfg, jax.random.PRNGKey(1), (32, 32))
        out = load_sharded_checkpoint(path, tmpl.params)
        restored = restore_typed(tmpl.params, out["model-state-dict"]["params"])
        leaves_close(state.params, restored)
        assert out["epoch"] == 3
        assert out["optimizer-state-dict"] == {}

    def test_partial_restore_onto_tp_shardings(self, tmp_path):
        """Params-only restore placed directly onto a TP sharding tree: the
        target shardings must be honored, not defaulted."""
        cfg = small_cfg()
        _, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        path = str(tmp_path / "ck")
        save_state(path, cfg, state, epoch=1)

        mesh = make_mesh({"model": 4}, devices=jax.devices()[:4])
        _, tmpl = make_train_state(cfg, jax.random.PRNGKey(1), (32, 32))
        sh = tp_state_shardings(mesh, tmpl)
        out = load_sharded_checkpoint(
            path, tmpl.params, shardings={"params": sh.params}
        )
        restored = restore_typed(tmpl.params, out["model-state-dict"]["params"])
        leaves_close(state.params, restored)
        shardified = [
            x for x in jax.tree.leaves(restored)
            if hasattr(x, "sharding") and not x.sharding.is_fully_replicated
        ]
        assert shardified, "no restored leaf carries the TP sharding"

    def test_replicated_roundtrip_and_payload_contract(self, tmp_path):
        cfg = small_cfg()
        _, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        path = str(tmp_path / "ck")
        save_state(
            path, cfg, state,
            sched_state={"T_cur": 1.5}, epoch=7, best_valid_loss=-0.25,
            last_loss=-0.5, num_restarts=2, train_idx=[0, 2], valid_idx=[1],
        )

        _, tmpl = make_train_state(cfg, jax.random.PRNGKey(1), (32, 32))
        out = load_sharded_checkpoint(
            path, tmpl.params, tmpl.batch_stats, tmpl.opt_state
        )
        # same payload keys as the single-file loader
        assert out["epoch"] == 7
        assert out["loss"] == pytest.approx(-0.5)
        assert out["best-valid-loss"] == pytest.approx(-0.25)
        assert out["lrs-num-restarts"] == 2
        assert out["scheduler-state-dict"]["T_cur"] == pytest.approx(1.5)
        assert list(out["train-idx"]) == [0, 2] and list(out["valid-idx"]) == [1]
        assert TrainConfig.from_checkpoint_meta(out["meta"]).depth == cfg.depth

        params = restore_typed(tmpl.params, out["model-state-dict"]["params"])
        bstats = restore_typed(tmpl.batch_stats, out["model-state-dict"]["batch_stats"])
        opt = restore_typed(tmpl.opt_state, out["optimizer-state-dict"])
        leaves_close(params, state.params)
        leaves_close(bstats, state.batch_stats)
        leaves_close(opt, state.opt_state)

    def test_save_tp_restore_replicated(self, tmp_path):
        """Each device holds only a channel shard at save time; the restore
        reassembles full arrays on one device."""
        cfg = small_cfg()
        _, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        expect = jax.tree.map(np.asarray, state.params)

        mesh = make_mesh({"model": 4}, devices=jax.devices()[:4])
        sh = tp_state_shardings(mesh, state, axis="model")
        placed = jax.tree.map(jax.device_put, state, sh)
        path = str(tmp_path / "ck_tp")
        save_state(path, cfg, placed)

        _, tmpl = make_train_state(cfg, jax.random.PRNGKey(1), (32, 32))
        out = load_sharded_checkpoint(path, tmpl.params, tmpl.batch_stats, tmpl.opt_state)
        params = restore_typed(tmpl.params, out["model-state-dict"]["params"])
        leaves_close(params, expect)

    def test_save_replicated_restore_tp_and_step(self, tmp_path):
        """Restore directly onto TP shardings and verify the restored state
        trains identically to the original."""
        cfg = small_cfg()
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        path = str(tmp_path / "ck_repl")
        save_state(path, cfg, state)

        mesh = make_mesh({"model": 4}, devices=jax.devices()[:4])
        _, tmpl = make_train_state(cfg, jax.random.PRNGKey(1), (32, 32))
        sh = tp_state_shardings(mesh, tmpl, axis="model")
        out = load_sharded_checkpoint(
            path, tmpl.params, tmpl.batch_stats, tmpl.opt_state,
            shardings={
                "params": sh.params,
                "batch_stats": sh.batch_stats,
                "opt_state": sh.opt_state,
            },
        )
        params = restore_typed(tmpl.params, out["model-state-dict"]["params"])
        # a divisible conv kernel leaf must actually be sharded over 'model'
        kernel = jax.tree.leaves(params)[0]
        any_sharded = any(
            getattr(leaf, "sharding", None) is not None
            and not leaf.sharding.is_fully_replicated
            for leaf in jax.tree.leaves(params)
            if hasattr(leaf, "sharding")
        )
        assert any_sharded, "no leaf restored with a TP sharding"
        assert kernel.shape[-1] % 4 == 0 or kernel.ndim == 0

        restored_state = tmpl.replace(
            params=params,
            batch_stats=restore_typed(tmpl.batch_stats, out["model-state-dict"]["batch_stats"]),
            opt_state=restore_typed(tmpl.opt_state, out["optimizer-state-dict"]),
            step=jax.device_put(tmpl.step, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())),
        )

        rng = np.random.default_rng(3)
        proj = jnp.asarray(rng.random((4, 32, 32, 1)), jnp.float32)
        seg = jnp.asarray(np.eye(7, dtype=np.float32)[rng.integers(0, 7, (4, 32, 32))])
        heats = jnp.asarray(rng.random((4, 32, 32, 4)), jnp.float32)

        tx = make_optimizer(cfg)
        step1 = make_train_step(cfg, model, tx)
        _, loss_orig = step1(state, proj, seg, heats, 0.1)

        from deepfluoro_tpu.parallel.sharding import make_tp_train_step

        tp_step, place = make_tp_train_step(cfg, model, tx, mesh, tmpl)
        _, loss_tp = tp_step(place(restored_state), proj, seg, heats, 0.1)
        assert float(loss_orig) == pytest.approx(float(loss_tp), rel=1e-5)


class TestContract:
    def test_incomplete_dir_raises(self, tmp_path):
        cfg = small_cfg()
        _, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        path = str(tmp_path / "ck")
        save_state(path, cfg, state)
        with open(os.path.join(path, "CURRENT")) as f:
            slot = f.read().strip()
        os.remove(os.path.join(path, slot, "meta.msgpack"))
        _, tmpl = make_train_state(cfg, jax.random.PRNGKey(1), (32, 32))
        with pytest.raises(FileNotFoundError):
            load_sharded_checkpoint(path, tmpl.params)

    def test_torn_resave_preserves_previous(self, tmp_path):
        """A crash mid-resave (new slot half-written, CURRENT not yet
        flipped) must leave the previous checkpoint loadable — the
        ADVICE r2 atomicity finding."""
        cfg = small_cfg()
        _, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        path = str(tmp_path / "ck")
        save_state(path, cfg, state, epoch=7)
        # simulate the torn second save: the other slot exists with arrays
        # but no meta, and CURRENT still points at the committed slot
        with open(os.path.join(path, "CURRENT")) as f:
            slot = f.read().strip()
        other = "slot1" if slot == "slot0" else "slot0"
        os.makedirs(os.path.join(path, other, "arrays"))
        _, tmpl = make_train_state(cfg, jax.random.PRNGKey(1), (32, 32))
        out = load_sharded_checkpoint(path, tmpl.params, tmpl.batch_stats, tmpl.opt_state)
        assert out["epoch"] == 7
        params = restore_typed(tmpl.params, out["model-state-dict"]["params"])
        leaves_close(params, state.params)
        # and the next save reclaims the torn slot
        save_state(path, cfg, state, epoch=8)
        out = load_sharded_checkpoint(path, tmpl.params, tmpl.batch_stats, tmpl.opt_state)
        assert out["epoch"] == 8

    def test_legacy_layout_still_loads(self, tmp_path):
        """Checkpoints written before the A/B slot scheme (arrays/ + meta
        directly under the directory) remain readable."""
        import shutil

        cfg = small_cfg()
        _, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        path = str(tmp_path / "ck")
        save_state(path, cfg, state, epoch=3)
        with open(os.path.join(path, "CURRENT")) as f:
            slot = f.read().strip()
        for name in ("arrays", "meta.msgpack"):
            shutil.move(os.path.join(path, slot, name), os.path.join(path, name))
        shutil.rmtree(os.path.join(path, slot))
        os.remove(os.path.join(path, "CURRENT"))
        _, tmpl = make_train_state(cfg, jax.random.PRNGKey(1), (32, 32))
        out = load_sharded_checkpoint(path, tmpl.params, tmpl.batch_stats, tmpl.opt_state)
        assert out["epoch"] == 3

    def test_resave_overwrites(self, tmp_path):
        cfg = small_cfg()
        _, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        path = str(tmp_path / "ck")
        save_state(path, cfg, state, epoch=1)
        bumped = state.replace(
            params=jax.tree.map(lambda x: x + 1.0, state.params)
        )
        save_state(path, cfg, bumped, epoch=2)

        _, tmpl = make_train_state(cfg, jax.random.PRNGKey(1), (32, 32))
        out = load_sharded_checkpoint(path, tmpl.params, tmpl.batch_stats, tmpl.opt_state)
        assert out["epoch"] == 2
        params = restore_typed(tmpl.params, out["model-state-dict"]["params"])
        leaves_close(params, bumped.params)
