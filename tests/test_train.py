"""End-to-end training tests on the synthetic fixture: loss decreases,
checkpoints are self-describing, resume restores everything."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfluoro_tpu.data.fixtures import write_synthetic_dataset
from deepfluoro_tpu.train import (
    TrainConfig,
    fit,
    load_checkpoint,
    make_eval_step,
    make_train_state,
    make_train_step,
)
from deepfluoro_tpu.train.checkpoint import restore_tree, save_checkpoint
from deepfluoro_tpu.train.step import make_optimizer


@pytest.fixture(scope="module")
def fixture_h5(tmp_path_factory):
    path = tmp_path_factory.mktemp("train") / "synthetic.h5"
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
        max_num_epochs=2,
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


class TestTrainStep:
    def test_loss_decreases(self, fixture_h5):
        from deepfluoro_tpu.data import AugmentConfig, load_dataset, prepare_batch

        cfg = small_cfg()
        data = load_dataset(fixture_h5, [1])
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (36, 36))
        tx = make_optimizer(cfg)
        step = make_train_step(cfg, model, tx)
        aug = AugmentConfig(num_classes=7, proj_pad_dim=36, prob_of_aug=0.0)
        batch = prepare_batch(
            aug, jax.random.PRNGKey(1), jnp.asarray(data.projs),
            jnp.asarray(data.segs), jnp.asarray(data.lands),
        )
        losses = []
        for i in range(12):
            state, loss = step(state, batch["proj"], batch["seg"], batch["heats"], 0.05)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert all(np.isfinite(losses))

    def test_dice_only_model(self, fixture_h5):
        from deepfluoro_tpu.data import AugmentConfig, load_dataset, prepare_batch

        cfg = small_cfg(num_lands=0)
        data = load_dataset(fixture_h5, [1])
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (36, 36))
        tx = make_optimizer(cfg)
        step = make_train_step(cfg, model, tx)
        aug = AugmentConfig(num_classes=7, proj_pad_dim=36, prob_of_aug=0.0)
        batch = prepare_batch(
            aug, jax.random.PRNGKey(1), jnp.asarray(data.projs), jnp.asarray(data.segs)
        )
        state, loss = step(state, batch["proj"], batch["seg"], None, 0.05)
        assert np.isfinite(float(loss))


class TestEvalHeatCoeff:
    def test_eval_step_honors_heat_coeff(self, fixture_h5):
        """Validation must use the configured --heat-coeff (the reference
        builds ONE criterion for train and valid, train.py:321-327).
        Recover the dice and heat components from two evaluations and check
        the 0.7-weighted loss is their exact recombination."""
        from deepfluoro_tpu.data import AugmentConfig, load_dataset, prepare_batch

        data = load_dataset(fixture_h5, [1])
        cfg05 = small_cfg(heat_coeff=0.5)
        cfg07 = small_cfg(heat_coeff=0.7)
        model, state = make_train_state(cfg05, jax.random.PRNGKey(0), (36, 36))
        aug = AugmentConfig(num_classes=7, proj_pad_dim=36, prob_of_aug=0.0)
        b = prepare_batch(
            aug, jax.random.PRNGKey(1), jnp.asarray(data.projs),
            jnp.asarray(data.segs), jnp.asarray(data.lands),
        )

        l05 = np.asarray(make_eval_step(cfg05, model)(state, b["proj"], b["seg"], b["heats"]))
        l07 = np.asarray(make_eval_step(cfg07, model)(state, b["proj"], b["seg"], b["heats"]))
        dice = np.asarray(
            make_eval_step(cfg05, model, num_lands_for_loss=0)(
                state, b["proj"], b["seg"], b["heats"]
            )
        )
        heat = (l05 - 0.5 * dice) / 0.5
        np.testing.assert_allclose(l07, 0.3 * dice + 0.7 * heat, rtol=1e-5, atol=1e-6)
        # and the weighting genuinely changes the result
        assert not np.allclose(l05, l07)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, fixture_h5):
        cfg = small_cfg()
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (36, 36))
        path = str(tmp_path / "ck.pt")
        save_checkpoint(
            path,
            meta=cfg.to_checkpoint_meta(),
            params=state.params,
            batch_stats=state.batch_stats,
            opt_state=state.opt_state,
            sched_state={"lr": 0.01},
            epoch=7,
            best_valid_loss=-0.5,
            num_restarts=2,
            train_idx=[0, 1, 2],
            valid_idx=[3],
        )
        ck = load_checkpoint(path)
        assert ck["epoch"] == 7
        assert ck["lrs-num-restarts"] == 2
        assert list(ck["train-idx"]) == [0, 1, 2]
        cfg2 = TrainConfig.from_checkpoint_meta(ck["meta"])
        assert cfg2.depth == cfg.depth
        assert cfg2.num_lands == cfg.num_lands
        assert cfg2.nesterov == cfg.nesterov
        # params restore bit-exact
        p2 = restore_tree(state.params, ck["model-state-dict"]["params"])
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # optimizer state restores into a typed template
        o2 = restore_tree(state.opt_state, ck["optimizer-state-dict"])
        for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(o2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_atomic_write_leaves_no_tmp(self, tmp_path):
        cfg = small_cfg(depth=2, init_feats_exp=2, num_lands=0, batch_norm=False)
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (36, 36))
        path = str(tmp_path / "ck.pt")
        save_checkpoint(path, meta=cfg.to_checkpoint_meta(), params=state.params)
        assert os.path.exists(path)
        assert not os.path.exists(path + ".tmp")


class TestFit:
    def test_fit_and_resume(self, tmp_path, fixture_h5):
        cfg = small_cfg(max_num_epochs=2)
        ck = str(tmp_path / "check.pt")
        best = str(tmp_path / "best.pt")
        tl = str(tmp_path / "train_loss.txt")
        vl = str(tmp_path / "valid_loss.txt")

        out = fit(
            fixture_h5, [1, 2], cfg,
            checkpoint_filename=ck, best_valid_filename=best,
            train_loss_txt=tl, valid_loss_txt=vl, verbose=False,
        )
        assert out["epoch"] == 2
        assert os.path.exists(ck) and os.path.exists(best)
        n_train_lines = len(open(tl).readlines())
        assert n_train_lines > 0
        assert len(open(vl).readlines()) == 2
        saved = load_checkpoint(ck)
        assert saved["epoch"] == 2

        # resume: checkpoint overrides config; trains 2 more epochs
        cfg_resume = small_cfg(max_num_epochs=4, init_feats_exp=5)  # wrong wf on CLI
        out2 = fit(
            fixture_h5, [1, 2], cfg_resume,
            checkpoint_filename=ck, best_valid_filename=best,
            train_loss_txt=tl, valid_loss_txt=vl, verbose=False,
        )
        # checkpoint meta must have overridden the bogus CLI value
        assert out2["cfg"].init_feats_exp == 3
        assert out2["epoch"] == 4
        # split indices reused
        assert out2["train_idx"] == out["train_idx"]
        # loss logs appended, not truncated
        assert len(open(vl).readlines()) == 4
        assert len(open(tl).readlines()) > n_train_lines

    def test_fit_light_best_nets(self, tmp_path, fixture_h5):
        """light_best_nets: the best-valid file stores no optimizer/scheduler
        state (inference artifact), the periodic checkpoint stays full, the
        best net still rebuilds for inference, and resuming FROM the light
        file starts the optimizer fresh instead of crashing."""
        # checkpoint_freq=3 > epochs: best-valid takes the save_net (not
        # copy) path, which is where the light variant matters
        cfg = small_cfg(max_num_epochs=2, light_best_nets=True, checkpoint_freq=3)
        ck = str(tmp_path / "check.pt")
        best = str(tmp_path / "best.pt")
        out = fit(
            fixture_h5, [1, 2], cfg,
            checkpoint_filename=ck, best_valid_filename=best,
            train_loss_txt=str(tmp_path / "t.txt"),
            valid_loss_txt=str(tmp_path / "v.txt"), verbose=False,
        )
        full = load_checkpoint(ck)  # exit-path checkpoint: full state
        light = load_checkpoint(best)
        assert full["optimizer-state-dict"]
        assert not light["optimizer-state-dict"]
        assert not light["scheduler-state-dict"]
        assert os.path.getsize(best) < 0.75 * os.path.getsize(ck)

        # the light net is a complete inference artifact
        from deepfluoro_tpu.infer.ensemble import load_net_from_checkpoint

        model, variables, cfg2 = load_net_from_checkpoint(best, verbose=False)
        assert cfg2.init_feats_exp == cfg.init_feats_exp

        # regression: with checkpoint_freq=1 (a periodic save EVERY epoch)
        # the best file must still come out light — not a copy of the full
        # checkpoint via the copy optimization
        cfg_f1 = small_cfg(max_num_epochs=1, light_best_nets=True, checkpoint_freq=1)
        fit(
            fixture_h5, [1, 2], cfg_f1,
            checkpoint_filename=str(tmp_path / "ck1.pt"),
            best_valid_filename=str(tmp_path / "best1.pt"),
            train_loss_txt=str(tmp_path / "t1.txt"),
            valid_loss_txt=str(tmp_path / "v1.txt"), verbose=False,
        )
        assert not load_checkpoint(str(tmp_path / "best1.pt"))["optimizer-state-dict"]
        assert load_checkpoint(str(tmp_path / "ck1.pt"))["optimizer-state-dict"]

        # resuming from the light file warm-starts weights, fresh optimizer
        cfg_resume = small_cfg(max_num_epochs=3, light_best_nets=True)
        out2 = fit(
            fixture_h5, [1, 2], cfg_resume,
            checkpoint_filename=best,  # resume source = the light file
            best_valid_filename=str(tmp_path / "best2.pt"),
            train_loss_txt=str(tmp_path / "t2.txt"),
            valid_loss_txt=str(tmp_path / "v2.txt"), verbose=False,
        )
        assert out2["epoch"] == 3

    def test_fit_stream_data_parity(self, tmp_path, fixture_h5):
        """stream_data=True (host-resident dataset, double-buffered H2D)
        must reproduce the device-resident fused path exactly: same shuffle
        stream, same per-step aug seeds, so identical losses and params."""
        losses = {}
        params = {}
        for mode in (False, True):
            cfg = small_cfg(max_num_epochs=1)
            out = fit(
                fixture_h5, [1, 2], cfg,
                checkpoint_filename=str(tmp_path / f"c{mode}.pt"),
                best_valid_filename=str(tmp_path / f"b{mode}.pt"),
                train_loss_txt=str(tmp_path / f"t{mode}.txt"),
                valid_loss_txt=str(tmp_path / f"v{mode}.txt"),
                verbose=False, stream_data=mode,
            )
            losses[mode] = [float(x) for x in open(str(tmp_path / f"t{mode}.txt"))]
            params[mode] = jax.tree.leaves(out["state"].params)
        np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)
        for a, b in zip(params[True], params[False]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_fit_explicit_valid_pats(self, tmp_path, fixture_h5):
        cfg = small_cfg(max_num_epochs=1, train_valid_split=-1.0, lr_sched_meth="none")
        out = fit(
            fixture_h5, [1, 2], cfg, valid_pats=[3],
            checkpoint_filename=str(tmp_path / "c.pt"),
            best_valid_filename=str(tmp_path / "b.pt"),
            train_loss_txt=str(tmp_path / "t.txt"),
            valid_loss_txt=str(tmp_path / "v.txt"),
            verbose=False,
        )
        assert out["epoch"] == 1

    def test_fit_cos_restart_snapshots(self, tmp_path, fixture_h5):
        cfg = small_cfg(
            max_num_epochs=3,
            lr_sched_meth="cos",
            lrs_num_epochs=1,
            lrs_growth_factor=1,
            save_restart_net_prefix=str(tmp_path / "restart"),
            save_after_n_restarts=0,
        )
        out = fit(
            fixture_h5, [1], cfg,
            checkpoint_filename=str(tmp_path / "c.pt"),
            best_valid_filename=str(tmp_path / "b.pt"),
            train_loss_txt=str(tmp_path / "t.txt"),
            valid_loss_txt=str(tmp_path / "v.txt"),
            verbose=False,
        )
        assert out["num_restarts"] >= 2
        # snapshot files <prefix>_XX.pt written (train.py:533-542)
        assert os.path.exists(str(tmp_path / "restart_00.pt"))
        assert os.path.exists(str(tmp_path / "restart_01.pt"))

    def test_fit_max_restarts_stop(self, tmp_path, fixture_h5):
        cfg = small_cfg(
            max_num_epochs=50,
            lr_sched_meth="cos",
            lrs_num_epochs=1,
            lrs_growth_factor=1,
            max_num_restarts=2,
        )
        out = fit(
            fixture_h5, [1], cfg,
            checkpoint_filename=str(tmp_path / "c.pt"),
            best_valid_filename=str(tmp_path / "b.pt"),
            train_loss_txt=str(tmp_path / "t.txt"),
            valid_loss_txt=str(tmp_path / "v.txt"),
            verbose=False,
        )
        assert out["num_restarts"] == 2
        assert out["epoch"] == 2  # stopped by restarts, not epochs


class TestAsyncCheckpointer:
    def test_snapshot_survives_mutation(self, tmp_path, fixture_h5):
        """The saved file must reflect the state AT save time even if the
        buffers are donated/overwritten immediately after."""
        import jax.numpy as jnp
        from deepfluoro_tpu.train.checkpoint import AsyncCheckpointer

        cfg = small_cfg()
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (36, 36))
        first_leaf_before = np.asarray(jax.tree.leaves(state.params)[0]).copy()

        ck = AsyncCheckpointer()
        p = str(tmp_path / "a.pt")
        ck.save(p, meta=cfg.to_checkpoint_meta(), params=state.params,
                batch_stats=state.batch_stats, opt_state=state.opt_state)

        # immediately run a donating step that invalidates the old buffers
        from deepfluoro_tpu.data import AugmentConfig, load_dataset, prepare_batch
        from deepfluoro_tpu.train.step import make_optimizer

        data = load_dataset(fixture_h5, [1])
        tx = make_optimizer(cfg)
        step = make_train_step(cfg, model, tx)
        aug = AugmentConfig(num_classes=7, proj_pad_dim=36, prob_of_aug=0.0)
        b = prepare_batch(aug, jax.random.PRNGKey(1), jnp.asarray(data.projs),
                          jnp.asarray(data.segs), jnp.asarray(data.lands))
        state, _ = step(state, b["proj"], b["seg"], b["heats"], 0.5)

        ck.wait()
        saved = load_checkpoint(p)
        model2, state2 = make_train_state(cfg, jax.random.PRNGKey(0), (36, 36))
        restored = restore_tree(state2.params, saved["model-state-dict"]["params"])
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(restored)[0]), first_leaf_before
        )

    def test_sequential_saves_ordered(self, tmp_path):
        from deepfluoro_tpu.train.checkpoint import AsyncCheckpointer

        cfg = small_cfg(depth=2, init_feats_exp=2, num_lands=0, batch_norm=False)
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (36, 36))
        ck = AsyncCheckpointer()
        p = str(tmp_path / "b.pt")
        for e in range(3):
            ck.save(p, meta=cfg.to_checkpoint_meta(), params=state.params, epoch=e)
        ck.wait()
        assert load_checkpoint(p)["epoch"] == 2

    def test_copy_ordered_after_save(self, tmp_path):
        """copy(src, dst) must see the PENDING save of src (the best-valid
        copy optimization enqueues right behind the checkpoint save)."""
        from deepfluoro_tpu.train.checkpoint import AsyncCheckpointer

        cfg = small_cfg(depth=2, init_feats_exp=2, num_lands=0, batch_norm=False)
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (36, 36))
        ck = AsyncCheckpointer()
        src, dst = str(tmp_path / "ck.pt"), str(tmp_path / "best.pt")
        ck.save(src, meta=cfg.to_checkpoint_meta(), params=state.params, epoch=7)
        ck.copy(src, dst)
        ck.wait()
        assert load_checkpoint(dst)["epoch"] == 7

    def test_worker_error_surfaces_on_wait(self, tmp_path):
        from deepfluoro_tpu.train.checkpoint import AsyncCheckpointer

        cfg = small_cfg(depth=2, init_feats_exp=2, num_lands=0, batch_norm=False)
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (36, 36))
        ck = AsyncCheckpointer()
        bad = str(tmp_path / "no_such_dir" / "x.pt")
        ck.save(bad, meta=cfg.to_checkpoint_meta(), params=state.params, epoch=0)
        with pytest.raises(Exception):
            ck.wait()
        # the checkpointer stays usable after surfacing the error
        good = str(tmp_path / "ok.pt")
        ck.save(good, meta=cfg.to_checkpoint_meta(), params=state.params, epoch=1)
        ck.wait()
        assert load_checkpoint(good)["epoch"] == 1

    def test_stale_tasks_dropped_after_error(self, tmp_path):
        """Tasks queued BEFORE an error surfaced must never run afterwards:
        a copy(src, dst) queued behind a failed save(src) would publish the
        stale src as dst once the caller catches the error and continues
        (ADVICE r2 finding)."""
        import threading
        from deepfluoro_tpu.train.checkpoint import AsyncCheckpointer, save_checkpoint

        cfg = small_cfg(depth=2, init_feats_exp=2, num_lands=0, batch_norm=False)
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (36, 36))
        src, dst = str(tmp_path / "ck.pt"), str(tmp_path / "best.pt")
        # a stale epoch-0 src sits on disk from an earlier save
        save_checkpoint(src, meta=cfg.to_checkpoint_meta(), params=state.params, epoch=0)

        # max_pending > 3: all three tasks must queue against the gated
        # worker without _submit blocking on the bounded queue
        ck = AsyncCheckpointer(max_pending=8)
        # hold the worker so all three tasks are queued before any runs
        gate = threading.Event()
        orig_worker = ck._worker

        def gated_worker():
            gate.wait()
            orig_worker()

        ck._worker = gated_worker
        bad = str(tmp_path / "no_such_dir" / "x.pt")
        ck.save(bad, meta=cfg.to_checkpoint_meta(), params=state.params, epoch=9)
        ck.save(src, meta=cfg.to_checkpoint_meta(), params=state.params, epoch=9)
        ck.copy(src, dst)
        gate.set()
        with pytest.raises(Exception):
            ck.wait()
        # the pre-error epoch-9 save of src and the copy were both dropped:
        # dst must not exist (publishing stale epoch-0 would be wrong too)
        assert not os.path.exists(dst)
        assert load_checkpoint(src)["epoch"] == 0
        # new work after the surfaced error runs normally
        ck.save(src, meta=cfg.to_checkpoint_meta(), params=state.params, epoch=10)
        ck.copy(src, dst)
        ck.wait()
        assert load_checkpoint(dst)["epoch"] == 10


def test_dup_lr_flip_split_is_leak_free(tmp_path, fixture_h5):
    """--dup-lr-flip: the random split happens over the UNDUPLICATED pool
    (indices stored in the checkpoint span exactly range(N)) and mirrors
    join the training side afterwards — no validation frame's mirror can
    train, and resume reconstructs the identical duplicated set."""
    from deepfluoro_tpu.train.loop import fit

    cfg = small_cfg(max_num_epochs=1, train_valid_split=0.75, dup_lr_flip=True)
    ck = str(tmp_path / "ck.pt")
    out = fit(
        fixture_h5, [1, 2], cfg,
        checkpoint_filename=ck,
        best_valid_filename=str(tmp_path / "b.pt"),
        train_loss_txt=str(tmp_path / "tl.txt"),
        valid_loss_txt=str(tmp_path / "vl.txt"),
        verbose=False,
    )
    prev = load_checkpoint(ck)
    n = 16  # 2 specimens x 8 projections, UNduplicated
    used = sorted(prev["train-idx"]) + sorted(prev["valid-idx"])
    assert sorted(used) == list(range(n))
    assert prev["meta"]["dup-lr-flip"] is True

    # resume for one more epoch: same split indices, trains through
    cfg2 = small_cfg(max_num_epochs=2, train_valid_split=0.75, dup_lr_flip=True)
    out2 = fit(
        fixture_h5, [1, 2], cfg2,
        checkpoint_filename=ck,
        best_valid_filename=str(tmp_path / "b.pt"),
        train_loss_txt=str(tmp_path / "tl.txt"),
        valid_loss_txt=str(tmp_path / "vl.txt"),
        verbose=False,
    )
    after = load_checkpoint(ck)
    assert after["epoch"] == 2
    assert list(after["train-idx"]) == list(prev["train-idx"])


def test_remat_fit_matches_plain(tmp_path, fixture_h5):
    """remat through the full fit() loop (fused step, BN, checkpointing):
    same seed and data must give the same losses/params as remat=False up
    to float reassociation, and the flag must persist in checkpoint meta."""
    from deepfluoro_tpu.train.loop import fit

    outs = {}
    for remat in (False, True):
        cfg = small_cfg(max_num_epochs=2, remat=remat)
        ck = str(tmp_path / "ck_{}.pt".format(int(remat)))
        outs[remat] = fit(
            fixture_h5, [1, 2], cfg,
            checkpoint_filename=ck,
            best_valid_filename=str(tmp_path / "b_{}.pt".format(int(remat))),
            train_loss_txt=str(tmp_path / "tl_{}.txt".format(int(remat))),
            valid_loss_txt=str(tmp_path / "vl_{}.txt".format(int(remat))),
            verbose=False,
        )
        assert load_checkpoint(ck)["meta"]["remat"] is remat
    np.testing.assert_allclose(
        outs[True]["best_valid_loss"], outs[False]["best_valid_loss"], rtol=1e-4
    )
    for a, b in zip(
        jax.tree.leaves(outs[False]["state"].params),
        jax.tree.leaves(outs[True]["state"].params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)
