"""REAL multi-process jax.distributed coverage (SURVEY.md §2.3 multi-host
row): two OS processes, 4 virtual CPU devices each, one global 8-device
'data' mesh. Verifies cross-process collectives (identical global loss on
both processes), drop-tail disjoint index sharding, global-batch assembly
from process-local slices, single-writer checkpointing — and that the
2-process global step computes EXACTLY the same loss as a single-process
run of the identical global batch."""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    # pid-derived probe below the ephemeral range (Linux default starts at
    # 32768): a kernel-assigned port released here could be re-allocated to
    # ANY process before the coordinator (a slow jax import away) binds it;
    # a quiet fixed-range slot keyed by pid shrinks that TOCTOU window and
    # keeps parallel test runs off each other's ports
    base = 20000 + (os.getpid() % 10000)
    for off in range(100):
        port = base + off
        s = socket.socket()
        try:
            s.bind(("127.0.0.1", port))
        except OSError:
            continue
        finally:
            s.close()
        return port
    raise RuntimeError("no free port in the probe range")


@pytest.mark.slow
def test_two_process_distributed_step(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # the workers provision their own 4-device CPU backends
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(TESTS_DIR, "mh_worker.py"),
             str(pid), "2", str(port), str(tmp_path)],
            env=env, cwd=os.path.dirname(TESTS_DIR),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out

    def parse(out, tag):
        return [l for l in out.splitlines() if l.startswith(tag)]

    # disjoint drop-tail shards covering 18 of 19 examples
    shard0 = eval(parse(outs[0], "SHARD 0")[0].split(" ", 2)[2])
    shard1 = eval(parse(outs[1], "SHARD 1")[0].split(" ", 2)[2])
    assert len(shard0) == len(shard1) == 9
    assert not set(shard0) & set(shard1)

    # both processes observed the identical global loss
    loss0 = float(parse(outs[0], "LOSS")[0].split()[1])
    loss1 = float(parse(outs[1], "LOSS")[0].split()[1])
    assert loss0 == loss1

    # single-writer: only process 0's checkpoint path exists
    assert "WROTE 0 1" in outs[0]
    assert "WROTE 1 0" in outs[1]
    assert os.path.exists(tmp_path / "mh_ck_p0.pt")
    assert not os.path.exists(tmp_path / "mh_ck_p1.pt")

    # sharded checkpoint round trip with params sharded ACROSS processes:
    # both processes report restored == original checksums and the epoch
    for out in outs:
        line = parse(out, "SHARDED_SUM")[0].split()
        orig, rest, epoch = float(line[1]), float(line[2]), int(line[3])
        assert rest == pytest.approx(orig, rel=1e-6)
        assert epoch == 2
    assert os.path.isdir(tmp_path / "mh_sharded_ck")

    # the distributed loss equals a single-process run of the same global
    # batch (this process has 8 virtual devices via conftest, but the plain
    # unsharded step on one device is the cleanest oracle)
    from deepfluoro_tpu.parallel.multihost import local_shard_indices
    from deepfluoro_tpu.train import TrainConfig, make_train_state
    from deepfluoro_tpu.train.step import make_optimizer, make_train_step

    cfg = TrainConfig(
        num_classes=7, batch_size=8, proj_unet_dim=32, depth=2, init_feats_exp=2,
        batch_norm=True, padding=True, no_max_pool=True, num_lands=4,
        optim_type="sgd", init_lr=0.1, momentum=0.9, nesterov=True, wgt_decay=1e-4,
    )
    rng = np.random.default_rng(7)
    N = 19
    projs = rng.random((N, 32, 32, 1)).astype(np.float32)
    segs = np.eye(7, dtype=np.float32)[rng.integers(0, 7, (N, 32, 32))]
    heats = rng.random((N, 32, 32, 4)).astype(np.float32)

    # reproduce each worker's shard selection: strided over the common
    # (seed=3, epoch=0) permutation; global batch = concat of local slices
    # in process order (make_array_from_process_local_data fills the 'data'
    # axis in global device order: process 0's devices then process 1's)
    perm = np.random.default_rng((3 << 20) ^ 0).permutation(N)[:18]
    sel0, sel1 = perm[0::2][:4], perm[1::2][:4]
    assert set(sel0.tolist()) <= set(shard0) and set(sel1.tolist()) <= set(shard1)
    gsel = np.concatenate([sel0, sel1])

    model, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
    tx = make_optimizer(cfg)
    step1 = make_train_step(cfg, model, tx)
    _, loss_ref = step1(
        state,
        jnp.asarray(projs[gsel]), jnp.asarray(segs[gsel]), jnp.asarray(heats[gsel]),
        0.1,
    )
    assert float(loss_ref) == pytest.approx(loss0, abs=2e-6)


@pytest.mark.slow
def test_two_process_cli_train_default_mesh(tmp_path):
    """The documented pod entry point — cli.train with --coordinator /
    --num-processes / --process-id and NO --dp-devices — must default the
    mesh to every device in the pod (not a degenerate one-device mesh) and
    reproduce the single-process CLI run's loss streams exactly."""
    from deepfluoro_tpu.data.fixtures import write_synthetic_dataset

    h5 = str(tmp_path / "synthetic.h5")
    write_synthetic_dataset(h5, num_specimens=3, num_projs=8, img_dim=32)

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(TESTS_DIR, "mh_cli_worker.py"),
             str(pid), "2", str(port), str(tmp_path), h5],
            env=env, cwd=os.path.dirname(TESTS_DIR),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out

    # the CLI defaulted to the full 4-device data axis (2 procs x 2 devices)
    assert "device mesh: {'data': 4}" in outs[0]
    for out in outs:
        assert "CLI_FIT_DONE" in out

    # single-writer artifacts from process 0 only
    assert os.path.exists(tmp_path / "cli_mh_ck.pt")
    mh_tl = [float(x) for x in open(tmp_path / "cli_mh_tl.txt")]
    mh_vl = [float(x) for x in open(tmp_path / "cli_mh_vl.txt")]

    # parity with the plain single-process CLI run
    from deepfluoro_tpu.cli.train import main

    main([
        h5, "--train-pats", "1,2", "--num-classes", "7",
        "--batch-size", "4", "--unet-img-dim", "36", "--unet-num-lvls", "2",
        "--unet-init-feats-exp", "3", "--unet-batch-norm", "--unet-padding",
        "--unet-no-max-pool", "--use-lands", "--train-valid-split", "0.75",
        "--max-num-epochs", "2", "--lr-sched", "plateau", "--init-lr", "0.05",
        "--momentum", "0.9", "--nesterov", "--wgt-decay", "1e-4", "--no-gpu",
        "--checkpoint-net", str(tmp_path / "cli_1p_ck.pt"),
        "--best-net", str(tmp_path / "cli_1p_best.pt"),
        "--train-loss-txt", str(tmp_path / "cli_1p_tl.txt"),
        "--valid-loss-txt", str(tmp_path / "cli_1p_vl.txt"),
    ])
    tl1 = [float(x) for x in open(tmp_path / "cli_1p_tl.txt")]
    vl1 = [float(x) for x in open(tmp_path / "cli_1p_vl.txt")]
    np.testing.assert_allclose(mh_tl, tl1, rtol=1e-5)
    np.testing.assert_allclose(mh_vl, vl1, rtol=1e-5)


@pytest.mark.slow
def test_two_process_fit_streaming_disjoint_loading(tmp_path):
    """Per-host disjoint data loading (SURVEY §2.3 DP row, VERDICT r3 #4):
    fit(stream_data=True) under jax.distributed must (a) never materialize
    the training union on any host — the worker traps load_dataset — (b)
    read only each host's slice of every global batch from the archive, and
    (c) reproduce the single-process trajectory exactly."""
    from deepfluoro_tpu.data.fixtures import write_synthetic_dataset

    h5 = str(tmp_path / "synthetic.h5")
    write_synthetic_dataset(h5, num_specimens=3, num_projs=8, img_dim=32)

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(TESTS_DIR, "mh_fit_worker.py"),
             str(pid), "2", str(port), str(tmp_path), h5, "1"],
            env=env, cwd=os.path.dirname(TESTS_DIR),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out

    def grab(out, tag):
        return [l.split() for l in out.splitlines() if l.startswith(tag)]

    # per-host reads: the 4-row validation subset once, then EXACTLY this
    # host's half of each epoch's 12 training rows (2 epochs x 6) — far
    # below the 16-row union a replicating loader would hold
    for out in outs:
        _, _, vrows, trows = grab(out, "FIT_ROWS")[0]
        assert int(vrows) == 4
        assert int(trows) == 12
        assert int(trows) < 16
        # the streaming path is disjoint — the resident-feed replication
        # warning must not fire here
        assert "multi-host RESIDENT feed" not in out

    bvl0 = float(grab(outs[0], "FIT_BVL")[0][2])
    assert bvl0 == float(grab(outs[1], "FIT_BVL")[0][2])

    # trajectory parity with a plain single-process fit()
    from deepfluoro_tpu.train import TrainConfig, fit

    cfg = TrainConfig(
        num_classes=7, batch_size=4, proj_unet_dim=36, depth=2, init_feats_exp=3,
        batch_norm=True, padding=True, no_max_pool=True, num_lands=14,
        optim_type="sgd", init_lr=0.05, momentum=0.9, nesterov=True, wgt_decay=1e-4,
        lr_sched_meth="plateau", max_num_epochs=2, heat_coeff=0.5,
        train_valid_split=0.75, data_aug=False, checkpoint_freq=1, seed=0,
    )
    fit(
        h5, [1, 2], cfg,
        checkpoint_filename=str(tmp_path / "fits_1p_ck.pt"),
        best_valid_filename=str(tmp_path / "fits_1p_best.pt"),
        train_loss_txt=str(tmp_path / "fits_1p_tl.txt"),
        valid_loss_txt=str(tmp_path / "fits_1p_vl.txt"),
        verbose=False,
    )
    for mh_name, sp_name in (
        ("fit_mhs_tl.txt", "fits_1p_tl.txt"),
        ("fit_mhs_vl.txt", "fits_1p_vl.txt"),
    ):
        mh = [float(x) for x in open(tmp_path / mh_name)]
        sp = [float(x) for x in open(tmp_path / sp_name)]
        assert len(mh) > 0
        np.testing.assert_allclose(mh, sp, rtol=1e-5)


def _run_mh_folds(tmp_path, h5, stream: int):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(TESTS_DIR, "mh_folds_worker.py"),
             str(pid), "2", str(port), str(tmp_path), h5, str(stream)],
            env=env, cwd=os.path.dirname(TESTS_DIR),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        # generous: a worker pair on this 1-CPU box takes ~7-10 min alone
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
        assert p.returncode == 0, out
    return outs


def _folds_oracle(tmp_path, h5):
    """Single-process fit_multifold on a 4-device 'ensemble' mesh (this
    process has 8 conftest devices) — the trajectory the 2-process run must
    reproduce exactly."""
    import jax as _jax

    from deepfluoro_tpu.parallel import make_mesh
    from deepfluoro_tpu.train import TrainConfig
    from deepfluoro_tpu.train.multifold import fit_multifold

    cfg = TrainConfig(
        num_classes=7, batch_size=4, proj_unet_dim=36, depth=2, init_feats_exp=3,
        batch_norm=True, padding=True, no_max_pool=True, num_lands=14,
        optim_type="sgd", init_lr=0.05, momentum=0.9, nesterov=True, wgt_decay=1e-4,
        lr_sched_meth="plateau", max_num_epochs=2, heat_coeff=0.5,
        train_valid_split=0.75, data_aug=False, checkpoint_freq=1, seed=0,
    )
    mesh = make_mesh({"ensemble": 4}, devices=_jax.devices()[:4])
    return fit_multifold(
        h5, [1, 2, 3, 4], cfg,
        checkpoint_prefix=str(tmp_path / "mf_1p_ck"),
        best_prefix=str(tmp_path / "mf_1p_best"),
        train_loss_txt_prefix=str(tmp_path / "mf_1p_tl"),
        valid_loss_txt_prefix=str(tmp_path / "mf_1p_vl"),
        mesh=mesh,
        verbose=False,
    )


@pytest.mark.slow
def test_two_process_multifold(tmp_path):
    """The flagship beyond-reference capability on a pod (VERDICT r3 #3):
    fit_multifold's fold axis sharded across two REAL jax.distributed
    processes — identical per-fold best-valid losses on both processes,
    single-writer per-fold checkpoints, and the training trajectory
    identical to the single-process 4-device sharded run."""
    from deepfluoro_tpu.data.fixtures import write_synthetic_dataset

    h5 = str(tmp_path / "synthetic.h5")
    write_synthetic_dataset(h5, num_specimens=4, num_projs=8, img_dim=32)

    outs = _run_mh_folds(tmp_path, h5, stream=0)

    def grab(out, tag):
        return [l.split() for l in out.splitlines() if l.startswith(tag)]

    assert grab(outs[0], "FOLDS_EPOCH")[0][2] == grab(outs[1], "FOLDS_EPOCH")[0][2] == "2"
    bvl0 = [float(v) for v in grab(outs[0], "FOLDS_BVL")[0][2:]]
    bvl1 = [float(v) for v in grab(outs[1], "FOLDS_BVL")[0][2:]]
    assert bvl0 == bvl1 and len(bvl0) == 4

    # single-writer artifacts: per-fold checkpoint + best files exist once
    for spec in (1, 2, 3, 4):
        assert os.path.exists(tmp_path / "mf_mh_ck_spec{:02d}.pt".format(spec))
        assert os.path.exists(tmp_path / "mf_mh_best_spec{:02d}.pt".format(spec))

    out1 = _folds_oracle(tmp_path, h5)
    np.testing.assert_allclose(
        bvl0, np.asarray(out1["best_valid_losses"]), rtol=1e-5
    )
    for spec in (1, 2, 3, 4):
        for pre_mh, pre_1p in (("mf_mh_tl", "mf_1p_tl"), ("mf_mh_vl", "mf_1p_vl")):
            mh = [float(x) for x in open(tmp_path / "{}_spec{:02d}.txt".format(pre_mh, spec))]
            sp = [float(x) for x in open(tmp_path / "{}_spec{:02d}.txt".format(pre_1p, spec))]
            assert len(mh) > 0
            np.testing.assert_allclose(mh, sp, rtol=1e-5)

    # the written fold checkpoints restore to the SAME nets both ways
    from deepfluoro_tpu.train.checkpoint import load_checkpoint

    for spec in (1, 2, 3, 4):
        mh = load_checkpoint(str(tmp_path / "mf_mh_best_spec{:02d}.pt".format(spec)))
        sp = load_checkpoint(str(tmp_path / "mf_1p_best_spec{:02d}.pt".format(spec)))
        mh_sum = sum(
            np.abs(np.asarray(v)).sum()
            for v in jax.tree.leaves(mh["model-state-dict"]["params"])
        )
        sp_sum = sum(
            np.abs(np.asarray(v)).sum()
            for v in jax.tree.leaves(sp["model-state-dict"]["params"])
        )
        assert float(mh_sum) == pytest.approx(float(sp_sum), rel=1e-5)


@pytest.mark.slow
def test_two_process_train_folds_cli_default_mesh(tmp_path):
    """The documented pod entry for fold training — cli.train_folds with
    --coordinator/--num-processes/--process-id and NO --ensemble-devices —
    must default the 'ensemble' mesh to every pod device and complete the
    lockstep fold program with single-writer artifacts."""
    from deepfluoro_tpu.data.fixtures import write_synthetic_dataset

    h5 = str(tmp_path / "synthetic.h5")
    write_synthetic_dataset(h5, num_specimens=4, num_projs=8, img_dim=32)

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(TESTS_DIR, "mh_folds_cli_worker.py"),
             str(pid), "2", str(port), str(tmp_path), h5],
            env=env, cwd=os.path.dirname(TESTS_DIR),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
        assert p.returncode == 0, out

    assert "device mesh: {'ensemble': 4}" in outs[0]
    for out in outs:
        assert "CLI_FOLDS_DONE" in out
    # process 0 printed the per-fold summary; process 1 stayed quiet
    assert "best valid" in outs[0]
    assert "best valid" not in outs[1]
    for spec in (1, 2, 3, 4):
        assert os.path.exists(tmp_path / "cli_mf_best_spec{:02d}.pt".format(spec))
        assert os.path.exists(tmp_path / "cli_mf_ck_spec{:02d}.pt".format(spec))
        assert os.path.exists(tmp_path / "cli_mf_vl_spec{:02d}.txt".format(spec))


@pytest.mark.slow
def test_two_process_multifold_streaming(tmp_path):
    """Streaming (host-resident union) multifold across two processes: the
    producer-thread batches device_put fold-sharded over the pod mesh must
    reproduce the resident-mode single-process trajectory (stream parity and
    pod parity composed in one equality chain)."""
    from deepfluoro_tpu.data.fixtures import write_synthetic_dataset

    h5 = str(tmp_path / "synthetic.h5")
    write_synthetic_dataset(h5, num_specimens=4, num_projs=8, img_dim=32)

    outs = _run_mh_folds(tmp_path, h5, stream=1)

    def grab(out, tag):
        return [l.split() for l in out.splitlines() if l.startswith(tag)]

    bvl0 = [float(v) for v in grab(outs[0], "FOLDS_BVL")[0][2:]]
    bvl1 = [float(v) for v in grab(outs[1], "FOLDS_BVL")[0][2:]]
    assert bvl0 == bvl1 and len(bvl0) == 4

    out1 = _folds_oracle(tmp_path, h5)
    np.testing.assert_allclose(
        bvl0, np.asarray(out1["best_valid_losses"]), rtol=1e-5
    )
    for spec in (1, 2, 3, 4):
        mh = [float(x) for x in open(tmp_path / "mf_mh_tl_spec{:02d}.txt".format(spec))]
        sp = [float(x) for x in open(tmp_path / "mf_1p_tl_spec{:02d}.txt".format(spec))]
        np.testing.assert_allclose(mh, sp, rtol=1e-5)


@pytest.mark.slow
def test_two_process_fit_end_to_end(tmp_path):
    """The FLAGSHIP loop (train.loop.fit) across two real jax.distributed
    processes: identical global losses on both, single-writer checkpoints,
    and the training trajectory sample-identical to a single-process run
    (the contiguous-chunk batch assembly guarantees the same global batch
    sequence)."""
    from deepfluoro_tpu.data.fixtures import write_synthetic_dataset

    h5 = str(tmp_path / "synthetic.h5")
    write_synthetic_dataset(h5, num_specimens=3, num_projs=8, img_dim=32)

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(TESTS_DIR, "mh_fit_worker.py"),
             str(pid), "2", str(port), str(tmp_path), h5],
            env=env, cwd=os.path.dirname(TESTS_DIR),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out

    def grab(out, tag):
        return [l.split() for l in out.splitlines() if l.startswith(tag)]

    # both processes finished 2 epochs and observed the identical global
    # validation loss and final parameters
    assert grab(outs[0], "FIT_EPOCH")[0][2] == grab(outs[1], "FIT_EPOCH")[0][2] == "2"
    bvl0 = float(grab(outs[0], "FIT_BVL")[0][2])
    bvl1 = float(grab(outs[1], "FIT_BVL")[0][2])
    assert bvl0 == bvl1
    sum0 = float(grab(outs[0], "FIT_SUM")[0][2])
    sum1 = float(grab(outs[1], "FIT_SUM")[0][2])
    assert sum0 == pytest.approx(sum1, rel=1e-7)

    # VERDICT r4 #6: the resident pod feed replicates the union into every
    # host — process 0 must announce it and point at --stream-data (even
    # under verbose=False; it is a footgun warning, not a progress line)
    assert "multi-host RESIDENT feed" in outs[0]
    assert "--stream-data" in outs[0]

    # single-writer artifacts exist exactly once (written by process 0)
    assert os.path.exists(tmp_path / "fit_mh_ck.pt")
    assert os.path.exists(tmp_path / "fit_mh_best.pt")
    mh_tl = [float(x) for x in open(tmp_path / "fit_mh_tl.txt")]
    mh_vl = [float(x) for x in open(tmp_path / "fit_mh_vl.txt")]
    assert len(mh_vl) == 2

    # the 2-process run is trajectory-identical to a single-process fit()
    from deepfluoro_tpu.train import TrainConfig, fit

    cfg = TrainConfig(
        num_classes=7, batch_size=4, proj_unet_dim=36, depth=2, init_feats_exp=3,
        batch_norm=True, padding=True, no_max_pool=True, num_lands=14,
        optim_type="sgd", init_lr=0.05, momentum=0.9, nesterov=True, wgt_decay=1e-4,
        lr_sched_meth="plateau", max_num_epochs=2, heat_coeff=0.5,
        train_valid_split=0.75, data_aug=False, checkpoint_freq=1, seed=0,
    )
    out1 = fit(
        h5, [1, 2], cfg,
        checkpoint_filename=str(tmp_path / "fit_1p_ck.pt"),
        best_valid_filename=str(tmp_path / "fit_1p_best.pt"),
        train_loss_txt=str(tmp_path / "fit_1p_tl.txt"),
        valid_loss_txt=str(tmp_path / "fit_1p_vl.txt"),
        verbose=False,
    )
    tl1 = [float(x) for x in open(tmp_path / "fit_1p_tl.txt")]
    vl1 = [float(x) for x in open(tmp_path / "fit_1p_vl.txt")]
    np.testing.assert_allclose(mh_tl, tl1, rtol=1e-5)
    np.testing.assert_allclose(mh_vl, vl1, rtol=1e-5)
    sum_1p = float(
        sum(np.abs(np.asarray(x)).sum() for x in jax.tree.leaves(out1["state"].params))
    )
    assert sum0 == pytest.approx(sum_1p, rel=1e-6)
