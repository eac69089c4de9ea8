"""Golden parity for the inference/eval layer against the ACTUAL reference
code (extends tests/test_reference_golden.py, which covers model/losses/
dataset/schedules, to SURVEY §2.1 components 9-12 and 18).

Oracles exercised here, all run as-is from /root/reference/train_test_code:

* ``util.center_crop`` / ``util.get_gaussian_2d_heatmap`` (component 18);
* ``util.test_dataset`` / ``util.test_dataset_ensemble`` (component 9's loss
  harnesses) vs infer.ensemble.test_dataset_ensemble on the SAME imported
  checkpoints — the ensemble averaging + joint-loss semantics;
* ``util.seg_dataset_ensemble`` (component 9's HDF5 writer, the documented
  inference path, util.py:293-377) vs infer.ensemble.seg_dataset_ensemble:
  same nets -> same nn-segs argmax maps and per-net min-max-normalized
  averaged nn-heats;
* the REAL ``est_lands_csv.py`` and ``compute_actual_dice_on_test.py``
  scripts (components 11-12 are ``__main__``-only, so they run via runpy
  with patched argv) vs this framework's CLIs on identical artifacts —
  CSV-row parity across found / seg-gated / NCC-rejected landmark cases and
  the hard-Dice ``{:.2f}`` contract including both-empty -> 1.0.
"""

import math
import os
import runpy
import sys
import types

import h5py as h5
import numpy as np
import pytest

REF_DIR = "/root/reference/train_test_code"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference code not available"
)

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import test_reference_golden as trg  # noqa: E402  (shared shim + importers)
from deepfluoro_tpu.data.fixtures import (  # noqa: E402
    DEFAULT_LAND_NAMES,
    write_synthetic_dataset,
)


@pytest.fixture(scope="module")
def ref():
    trg._install_torchvision_shim()
    sys.path.insert(0, REF_DIR)
    try:
        import importlib

        yield types.SimpleNamespace(
            unet=importlib.import_module("unet"),
            dataset=importlib.import_module("dataset"),
            util=importlib.import_module("util"),
            dice=importlib.import_module("dice"),
            warm_restarts_lr=importlib.import_module("warm_restarts_lr"),
        )
    finally:
        sys.path.remove(REF_DIR)


@pytest.fixture(scope="module")
def fixture_h5(tmp_path_factory):
    path = tmp_path_factory.mktemp("golden_infer") / "synthetic.h5"
    return write_synthetic_dataset(str(path), num_specimens=1, num_projs=5, img_dim=32)


def _run_reference_script(script_name, argv):
    """Execute a ``__main__``-only reference CLI exactly as shipped."""
    import io

    trg._install_torchvision_shim()
    old_argv = sys.argv
    sys.path.insert(0, REF_DIR)
    sys.argv = [script_name] + [str(a) for a in argv]
    try:
        g = runpy.run_path(os.path.join(REF_DIR, script_name), run_name="__main__")
        # est_lands_csv.py never closes csv_out; as a process the interpreter
        # exit flushes it, in-process we must (compute_actual_dice closes its
        # own)
        for v in g.values():
            if isinstance(v, io.IOBase) and not v.closed:
                v.close()
    finally:
        sys.argv = old_argv
        sys.path.remove(REF_DIR)


# --------------------------------------------------------------------------
# component 18: utility kit vs the real util.py
# --------------------------------------------------------------------------

class TestGoldenUtilKit:
    def test_center_crop_parity(self, ref, rng):
        from deepfluoro_tpu.ops.image import center_crop

        for src, dst in [((37, 41), (24, 28)), ((16, 16), (16, 16)), ((9, 8), (8, 7))]:
            img2 = rng.standard_normal(src).astype(np.float32)
            want = ref.util.center_crop(torch.from_numpy(img2), dst).numpy()
            got = np.asarray(center_crop(jnp.asarray(img2), dst))
            np.testing.assert_array_equal(got, want)

            img4 = rng.standard_normal((2, 3) + src).astype(np.float32)
            want4 = ref.util.center_crop(torch.from_numpy(img4), dst).numpy()
            got4 = np.asarray(
                center_crop(jnp.asarray(img4), dst, spatial_axes=(2, 3))
            )
            np.testing.assert_array_equal(got4, want4)

    def test_gaussian_template_parity(self, ref):
        from deepfluoro_tpu.ops.heatmap import gaussian_heatmap

        want = ref.util.get_gaussian_2d_heatmap(25, 25, 2.5).numpy()
        got = np.asarray(gaussian_heatmap(25, 25, 2.5))
        np.testing.assert_allclose(got, want, atol=1e-7)

        # off-center peak + even dims (default-peak integer division)
        want = ref.util.get_gaussian_2d_heatmap(24, 30, 1.75, 5, 21.5).numpy()
        got = np.asarray(gaussian_heatmap(24, 30, 1.75, 5, 21.5))
        np.testing.assert_allclose(got, want, atol=1e-7)
        want = ref.util.get_gaussian_2d_heatmap(24, 30, 3.0).numpy()
        got = np.asarray(gaussian_heatmap(24, 30, 3.0))
        np.testing.assert_allclose(got, want, atol=1e-7)


# --------------------------------------------------------------------------
# component 9: the real util.py eval/inference harnesses as oracles
# --------------------------------------------------------------------------

NUM_LANDS = len(DEFAULT_LAND_NAMES)
PAD_DIM = 40

TORCH_CFG = dict(
    num_classes=7, depth=2, init_feats_exp=3, padding=True, batch_norm=True,
    no_max_pool=True, num_lands=NUM_LANDS, use_res=True, block_depth=2,
)


@pytest.fixture(scope="module")
def nets(ref):
    """Two real reference UNets (random weights, eval mode) + their imports
    into this framework via compat.torch_import."""
    pairs = []
    for seed in (11, 23):
        torch.manual_seed(seed)
        net = ref.unet.UNet(
            in_channels=1, n_classes=7, depth=2, wf=3, padding=True,
            batch_norm=True, max_pool=False, num_lands=NUM_LANDS, do_res=True,
            block_depth=2,
        )
        net.eval()
        model, variables = trg._flax_from_torch(net, {}, TORCH_CFG)
        pairs.append((net, model, variables))
    return pairs


class TestGoldenLossHarnesses:
    def test_test_dataset_single_net(self, ref, fixture_h5, nets):
        """Real util.test_dataset (batch-1 joint loss mean/std,
        util.py:116-165) vs test_dataset_ensemble with one net."""
        from deepfluoro_tpu.data.hdf5 import load_dataset
        from deepfluoro_tpu.infer.ensemble import test_dataset_ensemble

        net, model, variables = nets[0]
        ds_ref = ref.dataset.get_dataset(
            fixture_h5, [1], num_classes=7, pad_img_dim=PAD_DIM
        )
        want_mean, want_std = ref.util.test_dataset(
            ds_ref, net, dev=torch.device("cpu"), num_lands=NUM_LANDS
        )

        data = load_dataset(fixture_h5, [1])
        got_mean, got_std = test_dataset_ensemble(
            data, [(model, variables)], num_lands=NUM_LANDS, pad_img_dim=PAD_DIM
        )
        assert got_mean == pytest.approx(float(want_mean), abs=2e-5)
        assert got_std == pytest.approx(float(want_std), abs=2e-5)

    @pytest.mark.parametrize("dice_only", [False, True])
    def test_test_dataset_ensemble(self, ref, fixture_h5, nets, dice_only):
        """Real util.test_dataset_ensemble (prediction averaging BEFORE the
        loss, no heat normalization, util.py:167-241) vs ours."""
        from deepfluoro_tpu.data.hdf5 import load_dataset
        from deepfluoro_tpu.infer.ensemble import test_dataset_ensemble

        ds_ref = ref.dataset.get_dataset(
            fixture_h5, [1], num_classes=7, pad_img_dim=PAD_DIM
        )
        want_mean, want_std = ref.util.test_dataset_ensemble(
            ds_ref, [p[0] for p in nets], dev=torch.device("cpu"),
            num_lands=NUM_LANDS, dice_only=dice_only,
        )

        data = load_dataset(fixture_h5, [1])
        got_mean, got_std = test_dataset_ensemble(
            data, [(p[1], p[2]) for p in nets], num_lands=NUM_LANDS,
            dice_only=dice_only, pad_img_dim=PAD_DIM,
        )
        assert got_mean == pytest.approx(float(want_mean), abs=2e-5)
        assert got_std == pytest.approx(float(want_std), abs=2e-5)


class TestGoldenSegDatasetEnsemble:
    def test_output_archives_match(self, ref, fixture_h5, nets, tmp_path):
        """The documented inference path end-to-end: the real
        util.seg_dataset_ensemble and this framework's write the same
        nn-segs argmax maps and the same per-net-min-max-normalized averaged
        nn-heats from the same two checkpoints."""
        from deepfluoro_tpu.data.hdf5 import load_dataset
        from deepfluoro_tpu.infer.ensemble import seg_dataset_ensemble

        ds_ref = ref.dataset.get_dataset(
            fixture_h5, [1], num_classes=7, pad_img_dim=PAD_DIM, no_seg=True
        )
        ref_out = str(tmp_path / "ref_out.h5")
        with h5.File(ref_out, "w") as f:
            ref.util.seg_dataset_ensemble(
                ds_ref, [p[0] for p in nets], f, dev=None,
                num_lands=NUM_LANDS, times=[],
            )

        data = load_dataset(fixture_h5, [1], no_seg=True)
        our_out = str(tmp_path / "our_out.h5")
        with h5.File(our_out, "w") as f:
            seg_dataset_ensemble(
                data, [(p[1], p[2]) for p in nets], f,
                num_lands=NUM_LANDS, pad_img_dim=PAD_DIM,
            )

        with h5.File(ref_out, "r") as fr, h5.File(our_out, "r") as fo:
            segs_ref = fr["nn-segs"][:]
            segs_our = fo["nn-segs"][:]
            heats_ref = fr["nn-heats"][:]
            heats_our = fo["nn-heats"][:]
            assert fo["nn-segs"].dtype == fr["nn-segs"].dtype == np.uint8
            assert fo["nn-segs"].compression == fr["nn-segs"].compression == "gzip"

        # same-checkpoint -> same argmax maps (SURVEY §4(c)); tolerate only
        # pixels where backend fp differences could legitimately flip a
        # near-tied argmax — there must be almost none on smooth softmax maps
        mismatch = float(np.mean(segs_ref != segs_our))
        assert mismatch <= 0.002, mismatch
        np.testing.assert_allclose(heats_our, heats_ref, atol=2e-4)

    def test_single_net_seg_dataset_argmax(self, ref, fixture_h5, nets, tmp_path):
        """Real util.seg_dataset (single net, no heat normalization,
        util.py:243-291) vs our seg_dataset: identical argmax maps. (Heats
        deliberately diverge: this framework normalizes in both paths —
        documented divergence, monotone per image, argmax-invariant.)"""
        from deepfluoro_tpu.data.hdf5 import load_dataset
        from deepfluoro_tpu.infer.ensemble import seg_dataset

        net, model, variables = nets[0]
        ds_ref = ref.dataset.get_dataset(
            fixture_h5, [1], num_classes=7, pad_img_dim=PAD_DIM, no_seg=True
        )
        ref_out = str(tmp_path / "ref_single.h5")
        with h5.File(ref_out, "w") as f:
            ref.util.seg_dataset(ds_ref, net, f, dev=None, num_lands=NUM_LANDS)

        data = load_dataset(fixture_h5, [1], no_seg=True)
        our_out = str(tmp_path / "our_single.h5")
        with h5.File(our_out, "w") as f:
            seg_dataset(
                data, (model, variables), f,
                num_lands=NUM_LANDS, pad_img_dim=PAD_DIM,
            )

        with h5.File(ref_out, "r") as fr, h5.File(our_out, "r") as fo:
            mismatch = float(np.mean(fr["nn-segs"][:] != fo["nn-segs"][:]))
        assert mismatch <= 0.002, mismatch


# --------------------------------------------------------------------------
# components 11-12: the real eval scripts as oracles (runpy)
# --------------------------------------------------------------------------

def _quadrant_segs(n, hw):
    """Label maps covering every seg class the landmark gate uses
    (est_lands_csv.py:56-73 -> {1, 2, 5, 6}), with a background ring."""
    segs = np.zeros((n, hw, hw), np.uint8)
    half = hw // 2
    segs[:, 2:half, 2:half] = 1
    segs[:, 2:half, half:-2] = 2
    segs[:, half:-2, 2:half] = 5
    segs[:, half:-2, half:-2] = 6
    return segs


def _gaussian(hw, r, c, sigma=2.5):
    yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32)
    return np.exp(((xx - c) ** 2 + (yy - r) ** 2) / (sigma * sigma * -2.0))


@pytest.fixture(scope="module")
def decode_archive(tmp_path_factory):
    """A controlled inference archive: per (proj, landmark) heatmaps hitting
    the found / wrong-seg-class / flat-rejected branches of rule 3."""
    d = tmp_path_factory.mktemp("decode")
    path = str(d / "est.h5")
    hw, n = 64, 4
    gate = {  # est_lands_csv.py:56-73
        "FH-l": 5, "FH-r": 6, "GSN-l": 1, "GSN-r": 2, "IOF-l": 1, "IOF-r": 2,
        "MOF-l": 1, "MOF-r": 2, "SPS-l": 1, "SPS-r": 2, "IPS-l": 1, "IPS-r": 2,
        "ASIS-l": 1, "ASIS-r": 2, "PSIS-l": 1, "PSIS-r": 2, "PIIS-l": 1,
        "PIIS-r": 2,
    }
    # centers of the quadrants holding each label (see _quadrant_segs)
    centers = {1: (17, 17), 2: (17, 47), 5: (47, 17), 6: (47, 47)}
    segs = _quadrant_segs(n, hw)
    heats = np.zeros((n, NUM_LANDS, hw, hw), np.float32)
    for i in range(n):
        for li, name in enumerate(DEFAULT_LAND_NAMES):
            g = gate[name]
            case = (i + li) % 3
            if case == 0:  # clean peak inside the gated class -> found
                r, c = centers[g]
                heats[i, li] = _gaussian(hw, r + (li % 5) - 2, c + (i % 3) - 1)
            elif case == 1:  # peak inside a different class -> gated
                # argmax lands on a smooth monotone tail (wide sigma keeps a
                # strict unique in-region max; a narrow one underflows to
                # all-zero ties); the NCC gate rejects the ramp-shaped ROI
                other = {1: 6, 2: 5, 5: 2, 6: 1}[g]
                r, c = centers[other]
                heats[i, li] = _gaussian(hw, r, c, sigma=6.0)
            # case 2: all-zero heat -> rejected
    with h5.File(path, "w") as f:
        from deepfluoro_tpu.data.hdf5 import write_land_names

        write_land_names(f, DEFAULT_LAND_NAMES)
        f.create_dataset("nn-segs", data=segs)
        f.create_dataset("nn-heats", data=heats)
    return path


def _read_land_rows(csv_path):
    lines = open(csv_path).read().strip().splitlines()
    assert lines[0] == "pat,proj,land,row,col,time"
    rows = []
    for ln in lines[1:]:
        p, i, l, r, c, _t = ln.split(",")
        rows.append((int(p), int(i), int(l), int(r), int(c)))
    return rows


class TestGoldenEstLandsScript:
    @pytest.mark.parametrize("use_seg", [True, False], ids=["seg_gated", "no_seg"])
    def test_csv_parity(self, ref, decode_archive, tmp_path, use_seg):
        from deepfluoro_tpu.cli import est_lands_csv as our_cli

        ref_csv = str(tmp_path / "ref_{}.csv".format(use_seg))
        our_csv = str(tmp_path / "our_{}.csv".format(use_seg))
        extra = ["--use-seg", "nn-segs"] if use_seg else []
        _run_reference_script(
            "est_lands_csv.py",
            [decode_archive, "nn-heats", "--pat", 1, "--out", ref_csv] + extra,
        )
        our_cli.main(
            [decode_archive, "nn-heats", "--pat", "1", "--out", our_csv] + extra
        )

        want = _read_land_rows(ref_csv)
        got = _read_land_rows(our_csv)
        assert got == want

        # the fixture must actually exercise both branches
        found = [r for r in want if r[3] >= 0]
        rejected = [r for r in want if r[3] == -1]
        assert found and rejected


class TestGoldenDiceScript:
    def test_csv_parity(self, ref, fixture_h5, tmp_path):
        """Real compute_actual_dice_on_test.py vs our CLI on a perturbed
        estimate: byte-identical CSVs (incl. the {:.2f} contract and the
        both-empty -> 1.00 branch via an emptied class)."""
        from deepfluoro_tpu.cli import compute_actual_dice_on_test as our_cli

        with h5.File(fixture_h5, "r") as f:
            gt = f["01/segs"][:]
        gt = gt.copy()
        gt[gt == 4] = 1  # guarantee a label empty in BOTH gt and est
        gt_path = str(tmp_path / "gt_ds.h5")
        with h5.File(gt_path, "w") as f:
            f.create_dataset("01/segs", data=gt.astype(np.uint8))
        est = np.roll(gt, shift=2, axis=2)
        est[0] = 0  # first projection all background
        est[est == 3] = 5  # and a class empty in est but not (necessarily) gt
        est_path = str(tmp_path / "est_segs.h5")
        with h5.File(est_path, "w") as f:
            f.create_dataset("nn-segs", data=est.astype(np.uint8))

        ref_csv = str(tmp_path / "ref_dice.csv")
        our_csv = str(tmp_path / "our_dice.csv")
        _run_reference_script(
            "compute_actual_dice_on_test.py",
            [gt_path, est_path, "nn-segs", ref_csv, 1],
        )
        our_cli.main([gt_path, est_path, "nn-segs", our_csv, "1"])

        want = open(ref_csv).read()
        got = open(our_csv).read()
        assert got == want
        assert ",1.00" in want  # the both-empty quirk fired somewhere


# --------------------------------------------------------------------------
# reverse migration: checkpoints trained HERE, consumed by the REAL
# reference stack (export_torch_checkpoint)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def native_trained(fixture_h5, tmp_path_factory):
    """A native checkpoint from a real (tiny) fit() run: live BN stats,
    SGD momentum in the opt state, cos scheduler state, split indices."""
    from deepfluoro_tpu.train.config import TrainConfig
    from deepfluoro_tpu.train.loop import fit

    d = tmp_path_factory.mktemp("native_train")
    ck = str(d / "native_ck.pt")
    cfg = TrainConfig(
        num_classes=7, depth=2, init_feats_exp=3, batch_norm=True,
        padding=True, no_max_pool=True, num_lands=NUM_LANDS,
        proj_unet_dim=PAD_DIM, batch_size=4, max_num_epochs=2,
        init_lr=0.01, momentum=0.9, nesterov=True, wgt_decay=1e-4,
        lr_sched_meth="cos", lrs_num_epochs=10, train_valid_split=0.8,
        use_res=True, block_depth=2, seed=9,
    )
    fit(
        fixture_h5, [1], cfg,
        checkpoint_filename=ck,
        best_valid_filename=str(d / "best.pt"),
        train_loss_txt=str(d / "tl.txt"),
        valid_loss_txt=str(d / "vl.txt"),
        verbose=False,
    )
    return ck


class TestGoldenTorchExport:
    @pytest.mark.parametrize(
        "tkw",
        [
            dict(depth=2, wf=3, padding=True, batch_norm=True, max_pool=False,
                 num_lands=14, do_res=True, block_depth=2),
            dict(depth=3, wf=2, padding=True, batch_norm=False, max_pool=True,
                 num_lands=0, do_res=True, block_depth=3),
            dict(depth=2, wf=3, padding=True, batch_norm=True, max_pool=False,
                 num_lands=0, do_res=False, block_depth=1),
        ],
        ids=["paper_style", "maxpool_deep", "no_res"],
    )
    def test_exported_names_match_real_net(self, ref, tkw):
        """The exported state dict must list exactly the real reference
        net's keys IN REGISTRATION ORDER (torch's parameters() order keys
        the optimizer state) with matching shapes."""
        import jax

        from deepfluoro_tpu.compat.torch_import import export_torch_state_dict
        from deepfluoro_tpu.train.config import TrainConfig
        from deepfluoro_tpu.train.step import make_train_state

        net = ref.unet.UNet(in_channels=1, n_classes=7, **tkw)
        cfg = TrainConfig(
            num_classes=7, depth=tkw["depth"], init_feats_exp=tkw["wf"],
            padding=tkw["padding"], batch_norm=tkw["batch_norm"],
            no_max_pool=not tkw["max_pool"], num_lands=tkw["num_lands"],
            use_res=tkw["do_res"], block_depth=tkw["block_depth"],
            proj_unet_dim=32,
        )
        _, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        sd, param_paths = export_torch_state_dict(
            cfg, state.params, state.batch_stats
        )
        want = net.state_dict()
        assert list(sd.keys()) == list(want.keys())
        for k in sd:
            assert tuple(sd[k].shape) == tuple(want[k].shape), k
        # parameter ordering: one path per real net parameter
        assert len(param_paths) == len(list(net.parameters()))

    def test_reference_stack_runs_our_export(self, ref, fixture_h5, native_trained, tmp_path):
        """Reverse migration end-to-end: export a checkpoint our fit()
        trained, run the REAL test_ensemble.py on it, and compare its
        archive against our own CLI on the native file — same model, two
        stacks, matching outputs."""
        from deepfluoro_tpu.cli import export_torch_net, test_ensemble as our_cli

        exported = str(tmp_path / "exported.pt")
        export_torch_net.main([native_trained, exported])

        ref_out = str(tmp_path / "ref_out.h5")
        our_out = str(tmp_path / "our_out.h5")
        _run_reference_script(
            "test_ensemble.py",
            [fixture_h5, ref_out, "--pats", "1", "--no-gpu",
             "--nets", exported, exported],
        )
        our_cli.main(
            [fixture_h5, our_out, "--pats", "1",
             "--nets", native_trained, native_trained]
        )
        with h5.File(ref_out, "r") as fr, h5.File(our_out, "r") as fo:
            segs_ref, segs_our = fr["nn-segs"][:], fo["nn-segs"][:]
            heats_ref, heats_our = fr["nn-heats"][:], fo["nn-heats"][:]
        mismatch = float(np.mean(segs_ref != segs_our))
        assert mismatch <= 0.002, mismatch
        np.testing.assert_allclose(heats_our, heats_ref, atol=2e-4)

    def test_real_train_resumes_from_our_export(self, ref, fixture_h5, native_trained, tmp_path):
        """The REAL train.py resumes from our exported checkpoint: strict
        load_state_dict over model + optimizer (momentum buffers land on
        shape-matched params) + scheduler, then trains a further epoch."""
        import shutil

        from deepfluoro_tpu.cli import export_torch_net
        from deepfluoro_tpu.train.checkpoint import load_checkpoint

        epoch = int(load_checkpoint(native_trained)["epoch"])
        exported = str(tmp_path / "resume_me.pt")
        export_torch_net.main([native_trained, exported])
        before = os.path.getmtime(exported)

        _run_reference_script(
            "train.py",
            [
                fixture_h5, "--train-pats", "1", "--num-classes", "7",
                "--max-num-epochs", str(epoch + 1), "--no-gpu",
                "--train-valid-split", "0.8",
                "--checkpoint-net", exported,
                "--best-net", str(tmp_path / "ref_best.pt"),
                "--train-loss-txt", str(tmp_path / "tl.txt"),
                "--valid-loss-txt", str(tmp_path / "vl.txt"),
            ],
        )
        # it trained and re-checkpointed (as its own torch format)
        assert os.path.getmtime(exported) > before
        resumed = torch.load(exported, map_location="cpu", weights_only=False)
        assert int(resumed["epoch"]) == epoch + 1
        assert resumed["batch-norm"] is True and resumed["depth"] == 2

    def test_export_import_round_trip(self, native_trained, tmp_path):
        """export -> import returns bit-identical params, BN stats, and
        momentum buffers (the two layout conversions are exact inverses)."""
        import jax

        from deepfluoro_tpu.cli import export_torch_net
        from deepfluoro_tpu.compat.torch_import import torch_checkpoint_to_native
        from deepfluoro_tpu.train.checkpoint import load_checkpoint, restore_tree
        from deepfluoro_tpu.train.config import TrainConfig
        from deepfluoro_tpu.train.step import make_train_state

        exported = str(tmp_path / "rt.pt")
        export_torch_net.main([native_trained, exported])

        orig = load_checkpoint(native_trained)
        back = torch_checkpoint_to_native(exported)

        def leaves(t):
            return {
                jax.tree_util.keystr(p): np.asarray(l)
                for p, l in jax.tree_util.tree_leaves_with_path(t)
            }

        a = leaves(orig["model-state-dict"]["params"])
        b = leaves(back["model-state-dict"]["params"])
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        sa = leaves(orig["model-state-dict"]["batch_stats"])
        sb = leaves(back["model-state-dict"]["batch_stats"])
        assert sa.keys() == sb.keys()
        for k in sa:
            np.testing.assert_array_equal(sa[k], sb[k], err_msg=k)

        # momentum: original typed trace vs re-imported tree
        import optax

        cfg = TrainConfig.from_checkpoint_meta(orig["meta"])
        _, tmpl = make_train_state(cfg, jax.random.PRNGKey(0), (PAD_DIM, PAD_DIM))
        opt_state = restore_tree(tmpl.opt_state, orig["optimizer-state-dict"])

        def find_trace(s):
            if isinstance(s, optax.TraceState):
                return s.trace
            if isinstance(s, tuple):
                fields = getattr(s, "_fields", None)
                for x in ([getattr(s, f) for f in fields] if fields else s):
                    r = find_trace(x)
                    if r is not None:
                        return r
            return None

        trace = find_trace(opt_state)
        assert trace is not None
        moments = back["torch-opt-moments"]
        assert moments is not None and moments["kind"] == "sgd"
        ta = leaves(trace)
        tb = leaves(moments["momentum_buffer"])
        assert len(ta) == len(tb)
        for (ka, va), (kb, vb) in zip(sorted(ta.items()), sorted(tb.items())):
            np.testing.assert_array_equal(va, vb, err_msg="{} vs {}".format(ka, kb))

    @pytest.mark.parametrize("optim", ["rmsprop", "adam"])
    def test_real_optimizer_loads_exported_moments(self, ref, tmp_path, optim):
        """torch Adam/RMSprop ``__setstate__`` dereferences a per-param
        ``step`` for every non-empty state entry; the export must provide one
        even though RMSprop never reads it in the update math (regression:
        rmsprop exports used to crash the reference's resume at
        train.py:355 with KeyError 'step')."""
        import jax

        from deepfluoro_tpu.compat.torch_import import export_torch_checkpoint
        from deepfluoro_tpu.train.checkpoint import load_checkpoint, save_checkpoint
        from deepfluoro_tpu.train.config import TrainConfig
        from deepfluoro_tpu.train.step import make_optimizer, make_train_state

        cfg = TrainConfig(
            num_classes=7, depth=2, init_feats_exp=2, batch_norm=False,
            padding=True, no_max_pool=False, num_lands=0, proj_unet_dim=32,
            use_res=False, block_depth=1, optim_type=optim, init_lr=0.01,
            momentum=0.9, wgt_decay=1e-4, lr_sched_meth="none",
        )
        _, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        # one real update so the moment trees are non-empty
        tx = make_optimizer(cfg)
        grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
        _, opt_state = tx.update(grads, state.opt_state, state.params)

        native = str(tmp_path / "native_{}.pt".format(optim))
        save_checkpoint(
            native, meta=cfg.to_checkpoint_meta(), params=state.params,
            batch_stats=state.batch_stats, opt_state=opt_state, epoch=1,
        )
        exported = str(tmp_path / "exported_{}.pt".format(optim))
        export_torch_checkpoint(load_checkpoint(native), exported)

        net = ref.unet.UNet(
            in_channels=1, n_classes=7, depth=2, wf=2, padding=True,
            batch_norm=False, max_pool=True, num_lands=0, do_res=False,
            block_depth=1,
        )
        if optim == "adam":
            opt = torch.optim.Adam(net.parameters(), lr=0.01, weight_decay=1e-4)
        else:
            opt = torch.optim.RMSprop(
                net.parameters(), lr=0.01, weight_decay=1e-4, momentum=0.9
            )
        ck = torch.load(exported, map_location="cpu", weights_only=False)
        net.load_state_dict(ck["model-state-dict"])
        # the exact call the reference resume makes (train.py:355)
        opt.load_state_dict(ck["optimizer-state-dict"])
        for st in opt.state_dict()["state"].values():
            assert "step" in st

    def test_light_checkpoint_export_loads_fresh_scheduler(self, ref, tmp_path):
        """Light (params-only) native checkpoints carry no scheduler state;
        the export must emit ``{}`` — the reference unconditionally calls
        ``lr_sched.load_state_dict(ck['scheduler-state-dict'])`` when a
        scheduler exists (train.py:355-358) and ``__dict__.update(None)``
        raises (regression)."""
        import jax

        from deepfluoro_tpu.compat.torch_import import export_torch_checkpoint
        from deepfluoro_tpu.train.checkpoint import load_checkpoint, save_checkpoint
        from deepfluoro_tpu.train.config import TrainConfig
        from deepfluoro_tpu.train.step import make_train_state

        cfg = TrainConfig(
            num_classes=7, depth=2, init_feats_exp=2, batch_norm=False,
            padding=True, no_max_pool=False, num_lands=0, proj_unet_dim=32,
            use_res=False, block_depth=1, optim_type="sgd", init_lr=0.1,
            momentum=0.9, nesterov=True, lr_sched_meth="cos",
            lrs_num_epochs=10,
        )
        _, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        light = str(tmp_path / "light.pt")
        save_checkpoint(
            light, meta=cfg.to_checkpoint_meta(), params=state.params,
            batch_stats=state.batch_stats, opt_state=None, sched_state=None,
            epoch=3,
        )
        exported = str(tmp_path / "light_exported.pt")
        export_torch_checkpoint(load_checkpoint(light), exported)

        ck = torch.load(exported, map_location="cpu", weights_only=False)
        assert ck["scheduler-state-dict"] == {}

        net = ref.unet.UNet(
            in_channels=1, n_classes=7, depth=2, wf=2, padding=True,
            batch_norm=False, max_pool=True, num_lands=0, do_res=False,
            block_depth=1,
        )
        opt = torch.optim.SGD(net.parameters(), lr=0.1, momentum=0.9, nesterov=True)
        sched = ref.warm_restarts_lr.WarmRestartLR(opt, init_run_period_epochs=10)
        # the exact resume sequence (train.py:354-358): no-op fresh scheduler
        sched.load_state_dict(ck["scheduler-state-dict"])
        assert sched.cur_run_period_epochs == 10


# --------------------------------------------------------------------------
# drop-in migration: checkpoints TRAINED by the real train.py, consumed by
# this framework's test_ensemble CLI
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def trained_pts(ref, fixture_h5, tmp_path_factory):
    """Two genuine .pt checkpoints written by the REAL reference train.py
    (2 epochs, tiny paper-style config, CPU): real BN running stats, real
    optimizer-trained weights, the real save_net key set."""
    d = tmp_path_factory.mktemp("ref_train")
    ck, best = str(d / "zz_checkpoint.pt"), str(d / "zz_best.pt")
    _run_reference_script(
        "train.py",
        [
            fixture_h5, "--train-pats", "1", "--num-classes", "7",
            "--batch-size", "4", "--unet-img-dim", "40",
            "--unet-num-lvls", "2", "--unet-init-feats-exp", "3",
            "--unet-batch-norm", "--unet-padding", "--unet-no-max-pool",
            "--use-lands", "--max-num-epochs", "2", "--init-lr", "0.01",
            "--nesterov", "--momentum", "0.9", "--wgt-decay", "0.0001",
            "--lr-sched", "cos", "--cos-anneal-epochs", "10",
            "--train-valid-split", "0.8", "--no-gpu",
            "--checkpoint-net", ck, "--best-net", best,
            "--train-loss-txt", str(d / "tl.txt"),
            "--valid-loss-txt", str(d / "vl.txt"),
        ],
    )
    assert os.path.exists(ck) and os.path.exists(best)
    return [best, ck]


# --------------------------------------------------------------------------
# components 13-14: the real overlay scripts as oracles (runpy, PNG-level)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def overlay_est_file(fixture_h5, tmp_path_factory):
    """An estimate archive shape-matched to fixture_h5: rolled GT labels and
    synthetic Gaussian heats (incl. one flat channel to hit the 1e-3
    range guard)."""
    d = tmp_path_factory.mktemp("overlay")
    path = str(d / "est.h5")
    with h5.File(fixture_h5, "r") as f:
        gt = f["01/segs"][:]
    n, hw = gt.shape[0], gt.shape[1]
    heats = np.zeros((n, NUM_LANDS, hw, hw), np.float32)
    for i in range(n):
        for li in range(NUM_LANDS):
            if (i + li) % 4 == 0:
                continue  # flat channel -> the <=1e-3 range branch
            heats[i, li] = _gaussian(hw, (7 * li + i) % hw, (11 * li + 3 * i) % hw)
    with h5.File(path, "w") as f:
        f.create_dataset("nn-segs", data=np.roll(gt, 1, axis=1))
        f.create_dataset("nn-heats", data=heats)
    return path


class TestGoldenOverlayScripts:
    ATOL = 2  # the reference quantizes to uint8 BEFORE blending and rounds
    # on save (to_pil_image truncation + save_image +0.5); this framework
    # blends in float and truncates once — bounded by 2 uint8 levels

    def _png(self, path):
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB")).astype(np.int32)

    def test_overlay_est_ann_parity(self, ref, fixture_h5, overlay_est_file, tmp_path):
        from deepfluoro_tpu.cli import overlay_est_ann as our_cli

        csv = str(tmp_path / "lands.csv")
        with open(csv, "w") as f:
            f.write("pat,proj,land,row,col,time\n")
            f.write("1,2,0,10,20,0.001\n")   # found -> crosshair
            f.write("1,2,3,-1,-1,0.001\n")   # not found -> skipped
            f.write("1,1,1,5,5,0.001\n")     # other projection -> filtered
        args = [fixture_h5, overlay_est_file, "nn-segs", 1, 2, None,
                "--lands", "--lands-csv", csv]

        ref_png = str(tmp_path / "ref_ann.png")
        our_png = str(tmp_path / "our_ann.png")
        ref_args = list(args)
        ref_args[5] = ref_png
        _run_reference_script("overlay_est_ann.py", ref_args)
        our_args = [str(a) for a in args]
        our_args[5] = our_png
        our_cli.main(our_args)

        a, b = self._png(ref_png), self._png(our_png)
        assert a.shape == b.shape
        np.testing.assert_array_less(np.abs(a - b).max(), self.ATOL + 1)
        # the overlay actually drew something colored
        assert (a[..., 0] != a[..., 1]).any()

    def test_overlay_est_ann_no_seg_no_gt(self, ref, fixture_h5, overlay_est_file, tmp_path):
        from deepfluoro_tpu.cli import overlay_est_ann as our_cli

        csv = str(tmp_path / "lands2.csv")
        with open(csv, "w") as f:
            f.write("pat,proj,land,row,col,time\n")
            f.write("1,0,2,12,9,0.001\n")
        ref_png = str(tmp_path / "ref2.png")
        our_png = str(tmp_path / "our2.png")
        base = [fixture_h5, overlay_est_file, "nn-segs", 1, 0]
        tail = ["--lands", "--no-gt-lands", "--no-seg", "--lands-csv", csv]
        _run_reference_script("overlay_est_ann.py", base + [ref_png] + tail)
        our_cli.main([str(a) for a in base] + [our_png] + tail)
        a, b = self._png(ref_png), self._png(our_png)
        np.testing.assert_array_less(np.abs(a - b).max(), self.ATOL + 1)

    @pytest.mark.parametrize("land_ind", [1, 4], ids=["peaked", "flat"])
    def test_overlay_est_heat_parity(self, ref, fixture_h5, overlay_est_file, tmp_path, land_ind):
        """(proj 0, land 4) hits the flat-heat <=1e-3 range guard; (proj 0,
        land 1) the normal blend."""
        from deepfluoro_tpu.cli import overlay_est_heat as our_cli

        ref_png = str(tmp_path / "ref_heat_{}.png".format(land_ind))
        our_png = str(tmp_path / "our_heat_{}.png".format(land_ind))
        base = [fixture_h5, overlay_est_file, "nn-heats", 1, 0, land_ind]
        _run_reference_script("overlay_est_heat.py", base + [ref_png])
        our_cli.main([str(a) for a in base] + [our_png])
        a, b = self._png(ref_png), self._png(our_png)
        assert a.shape == b.shape
        np.testing.assert_array_less(np.abs(a - b).max(), self.ATOL + 1)


# --------------------------------------------------------------------------
# components 15-16: the real examples_dataset overlay scripts as oracles
# --------------------------------------------------------------------------

EXAMPLES_DIR = "/root/reference/examples_dataset"


def _run_example_script(script_name, argv, workdir):
    """The example scripts take bare sys.argv and write PNGs into the CWD."""
    old_cwd = os.getcwd()
    os.chdir(workdir)
    try:
        _run_reference_script(
            os.path.join("..", "examples_dataset", script_name), argv
        )
    finally:
        os.chdir(old_cwd)


class TestGoldenExampleOverlayScripts:
    ATOL = 2  # same quantization-order bound as TestGoldenOverlayScripts

    def _png(self, path):
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB")).astype(np.int32)

    def test_make_preproc_overlays_parity(self, ref, fixture_h5, tmp_path):
        from deepfluoro_tpu.cli import make_preproc_overlays as our_cli

        ref_dir = tmp_path / "ref"
        our_dir = tmp_path / "ours"
        ref_dir.mkdir()
        our_dir.mkdir()
        _run_example_script("make_preproc_overlays.py", [fixture_h5], str(ref_dir))
        our_cli.main([fixture_h5, str(our_dir)])

        ref_pngs = sorted(p.name for p in ref_dir.glob("*.png"))
        our_pngs = sorted(p.name for p in our_dir.glob("*.png"))
        assert ref_pngs == our_pngs == ["01.png"]
        a = self._png(str(ref_dir / "01.png"))
        b = self._png(str(our_dir / "01.png"))
        assert a.shape == b.shape  # same make_grid tiling
        np.testing.assert_array_less(np.abs(a - b).max(), self.ATOL + 1)

    def test_make_full_res_overlays_parity(self, ref, tmp_path):
        from deepfluoro_tpu.cli import make_full_res_overlays as our_cli
        from deepfluoro_tpu.data.fixtures import write_synthetic_fullres_dataset

        fr = str(tmp_path / "fullres.h5")
        write_synthetic_fullres_dataset(fr, num_specimens=1, num_projs=3)
        ref_dir = tmp_path / "ref"
        our_dir = tmp_path / "ours"
        ref_dir.mkdir()
        our_dir.mkdir()
        _run_example_script("make_full_res_overlays.py", [fr], str(ref_dir))
        our_cli.main([fr, str(our_dir)])

        ref_pngs = sorted(p.name for p in ref_dir.glob("*.png"))
        our_pngs = sorted(p.name for p in our_dir.glob("*.png"))
        assert ref_pngs == our_pngs == ["17-1882.png"]
        a = self._png(str(ref_dir / "17-1882.png"))
        b = self._png(str(our_dir / "17-1882.png"))
        assert a.shape == b.shape
        np.testing.assert_array_less(np.abs(a - b).max(), self.ATOL + 1)


# --------------------------------------------------------------------------
# drop-in migration: RESUME training from a reference .pt (weights +
# momentum + scheduler + epoch + split)
# --------------------------------------------------------------------------

RESUME_META = dict(  # the save_net hyperparameter keys (train.py:473-515)
    **{
        "optim-type": "sgd", "num-classes": 7, "depth": 2,
        "init-feats-exp": 3, "batch-norm": False, "padding": True,
        "no-max-pool": False, "pad-img-size": 24, "batch-size": 2,
        "data-aug": False, "opt-nesterov": True, "opt-momentum": 0.9,
        "opt-wgt-decay": 1e-4, "num-lands": 0, "heat-coeff": 0.5,
        "use-dice-valid": False, "unet-use-res": True, "unet-block-depth": 2,
        "lrs-meth": "cos", "lrs-num-epochs": 10, "lrs-growth-factor": 2,
        "lrs-max-num-restarts": -1, "lrs-save-restart-net-prefix": None,
        "lrs-save-after-n-restarts": 0, "lrs-num-restarts": 0,
        "lrs-patience": 20, "lrs-cooldown": 20, "checkpoint-freq": 1,
        "save-best-valid": True,
        # NOTE deliberately NO "init-lr": reference save_net does not store
        # it (train.py:473-515); the import recovers the live LR from the
        # optimizer param groups instead
    }
)


class TestGoldenTorchResume:
    def _rand_batch(self, rng, b=2, hw=24, c=7):
        x = rng.standard_normal((b, 1, hw, hw)).astype(np.float32)
        y = np.transpose(
            np.eye(c, dtype=np.float32)[rng.integers(0, c, (b, hw, hw))],
            (0, 3, 1, 2),
        )
        return torch.from_numpy(x), torch.from_numpy(y)

    @pytest.mark.parametrize("optim", ["sgd", "adam", "rmsprop"])
    def test_opt_moment_import_step_parity(self, ref, rng, tmp_path, optim):
        """Numeric oracle for the optimizer-moment import: torch takes step 1
        (creating momentum/adam/rms state), we import that checkpoint, both
        sides take step 2 on the same batch with the same LR — the
        parameters must land in the same place. Catches a wrong
        index->parameter mapping, a wrong layout conversion, or a moment-
        semantics mismatch, for each reference optimizer (train.py:331-351).
        """
        import jax

        from deepfluoro_tpu.compat.torch_import import (
            import_torch_checkpoint,
            torch_checkpoint_to_native,
        )
        from deepfluoro_tpu.train.checkpoint import restore_tree
        from deepfluoro_tpu.train.config import TrainConfig
        from deepfluoro_tpu.train.step import (
            inject_torch_moments_into_opt_state,
            make_optimizer,
            make_train_state,
            make_train_step,
        )

        torch.manual_seed(3)
        # do_res=False: the reference's residual += writes onto the block's
        # ReLU output, which torch autograd rejects without a BN in between
        # (unet.py:229-232) — training do_res + no-BN is impossible upstream
        net = ref.unet.UNet(
            in_channels=1, n_classes=7, depth=2, wf=3, padding=True,
            batch_norm=False, max_pool=False, num_lands=0, do_res=False,
            block_depth=2,
        )
        net.train()
        crit = ref.dice.DiceLoss2D(skip_bg=False)
        if optim == "sgd":
            opt = torch.optim.SGD(
                net.parameters(), lr=0.05, momentum=0.9, weight_decay=1e-4,
                nesterov=True,
            )
        elif optim == "adam":
            opt = torch.optim.Adam(net.parameters(), lr=0.01, weight_decay=1e-4)
        else:
            opt = torch.optim.RMSprop(
                net.parameters(), lr=0.01, momentum=0.9, weight_decay=1e-4
            )
        lr = opt.param_groups[0]["lr"]
        x1, y1 = self._rand_batch(rng)
        x2, y2 = self._rand_batch(rng)

        meta = dict(RESUME_META, **{
            "no-max-pool": True, "unet-use-res": False, "optim-type": optim,
            # the reference only builds LR schedulers for sgd
            "lrs-meth": "cos" if optim == "sgd" else "none",
        })

        def save(path, epoch):
            torch.save(
                dict(meta, **{
                    "epoch": epoch, "loss": 0.0, "best-valid-loss": 0.9,
                    "model-state-dict": net.state_dict(),
                    "optimizer-state-dict": opt.state_dict(),
                    "scheduler-state-dict": None,
                    "train-idx": [0, 1], "valid-idx": [2],
                }),
                path,
            )

        # torch step 1 -> checkpoint with live optimizer state
        opt.zero_grad()
        crit(net(x1), y1).backward()
        opt.step()
        ck_mid = str(tmp_path / "mid.pt")
        save(ck_mid, 1)

        # torch step 2
        opt.zero_grad()
        crit(net(x2), y2).backward()
        opt.step()
        ck_end = str(tmp_path / "end.pt")
        save(ck_end, 2)

        # our step 2 from the imported mid-checkpoint
        prev = torch_checkpoint_to_native(ck_mid)
        assert prev["torch-opt-moments"] is not None
        assert prev["torch-opt-present"]
        assert prev["epoch"] == 1 and prev["train-idx"] == [0, 1]
        # the live LR is recovered even without scheduler state
        assert prev["meta"]["init-lr"] == pytest.approx(lr)
        cfg = TrainConfig.from_checkpoint_meta(prev["meta"])
        assert cfg.init_lr == pytest.approx(lr)
        model, state = make_train_state(cfg, jax.random.PRNGKey(0), (24, 24))
        moments = dict(prev["torch-opt-moments"])
        for k in ("momentum_buffer", "exp_avg", "exp_avg_sq", "square_avg"):
            if k in moments:
                moments[k] = restore_tree(state.params, moments[k])
        state = state.replace(
            params=restore_tree(state.params, prev["model-state-dict"]["params"]),
            opt_state=inject_torch_moments_into_opt_state(state.opt_state, moments),
        )
        tx = make_optimizer(cfg)
        step = make_train_step(cfg, model, tx)
        proj2 = jnp.asarray(np.transpose(x2.numpy(), (0, 2, 3, 1)))
        seg2 = jnp.asarray(np.transpose(y2.numpy(), (0, 2, 3, 1)))
        new_state, _loss = step(state, proj2, seg2, None, lr)

        # compare against torch's post-step-2 params THROUGH the (forward-
        # parity-pinned) layout converter
        _, want_params, _ = import_torch_checkpoint(ck_end)
        got = jax.tree_util.tree_leaves_with_path(new_state.params)
        want = dict(jax.tree_util.tree_leaves_with_path(
            restore_tree(state.params, want_params)
        ))
        assert got and len(got) == len(want)
        for path, leaf in got:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(want[path]), atol=2e-5,
                err_msg=str(path),
            )

    def test_warm_restart_sched_state_mapping(self, ref):
        """Map a REAL mid-flight WarmRestartLR's state into our scheduler:
        identical current LR and identical 12-epoch continuation (crossing a
        restart boundary)."""
        from deepfluoro_tpu.compat.torch_import import _import_torch_sched_state
        from deepfluoro_tpu.train.config import TrainConfig
        from deepfluoro_tpu.train.schedules import WarmRestartLR

        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=0.05)
        sched_t = ref.warm_restarts_lr.WarmRestartLR(
            opt, init_run_period_epochs=3, growth_factor=2
        )
        for _ in range(7):
            sched_t.step()

        state = {
            "scheduler-state-dict": sched_t.state_dict(),
            "optimizer-state-dict": opt.state_dict(),
        }
        cfg = TrainConfig.from_checkpoint_meta({"lrs-meth": "cos"})
        mapped = _import_torch_sched_state(state, cfg)
        sched_j = WarmRestartLR(0.05, init_run_period_epochs=3, growth_factor=2)
        sched_j.load_state_dict(mapped)

        assert sched_j.get_lr() == pytest.approx(sched_t.get_lr()[0], abs=1e-12)
        for _ in range(12):
            sched_t.step()
            sched_j.step()
            assert sched_j.just_restarted == sched_t.just_restarted
            assert sched_j.get_lr() == pytest.approx(
                sched_t.get_lr()[0], abs=1e-12
            )

    def test_fit_resumes_from_reference_pt(self, ref, fixture_h5, trained_pts, tmp_path):
        """fit() pointed at a REAL reference-trained .pt continues training:
        epoch/split/restart bookkeeping carries over and the next periodic
        save rewrites the file in the native format (which then resumes
        natively)."""
        import shutil

        from deepfluoro_tpu.infer.ensemble import _is_torch_checkpoint
        from deepfluoro_tpu.train.checkpoint import load_checkpoint
        from deepfluoro_tpu.train.config import TrainConfig
        from deepfluoro_tpu.train.loop import fit

        src_ck = trained_pts[1]  # the periodic checkpoint (full state)
        ck = str(tmp_path / "migrated.pt")
        shutil.copy(src_ck, ck)
        ref_state = torch.load(ck, map_location="cpu", weights_only=False)

        # the split RATIO is not stored in reference checkpoints — the CLI
        # re-passes it and the stored idx take over (train.py:267-271);
        # same contract here
        cfg = TrainConfig(
            max_num_epochs=3, num_lands=14, train_valid_split=0.8, seed=5
        )
        out = fit(
            fixture_h5, [1], cfg,
            checkpoint_filename=ck,
            best_valid_filename=str(tmp_path / "best.pt"),
            train_loss_txt=str(tmp_path / "tl.txt"),
            valid_loss_txt=str(tmp_path / "vl.txt"),
            verbose=False,
        )
        # resumed at epoch 2 (the reference trained 2), ran to max 3
        assert out["epoch"] >= 2
        # the rewritten checkpoint is now native and kept the torch split
        assert not _is_torch_checkpoint(ck)
        native = load_checkpoint(ck)
        assert [int(i) for i in native["train-idx"]] == [
            int(i) for i in np.asarray(ref_state["train-idx"]).reshape(-1)
        ]
        assert [int(i) for i in native["valid-idx"]] == [
            int(i) for i in np.asarray(ref_state["valid-idx"]).reshape(-1)
        ]
        # config round-tripped from the torch meta
        assert native["meta"]["depth"] == 2
        assert native["meta"]["pad-img-size"] == 40


@pytest.mark.slow
class TestGoldenTrainedCheckpointInterop:
    def test_reference_pt_ensemble_through_our_cli(
        self, ref, fixture_h5, trained_pts, tmp_path
    ):
        """The migration story end-to-end: the REAL test_ensemble.py and our
        cli.test_ensemble consume the SAME reference-trained .pt files (ours
        via the auto-detected torch-import path) and must write matching
        nn-segs / nn-heats archives."""
        from deepfluoro_tpu.cli import test_ensemble as our_cli

        ref_out = str(tmp_path / "ref_out.h5")
        our_out = str(tmp_path / "our_out.h5")
        _run_reference_script(
            "test_ensemble.py",
            [fixture_h5, ref_out, "--pats", "1", "--no-gpu", "--nets"]
            + trained_pts,
        )
        our_cli.main(
            [fixture_h5, our_out, "--pats", "1", "--nets"] + trained_pts
        )

        with h5.File(ref_out, "r") as fr, h5.File(our_out, "r") as fo:
            assert int(fo["land-names/num-lands"][()]) == int(
                fr["land-names/num-lands"][()]
            )
            segs_ref, segs_our = fr["nn-segs"][:], fo["nn-segs"][:]
            heats_ref, heats_our = fr["nn-heats"][:], fo["nn-heats"][:]
        assert segs_our.shape == segs_ref.shape
        mismatch = float(np.mean(segs_ref != segs_our))
        assert mismatch <= 0.002, mismatch
        np.testing.assert_allclose(heats_our, heats_ref, atol=2e-4)
