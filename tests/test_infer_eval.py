"""Ensemble inference + landmark/dice evaluation tests, including the
golden-path CLI sequence the reference documents (train_test_code/
Readme.md:10-61): train -> test_ensemble -> est_lands_csv -> overlay ->
compute_actual_dice -> overlay_est_heat."""

import os

import h5py as h5
import numpy as np
import pytest

from deepfluoro_tpu.data.fixtures import write_synthetic_dataset
from deepfluoro_tpu.eval.dice import hard_dice
from deepfluoro_tpu.eval.landmarks import detect_landmarks
from deepfluoro_tpu.ops.heatmap import gaussian_heatmap


class TestHardDice:
    def test_perfect_and_empty(self):
        seg = np.zeros((2, 8, 8), np.uint8)
        seg[0, 1:4, 1:4] = 1
        d = hard_dice(seg, seg, num_classes=3)
        assert d.shape == (2, 2)
        # class 1 present+perfect in proj 0; class 2 empty-empty -> 1.0
        np.testing.assert_allclose(d, 1.0)

    def test_half_overlap(self):
        gt = np.zeros((1, 8, 8), np.uint8)
        est = np.zeros((1, 8, 8), np.uint8)
        gt[0, 0:4, 0:4] = 1   # 16 px
        est[0, 2:4, 0:4] = 1  # 8 px, all inside gt
        d = hard_dice(gt, est, num_classes=2)
        assert d[0, 0] == pytest.approx(2 * 8 / 24)

    def test_disjoint_zero(self):
        gt = np.zeros((1, 8, 8), np.uint8)
        est = np.zeros((1, 8, 8), np.uint8)
        gt[0, 0:2, 0:2] = 1
        est[0, 6:8, 6:8] = 1
        d = hard_dice(gt, est, num_classes=2)
        assert d[0, 0] == pytest.approx(0.0)


class TestDetectLandmarks:
    def _perfect_heats(self, peaks, h=64, w=64):
        """(N, L, H, W) heatmaps with clean Gaussian peaks."""
        n = len(peaks)
        l = len(peaks[0])
        heats = np.zeros((n, l, h, w), np.float32)
        for i, proj_peaks in enumerate(peaks):
            for li, (r, c) in enumerate(proj_peaks):
                g = np.asarray(gaussian_heatmap(h, w, 2.5, peak_row=r, peak_col=c))
                heats[i, li] = g
        return heats

    def test_clean_peaks_found(self):
        peaks = [[(20, 30), (40, 10)]]
        heats = self._perfect_heats(peaks)
        rows, cols = detect_landmarks(heats, ["FH-l", "FH-r"], segs=None)
        np.testing.assert_array_equal(rows[0], [20, 40])
        np.testing.assert_array_equal(cols[0], [30, 10])

    def test_flat_heatmap_rejected(self):
        heats = np.full((1, 1, 64, 64), 0.5, np.float32)
        rows, cols = detect_landmarks(heats, ["FH-l"], segs=None)
        assert rows[0, 0] == -1 and cols[0, 0] == -1

    def test_seg_gating_restricts_argmax(self):
        # two peaks; class mask only covers the smaller one
        h = w = 64
        big = np.asarray(gaussian_heatmap(h, w, 2.5, peak_row=10, peak_col=10)) * 2.0
        small = np.asarray(gaussian_heatmap(h, w, 2.5, peak_row=50, peak_col=50))
        heats = (big + small)[None, None].astype(np.float32)
        segs = np.zeros((1, h, w), np.uint8)
        segs[0, 45:55, 45:55] = 5  # FH-l gates on class 5
        rows, cols = detect_landmarks(heats, ["FH-l"], segs=segs)
        assert (rows[0, 0], cols[0, 0]) == (50, 50)

    def test_seg_class_absent_not_found(self):
        heats = self._perfect_heats([[(20, 30)]])
        segs = np.zeros((1, 64, 64), np.uint8)  # class 5 absent
        rows, cols = detect_landmarks(heats, ["FH-l"], segs=segs)
        assert rows[0, 0] == -1

    def test_timed_variant_matches_and_times_vary(self, tmp_path):
        """detect_landmarks_timed returns identical detections plus measured
        per-projection times; the CSV time column must vary per row
        (reference est_lands_csv.py:94,131-133)."""
        from deepfluoro_tpu.eval.landmarks import (
            detect_landmarks_timed,
            write_landmarks_csv,
        )

        peaks = [[(20, 30), (40, 10)], [(5, 5), (60, 60)], [(33, 12), (8, 57)]]
        heats = self._perfect_heats(peaks)
        rows, cols = detect_landmarks(heats, ["FH-l", "FH-r"], segs=None)
        rows_t, cols_t, times = detect_landmarks_timed(heats, ["FH-l", "FH-r"], segs=None)
        np.testing.assert_array_equal(rows_t, rows)
        np.testing.assert_array_equal(cols_t, cols)
        assert times.shape == rows.shape
        assert (times > 0).all()
        # measured per projection: not one constant for the whole file
        assert len(np.unique(times)) >= len(peaks)

        p = str(tmp_path / "lands.csv")
        write_landmarks_csv(p, 1, rows_t, cols_t, per_land_time=times)
        lines = open(p).read().splitlines()
        assert lines[0] == "pat,proj,land,row,col,time"
        time_col = [ln.split(",")[5] for ln in lines[1:]]
        assert len(set(time_col)) > 1

    def test_ncc_gate_rejects_non_gaussian_peak(self):
        heats = np.zeros((1, 1, 64, 64), np.float32)
        heats[0, 0, 20, 30] = 1.0  # a delta, not a sigma-2.5 gaussian
        rng = np.random.default_rng(0)
        heats += rng.random((1, 1, 64, 64)).astype(np.float32) * 0.5
        rows, cols = detect_landmarks(heats, ["FH-l"], segs=None)
        assert rows[0, 0] == -1


@pytest.mark.slow
class TestGoldenPathCLI:
    """The reference's documented workflow end-to-end on the synthetic
    fixture, via the CLI mains."""

    @pytest.fixture(scope="class")
    def workdir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("golden")
        write_synthetic_dataset(str(d / "ds.h5"), num_specimens=2, num_projs=8, img_dim=32)
        return d

    def test_full_pipeline(self, workdir):
        from deepfluoro_tpu.cli import (
            compute_actual_dice_on_test,
            est_lands_csv,
            overlay_est_ann,
            overlay_est_heat,
            test_ensemble,
            train,
        )

        d = str(workdir)
        ds = os.path.join(d, "ds.h5")

        # 1. train (tiny net, 2 epochs, paper-style flags)
        train.main([
            ds, "--train-pats", "2", "--num-classes", "7", "--init-lr", "0.05",
            "--momentum", "0.9", "--unet-batch-norm", "--unet-no-max-pool",
            "--unet-img-dim", "36", "--unet-num-lvls", "2", "--batch-size", "4",
            "--max-num-epochs", "2", "--unet-init-feats-exp", "3",
            "--wgt-decay", "0.0001", "--data-aug", "--unet-padding", "--nesterov",
            "--checkpoint-net", os.path.join(d, "check.pt"),
            "--checkpoint-freq", "1", "--use-lands",
            "--best-net", os.path.join(d, "best.pt"),
            "--lr-sched", "plateau", "--train-valid-split", "0.85",
            "--train-loss-txt", os.path.join(d, "tl.txt"),
            "--valid-loss-txt", os.path.join(d, "vl.txt"),
            "--heat-coeff", "0.5",
        ])
        assert os.path.exists(os.path.join(d, "best.pt"))

        # 2. test_ensemble on held-out specimen 1 (ensemble of 2 via repeat)
        out_h5 = os.path.join(d, "spec_1_test.h5")
        test_ensemble.main([
            ds, out_h5, "--pats", "1",
            "--nets", os.path.join(d, "best.pt"), os.path.join(d, "check.pt"),
            "--times", os.path.join(d, "times.txt"),
        ])
        with h5.File(out_h5, "r") as f:
            assert f["nn-segs"].shape == (8, 32, 32)
            assert f["nn-segs"].dtype == np.uint8
            assert f["nn-heats"].shape == (8, 14, 32, 32)
            assert int(f["land-names/num-lands"][()]) == 14
            segs = f["nn-segs"][:]
            heats = f["nn-heats"][:]
        assert set(np.unique(segs)) <= set(range(7))
        assert np.isfinite(heats).all()
        times = open(os.path.join(d, "times.txt")).readlines()
        assert len(times) == 8

        # 3. landmark CSV
        csv_path = os.path.join(d, "lands.csv")
        est_lands_csv.main([out_h5, "nn-heats", "--use-seg", "nn-segs",
                            "--pat", "1", "--out", csv_path])
        lines = open(csv_path).readlines()
        assert lines[0].strip() == "pat,proj,land,row,col,time"
        assert len(lines) == 1 + 8 * 14

        # 4. overlay est ann
        png1 = os.path.join(d, "ann.png")
        overlay_est_ann.main([ds, out_h5, "nn-segs", "1", "3", png1,
                              "--lands", "--no-gt-lands", "--lands-csv", csv_path])
        assert os.path.getsize(png1) > 0

        # 5. hard dice CSV
        dice_csv = os.path.join(d, "dice.csv")
        compute_actual_dice_on_test.main([ds, out_h5, "nn-segs", dice_csv, "1"])
        dlines = open(dice_csv).readlines()
        assert dlines[0].strip() == "pat,proj,label,dice"
        assert len(dlines) == 1 + 8 * 6
        vals = [float(l.strip().split(",")[3]) for l in dlines[1:]]
        assert all(0.0 <= v <= 1.0 for v in vals)

        # 6. heat overlay
        png2 = os.path.join(d, "heat.png")
        overlay_est_heat.main([ds, out_h5, "nn-heats", "1", "3", "1", png2])
        assert os.path.getsize(png2) > 0
