"""Tests for the HDF5 layer, fixtures, and the device-side augmentation
pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfluoro_tpu.data import (
    AugmentConfig,
    BatchIterator,
    get_land_names_from_dataset,
    get_num_lands_from_dataset,
    get_orig_img_shape,
    load_dataset,
    prepare_batch,
    split_train_valid,
)
from deepfluoro_tpu.data.fixtures import DEFAULT_LAND_NAMES, write_synthetic_dataset
from deepfluoro_tpu.data.hdf5 import mark_oob_landmarks_inf


@pytest.fixture(scope="module")
def fixture_h5(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "synthetic.h5"
    return write_synthetic_dataset(str(path), num_specimens=2, num_projs=6, img_dim=48)


class TestHDF5:
    def test_metadata_readers(self, fixture_h5):
        assert get_num_lands_from_dataset(fixture_h5) == 14
        assert get_land_names_from_dataset(fixture_h5) == DEFAULT_LAND_NAMES
        assert get_orig_img_shape(fixture_h5, 1) == (48, 48)

    def test_load_multi_specimen(self, fixture_h5):
        data = load_dataset(fixture_h5, [1, 2])
        assert data.projs.shape == (12, 48, 48)
        assert data.segs.shape == (12, 48, 48)
        assert data.lands.shape == (12, 2, 14)
        assert data.projs.dtype == np.float32
        assert data.segs.dtype == np.uint8
        assert set(np.unique(data.segs)) <= set(range(7))

    def test_oob_marking(self):
        lands = np.array([[[5.0, -3.0, 50.0], [5.0, 5.0, 5.0]]], np.float32)
        out = mark_oob_landmarks_inf(lands, (48, 48))
        assert np.isfinite(out[0, :, 0]).all()
        assert np.isinf(out[0, :, 1]).all()  # x < 0
        assert np.isinf(out[0, :, 2]).all()  # x > 47
        # y row of the in-bounds landmark untouched
        assert out[0, 1, 0] == 5.0

    def test_minmax_scaling(self, fixture_h5):
        data = load_dataset(fixture_h5, [1], minmax=True)
        assert data.minmax is not None
        assert data.projs.min() == pytest.approx(0.0, abs=1e-6)
        assert data.projs.max() == pytest.approx(1.0, abs=1e-6)

    def test_split_roundtrip(self, fixture_h5):
        data = load_dataset(fixture_h5, [1, 2])
        tr, va, tr_idx, va_idx = split_train_valid(data, 0.85, seed=3)
        assert len(tr) == 11 and len(va) == 1  # ceil(0.85*12)=11
        assert sorted(tr_idx + va_idx) == list(range(12))
        # restore the same split from stored indices
        tr2, va2, tr_idx2, va_idx2 = split_train_valid(data, 0.85, train_valid_idx=(tr_idx, va_idx))
        assert tr_idx2 == tr_idx and va_idx2 == va_idx
        np.testing.assert_array_equal(tr2.projs, tr.projs)


class TestPrepareBatch:
    def test_eval_mode_shapes_and_padding(self, fixture_h5):
        data = load_dataset(fixture_h5, [1])
        cfg = AugmentConfig(num_classes=7, proj_pad_dim=64, prob_of_aug=0.0)
        out = prepare_batch(
            cfg,
            jax.random.PRNGKey(0),
            jnp.asarray(data.projs[:3]),
            jnp.asarray(data.segs[:3]),
            jnp.asarray(data.lands[:3]),
        )
        assert out["proj"].shape == (3, 64, 64, 1)
        assert out["seg"].shape == (3, 48, 48, 7)
        assert out["heats"].shape == (3, 48, 48, 14)
        # z-normed
        m = float(jnp.mean(out["proj"][0]))
        s = float(jnp.std(out["proj"][0]))
        assert abs(m) < 1e-4 and s == pytest.approx(1.0, abs=1e-3)
        # one-hot is consistent with labels
        np.testing.assert_array_equal(
            np.asarray(out["seg"].argmax(-1)), data.segs[:3]
        )

    def test_eval_mode_is_deterministic(self, fixture_h5):
        data = load_dataset(fixture_h5, [1])
        cfg = AugmentConfig(num_classes=7, proj_pad_dim=64, prob_of_aug=0.0)
        a = prepare_batch(cfg, jax.random.PRNGKey(0), jnp.asarray(data.projs[:2]),
                          jnp.asarray(data.segs[:2]), jnp.asarray(data.lands[:2]))
        b = prepare_batch(cfg, jax.random.PRNGKey(42), jnp.asarray(data.projs[:2]),
                          jnp.asarray(data.segs[:2]), jnp.asarray(data.lands[:2]))
        np.testing.assert_array_equal(np.asarray(a["proj"]), np.asarray(b["proj"]))

    def test_heatmap_peaks_at_landmarks(self, fixture_h5):
        data = load_dataset(fixture_h5, [1])
        cfg = AugmentConfig(num_classes=7, proj_pad_dim=64, prob_of_aug=0.0)
        out = prepare_batch(cfg, jax.random.PRNGKey(0), jnp.asarray(data.projs[:1]),
                            jnp.asarray(data.segs[:1]), jnp.asarray(data.lands[:1]))
        heats = np.asarray(out["heats"][0])
        for li in range(14):
            x, y = data.lands[0, 0, li], data.lands[0, 1, li]
            if np.isfinite(x):
                pr, pc = np.unravel_index(heats[..., li].argmax(), heats[..., li].shape)
                assert abs(pr - y) <= 1 and abs(pc - x) <= 1
            else:
                assert heats[..., li].max() == 0.0

    def test_aug_mode_runs_and_changes_data(self, fixture_h5):
        data = load_dataset(fixture_h5, [1])
        cfg = AugmentConfig(num_classes=7, proj_pad_dim=64, prob_of_aug=1.0)
        out = prepare_batch(cfg, jax.random.PRNGKey(1), jnp.asarray(data.projs[:4]),
                            jnp.asarray(data.segs[:4]), jnp.asarray(data.lands[:4]))
        assert out["proj"].shape == (4, 64, 64, 1)
        assert np.isfinite(np.asarray(out["proj"])).all()
        assert np.isfinite(np.asarray(out["heats"])).all()
        # augmented output differs from non-augmented
        cfg0 = AugmentConfig(num_classes=7, proj_pad_dim=64, prob_of_aug=0.0)
        base = prepare_batch(cfg0, jax.random.PRNGKey(1), jnp.asarray(data.projs[:4]),
                             jnp.asarray(data.segs[:4]), jnp.asarray(data.lands[:4]))
        assert not np.allclose(np.asarray(out["proj"]), np.asarray(base["proj"]))
        # seg stays a valid one-hot (nearest warp preserves discreteness)
        seg_sum = np.asarray(out["seg"]).sum(-1)
        np.testing.assert_allclose(seg_sum, 1.0, atol=1e-6)

    def test_aug_affine_moves_landmarks_with_image(self, fixture_h5):
        """With aug probability 1 and only affine enabled, the synthesized
        heatmap peak must track the warped seg blob."""
        data = load_dataset(fixture_h5, [1])
        cfg = AugmentConfig(
            num_classes=7, proj_pad_dim=64, prob_of_aug=1.0,
            do_invert=False, do_noise=False, do_gamma=False, do_erase=False,
        )
        out = prepare_batch(cfg, jax.random.PRNGKey(7), jnp.asarray(data.projs[:1]),
                            jnp.asarray(data.segs[:1]), jnp.asarray(data.lands[:1]))
        heats = np.asarray(out["heats"][0])
        seg = np.asarray(out["seg"][0].argmax(-1))
        lands = np.asarray(out["lands"][0])
        # FH-l (land 0) sits on class 5; after warp its heatmap peak should
        # still be on/near the warped class-5 blob
        for li, cls in [(0, 5), (1, 6)]:
            x, y = lands[0, li], lands[1, li]
            if not np.isfinite(x):
                continue
            r, c = int(round(y)), int(round(x))
            r0, r1 = max(0, r - 3), min(seg.shape[0], r + 4)
            c0, c1 = max(0, c - 3), min(seg.shape[1], c + 4)
            assert (seg[r0:r1, c0:c1] == cls).any(), f"landmark {li} detached from class {cls}"

    def test_proj_only_mode(self, fixture_h5):
        data = load_dataset(fixture_h5, [1])
        cfg = AugmentConfig(num_classes=7, proj_pad_dim=64, prob_of_aug=0.0)
        out = prepare_batch(cfg, jax.random.PRNGKey(0), jnp.asarray(data.projs[:2]))
        assert set(out.keys()) == {"proj"}
        assert out["proj"].shape == (2, 64, 64, 1)


class TestBatchIterator:
    def test_epoch_covers_all_with_partial_batch(self, fixture_h5):
        data = load_dataset(fixture_h5, [1, 2])
        it = BatchIterator(data, batch_size=5, shuffle=True, seed=0)
        sizes = [b[0].shape[0] for b in it.epoch()]
        assert sizes == [5, 5, 2]
        assert len(it) == 3

    def test_shuffling_differs_between_epochs(self, fixture_h5):
        data = load_dataset(fixture_h5, [1, 2])
        it = BatchIterator(data, batch_size=12, shuffle=True, seed=0)
        e1 = np.asarray(next(iter(it.epoch()))[0])
        e2 = np.asarray(next(iter(it.epoch()))[0])
        assert not np.array_equal(e1, e2)

    def test_no_shuffle_order(self, fixture_h5):
        data = load_dataset(fixture_h5, [1])
        it = BatchIterator(data, batch_size=6, shuffle=False)
        b = np.asarray(next(iter(it.epoch()))[0])
        np.testing.assert_array_equal(b, data.projs)


class TestPrefetchIterator:
    def test_matches_batch_iterator(self, fixture_h5):
        """Double-buffered streaming yields the SAME batches (same shuffle
        stream) as BatchIterator, as device arrays."""
        from deepfluoro_tpu.data.pipeline import PrefetchIterator

        data = load_dataset(fixture_h5, [1, 2])
        base = BatchIterator(data, batch_size=5, shuffle=True, seed=3,
                             device_resident=False)
        pre = PrefetchIterator(data, batch_size=5, shuffle=True, seed=3)
        assert len(pre) == len(base)
        got = list(pre.epoch())
        want = list(base.epoch())
        assert len(got) == len(want)
        for (gp, gs, gl), (wp, ws, wl) in zip(got, want):
            assert isinstance(gp, jax.Array)  # already on device
            np.testing.assert_array_equal(np.asarray(gp), np.asarray(wp))
            np.testing.assert_array_equal(np.asarray(gs), np.asarray(ws))
            np.testing.assert_array_equal(np.asarray(gl), np.asarray(wl))

    def test_early_break_stops_producer(self, fixture_h5):
        from deepfluoro_tpu.data.pipeline import PrefetchIterator

        data = load_dataset(fixture_h5, [1, 2])
        pre = PrefetchIterator(data, batch_size=2, shuffle=False)
        gen = pre.epoch()
        next(gen)
        gen.close()  # no hang, producer thread joined


class TestLrFlipDuplicate:
    """Corrected dup_data_w_left_right_flip (reference dataset.py:464-502 —
    disabled at its call site, landmark swap doubly broken upstream)."""

    def _data(self):
        from deepfluoro_tpu.data.hdf5 import FluoroData

        rng = np.random.default_rng(3)
        projs = rng.random((4, 8, 10)).astype(np.float32)
        segs = rng.integers(0, 7, (4, 8, 10)).astype(np.uint8)
        lands = rng.random((4, 2, 4)).astype(np.float32) * 7
        lands[0, :, 2] = np.inf  # out-of-view stays out-of-view
        return FluoroData(projs=projs, segs=segs, lands=lands,
                          orig_img_shape=(8, 10), minmax=None)

    def test_mirror_semantics(self):
        from deepfluoro_tpu.data.hdf5 import lr_flip_duplicate

        data = self._data()
        names = ["FH-l", "FH-r", "GSN-l", "GSN-r"]
        out = lr_flip_duplicate(data, land_names=names)
        n = len(data.projs)
        assert len(out.projs) == 2 * n
        # first half untouched
        np.testing.assert_array_equal(out.projs[:n], data.projs)
        np.testing.assert_array_equal(out.segs[:n], data.segs)
        # flipped projections
        np.testing.assert_array_equal(out.projs[n:], data.projs[:, :, ::-1])
        # seg labels: columns mirrored AND bilateral classes swapped
        # (1<->2, 5<->6; 0/3/4 unchanged) — the reference's hardcoded map
        want = data.segs[:, :, ::-1].copy()
        for a, b in ((1, 2), (5, 6)):
            ma, mb = want == a, want == b
            want[ma], want[mb] = b, a
        np.testing.assert_array_equal(out.segs[n:], want)
        # landmarks: x -> (cols-1)-x for in-view, pairs swapped by name
        flipped = out.lands[n:]
        np.testing.assert_allclose(
            flipped[1, 0, 0], (10 - 1) - data.lands[1, 0, 1], rtol=1e-6
        )  # FH-l slot now holds mirrored FH-r
        np.testing.assert_allclose(flipped[1, 1, 0], data.lands[1, 1, 1], rtol=1e-6)
        assert np.all(np.isinf(flipped[0, :, 3]))  # GSN-r slot <- inf GSN-l... 
        # (sample 0's landmark 2 = GSN-l was inf; after swap it lands in slot 3)

    def test_name_pairing_beats_adjacency(self):
        from deepfluoro_tpu.data.hdf5 import _lr_land_permutation

        # non-adjacent pairing + an unpaired name mapping to itself
        names = ["FH-l", "GSN-l", "FH-r", "GSN-r", "MID"]
        perm = _lr_land_permutation(5, names)
        assert list(perm) == [2, 3, 0, 1, 4]
        # fallback without names: adjacent pairs
        assert list(_lr_land_permutation(4, None)) == [1, 0, 3, 2]

    def test_unknown_name_convention_refused(self):
        """Names that yield ZERO '-l'/'-r' pairs must raise — a silent
        identity permutation would mirror every landmark into its opposite
        side's slot while the seg classes DO swap (side-inconsistent GT)."""
        import pytest

        from deepfluoro_tpu.data.hdf5 import _lr_land_permutation

        with pytest.raises(ValueError, match="no '-l'/'-r' pairs"):
            _lr_land_permutation(4, ["FH-L", "FH-R", "GSN_l", "GSN_r"])

    def test_load_dataset_dup(self, tmp_path):
        from deepfluoro_tpu.data.fixtures import write_synthetic_dataset
        from deepfluoro_tpu.data.hdf5 import load_dataset

        h5p = write_synthetic_dataset(str(tmp_path / "d.h5"), num_specimens=1,
                                      num_projs=5, img_dim=32)
        plain = load_dataset(h5p, [1])
        dup = load_dataset(h5p, [1], dup_lr_flip=True)
        assert len(dup.projs) == 2 * len(plain.projs)
        np.testing.assert_array_equal(dup.projs[5:], plain.projs[:, :, ::-1])
        # in-view landmarks in the mirrored half remain in bounds
        fin = np.isfinite(dup.lands[5:, 0, :])
        xs = dup.lands[5:, 0, :][fin]
        assert np.all((xs >= 0) & (xs <= 31))


class TestLazyFluoroReader:
    """On-demand archive reader (multi-host per-host disjoint loading,
    SURVEY §2.3 DP row): row-for-row parity with load_dataset, including
    mirror-on-read for the duplicated virtual rows."""

    def test_take_matches_load_dataset(self, fixture_h5):
        from deepfluoro_tpu.data.hdf5 import LazyFluoroReader

        full = load_dataset(fixture_h5, [1, 2])
        reader = LazyFluoroReader(fixture_h5, [1, 2])
        assert len(reader) == len(full)
        assert reader.orig_img_shape == full.orig_img_shape
        assert reader.num_lands == full.num_lands
        # unsorted + duplicated request crossing the specimen boundary
        idx = np.array([7, 0, 11, 7, 3, 6, 0])
        p, s, l = reader.take(idx)
        np.testing.assert_array_equal(p, full.projs[idx])
        np.testing.assert_array_equal(s, full.segs[idx])
        np.testing.assert_array_equal(l, full.lands[idx])  # incl. inf OOB
        reader.close()

    def test_mirror_on_read_matches_lr_flip_duplicate(self, fixture_h5):
        from deepfluoro_tpu.data.hdf5 import (
            LazyFluoroReader,
            get_land_names_from_dataset,
            lr_flip_duplicate,
        )

        full = lr_flip_duplicate(
            load_dataset(fixture_h5, [1, 2]),
            land_names=get_land_names_from_dataset(fixture_h5),
        )
        reader = LazyFluoroReader(fixture_h5, [1, 2], dup_lr_flip=True)
        assert len(reader) == len(full)
        # mix of base and mirrored virtual rows, unsorted
        idx = np.array([13, 2, 23, 12, 0, 18])
        p, s, l = reader.take(idx)
        np.testing.assert_array_equal(p, full.projs[idx])
        np.testing.assert_array_equal(s, full.segs[idx])
        np.testing.assert_array_equal(l, full.lands[idx])
        reader.close()

    def test_out_of_range_rejected(self, fixture_h5):
        from deepfluoro_tpu.data.hdf5 import LazyFluoroReader

        reader = LazyFluoroReader(fixture_h5, [1])
        with pytest.raises(AssertionError, match="out of range"):
            reader.take([len(reader)])
        reader.close()


class TestPrefetchSequenceTeardown:
    """prefetch_sequence's close path (the fix for the pod h5-handle race):
    closing a partially-consumed generator must unblock a producer stuck in
    the bounded queue's put and join the thread before returning."""

    def test_close_unblocks_and_joins_producer(self):
        import threading
        import time

        from deepfluoro_tpu.data.pipeline import prefetch_sequence

        in_make = threading.Event()
        made = []

        def make_item(i):
            made.append(i)
            in_make.set()
            return i

        gen = prefetch_sequence(make_item, 100, prefetch=2)
        assert next(gen) == 0
        in_make.wait(5.0)
        # producer is now ahead: queue full (2 items) + possibly blocked in
        # put on the next. Closing must drain, unblock, and join it.
        t0 = time.monotonic()
        gen.close()
        assert time.monotonic() - t0 < 10.0
        # no further items are produced after close settles
        n = len(made)
        time.sleep(0.2)
        assert len(made) == n
        assert threading.active_count() < 20  # no producer leak build-up

    def test_wedged_producer_bounded_close(self):
        """ADVICE r4: a make_item that never returns (hung tunnel
        device_put) must not turn generator close into an unbounded hang —
        the bounded join gives up and warns instead."""
        import threading
        import time
        import warnings

        from deepfluoro_tpu.data.pipeline import prefetch_sequence

        release = threading.Event()
        entered = threading.Event()

        def make_item(i):
            if i == 1:
                entered.set()
                release.wait(30.0)  # wedge until the test releases it
            return i

        gen = prefetch_sequence(make_item, 5, prefetch=1, join_timeout=0.2)
        assert next(gen) == 0
        assert entered.wait(5.0)
        t0 = time.monotonic()
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            gen.close()
        assert time.monotonic() - t0 < 5.0
        assert any("wedged" in str(w.message) for w in caught)
        release.set()  # let the wedged thread die cleanly

    def test_producer_error_surfaces(self):
        from deepfluoro_tpu.data.pipeline import prefetch_sequence

        def make_item(i):
            if i == 2:
                raise RuntimeError("boom")
            return i

        gen = prefetch_sequence(make_item, 5, prefetch=1)
        got = []
        with pytest.raises(RuntimeError, match="boom"):
            for x in gen:
                got.append(x)
        assert got == [0, 1]
