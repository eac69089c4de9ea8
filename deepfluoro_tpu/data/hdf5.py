"""Host-side HDF5 I/O for the preprocessed DeepFluoro archives.

Schema (reference hdf5_layouts/Readme.md:95-117):
  land-names/num-lands          scalar L
  land-names/land-XX            name of landmark XX (bytes or str)
  <NN>/projs                    N x R x C float projections
  <NN>/segs                     N x R x C uint8 label maps (0..num_classes-1)
  <NN>/lands                    N x 2 x L landmark coords, row 0 = column (x),
                                row 1 = row (y)

Loading semantics mirror reference dataset.py:368-512: landmarks outside the
image bounds are marked inf (dataset.py:421-429), optional global min-max
scaling (dataset.py:381-395,509-512), optional random train/valid split with
reusable indices (dataset.py:524-551).

TPU-first design note: unlike the reference (which one-hot-encodes all
segmentations on the host, dataset.py:448-452, multiplying host memory by
num_classes), we keep raw uint8 label maps in host memory and one-hot encode
on device inside the jitted batch-preparation program (augment.py).
"""

from __future__ import annotations

import dataclasses
import math
import random as _pyrandom
from typing import Sequence

import h5py as h5
import numpy as np


def get_orig_img_shape(h5_file_path: str, pat_ind: int) -> tuple[int, int]:
    """(rows, cols) of a specimen's projections (reference dataset.py:330-337)."""
    with h5.File(h5_file_path, "r") as f:
        s = f["{:02d}/projs".format(pat_ind)].shape
    assert len(s) == 3
    return (s[1], s[2])


def specimen_counts(h5_file_path: str, pat_inds: Sequence[int]) -> list[int]:
    """Projection counts per specimen (metadata read only) — recovers the
    per-specimen index ranges of a concatenated :func:`load_dataset` union."""
    with h5.File(h5_file_path, "r") as f:
        return [int(f["{:02d}/projs".format(p)].shape[0]) for p in pat_inds]


def get_num_lands_from_dataset(h5_file_path: str) -> int:
    with h5.File(h5_file_path, "r") as f:
        return int(f["land-names/num-lands"][()])


def get_land_names_from_dataset(h5_file_path: str) -> list[str]:
    with h5.File(h5_file_path, "r") as f:
        num_lands = int(f["land-names/num-lands"][()])
        names = []
        for l in range(num_lands):
            s = f["land-names/land-{:02d}".format(l)][()]
            if isinstance(s, (bytes, np.bytes_)):
                s = s.decode()
            names.append(str(s))
    return names


def write_land_names(h5_file, land_names: Sequence[str]) -> None:
    """Write the land-names group (contract of test_ensemble.py:124-129)."""
    g = h5_file.create_group("land-names")
    g["num-lands"] = len(land_names)
    for l, name in enumerate(land_names):
        g["land-{:02d}".format(l)] = name


@dataclasses.dataclass
class FluoroData:
    """An in-memory slice of the preprocessed archive.

    projs: (N, R, C) float32; segs: (N, R, C) uint8 or None;
    lands: (N, 2, L) float32 with inf marking out-of-view, or None.
    """

    projs: np.ndarray
    segs: np.ndarray | None
    lands: np.ndarray | None
    orig_img_shape: tuple[int, int]
    minmax: tuple[float, float] | None = None

    def __len__(self) -> int:
        return self.projs.shape[0]

    @property
    def num_lands(self) -> int:
        return 0 if self.lands is None else self.lands.shape[-1]

    def subset(self, indices: Sequence[int]) -> "FluoroData":
        idx = np.asarray(indices, dtype=np.int64)
        return FluoroData(
            projs=self.projs[idx],
            segs=None if self.segs is None else self.segs[idx],
            lands=None if self.lands is None else self.lands[idx],
            orig_img_shape=self.orig_img_shape,
            minmax=self.minmax,
        )


def mark_oob_landmarks_inf(lands: np.ndarray, img_shape_hw: tuple[int, int]) -> np.ndarray:
    """Vectorized version of the reference's per-landmark OOB loop
    (dataset.py:421-429): x outside [0, cols-1] or y outside [0, rows-1]
    -> both coords inf."""
    lands = lands.astype(np.float32).copy()
    rows, cols = img_shape_hw
    x = lands[:, 0, :]
    y = lands[:, 1, :]
    oob = (x < 0) | (x > (cols - 1)) | (y < 0) | (y > (rows - 1))
    lands[:, 0, :][oob] = np.inf
    lands[:, 1, :][oob] = np.inf
    return lands


def _lr_land_permutation(num_lands: int, land_names: Sequence[str] | None) -> np.ndarray:
    """Landmark index permutation under a left/right mirror. With names,
    pair '<base>-l' with '<base>-r' (the archives' convention); unpaired
    names map to themselves. Without names, fall back to adjacent pairs
    (0<->1, 2<->3, ...) — the layout the reference's swap loop intended
    (dataset.py:495-499; its published code swaps l_idx with itself)."""
    perm = np.arange(num_lands)
    if land_names:
        assert len(land_names) == num_lands
        index = {n: i for i, n in enumerate(land_names)}
        paired = 0
        for i, n in enumerate(land_names):
            if n.endswith("-l"):
                j = index.get(n[:-2] + "-r")
            elif n.endswith("-r"):
                j = index.get(n[:-2] + "-l")
            else:
                j = None
            if j is not None:
                perm[i] = j
                paired += 1
        if num_lands > 0 and paired == 0:
            # silently keeping identity would mirror every landmark into the
            # slot of its OPPOSITE side (the seg classes DO swap), producing
            # side-inconsistent ground truth — refuse unknown conventions
            raise ValueError(
                "land-names {} contain no '-l'/'-r' pairs; cannot derive the "
                "left/right landmark swap for flip duplication".format(
                    list(land_names)
                )
            )
    else:
        assert num_lands % 2 == 0, "unpaired landmark count needs land-names"
        perm = perm.reshape(-1, 2)[:, ::-1].reshape(-1)
    return perm


def _mirror_rows(
    projs: np.ndarray,
    segs: np.ndarray | None,
    lands: np.ndarray | None,
    cols: int,
    land_names: Sequence[str] | None,
    class_swap: Sequence[tuple[int, int]],
):
    """Left/right mirror of a row batch — the per-row math shared by
    lr_flip_duplicate (whole-dataset duplication) and
    LazyFluoroReader.take (mirror-on-read for the streaming pod path):
    columns flip; bilateral seg labels swap; in-view landmark x mirrors to
    (cols-1)-x and the l/r landmark channels swap."""
    m_projs = projs[:, :, ::-1]

    m_segs = None
    if segs is not None:
        lut = np.arange(256, dtype=segs.dtype)
        for a, b in class_swap:
            lut[a], lut[b] = b, a
        m_segs = lut[segs[:, :, ::-1]]

    m_lands = None
    if lands is not None:
        m_lands = lands.copy()
        finite = np.isfinite(m_lands[:, 0, :])
        m_lands[:, 0, :][finite] = (cols - 1) - m_lands[:, 0, :][finite]
        perm = _lr_land_permutation(m_lands.shape[-1], land_names)
        m_lands = m_lands[:, :, perm]

    return m_projs, m_segs, m_lands


def lr_flip_duplicate(
    data: "FluoroData",
    land_names: Sequence[str] | None = None,
    class_swap: Sequence[tuple[int, int]] = ((1, 2), (5, 6)),
) -> "FluoroData":
    """Append a left/right-mirrored copy of every sample — the CORRECTED
    semantics of the reference's dup_data_w_left_right_flip
    (dataset.py:464-502: disabled at its call site and doubly broken in the
    landmark swap, see SURVEY §2.4). Projections and segmentations flip
    along columns; the bilateral seg labels swap (default = the reference's
    hardcoded 7-class map: 1 left<->2 right hemipelvis, 5 left<->6 right
    femur); landmark x mirrors to (cols-1)-x for in-view landmarks and the
    l/r landmark pairs swap (by '-l'/'-r' name suffix when names are given,
    adjacent pairs otherwise)."""
    m_projs, m_segs, m_lands = _mirror_rows(
        data.projs, data.segs, data.lands, data.orig_img_shape[1],
        land_names, class_swap,
    )
    return FluoroData(
        projs=np.concatenate([data.projs, m_projs]),
        segs=None if data.segs is None else np.concatenate([data.segs, m_segs]),
        lands=None if data.lands is None else np.concatenate([data.lands, m_lands]),
        orig_img_shape=data.orig_img_shape, minmax=data.minmax,
    )


def load_dataset(
    h5_file_path: str,
    pat_inds: Sequence[int],
    minmax: bool | tuple[float, float] | None = None,
    no_seg: bool = False,
    dup_lr_flip: bool = False,
) -> FluoroData:
    """Load all projections/segs/landmarks of the given specimens.

    Mirrors reference dataset.py:368-512 minus the host-side one-hot.
    ``dup_lr_flip=True`` appends a left/right-mirrored copy of every sample
    (the reference's dup_data_w_left_right_flip intent with its bugs fixed —
    see lr_flip_duplicate). NOTE: a random split over a pre-duplicated
    dataset leaks mirrors of validation frames into training; the training
    loops therefore split first and mirror only the training side
    (train/loop.py, train/multifold.py) instead of using this kwarg.
    """
    need_scale = False
    find_minmax = False
    mm_min, mm_max = math.inf, -math.inf
    if minmax is not None:
        if isinstance(minmax, bool) and minmax:
            need_scale = True
            find_minmax = True
        elif isinstance(minmax, tuple):
            mm_min, mm_max = minmax
            need_scale = True

    all_projs, all_segs, all_lands = [], [], []
    orig_img_shape = None
    with h5.File(h5_file_path, "r") as f:
        for pat_idx in pat_inds:
            pat_g = f["{:02d}".format(pat_idx)]
            cur_projs = pat_g["projs"][:].astype(np.float32)
            assert cur_projs.ndim == 3
            if orig_img_shape is None:
                orig_img_shape = (cur_projs.shape[1], cur_projs.shape[2])
            else:
                assert orig_img_shape == (cur_projs.shape[1], cur_projs.shape[2])

            if "lands" in pat_g:
                cur_lands = pat_g["lands"][:].astype(np.float32)
                assert cur_lands.shape[0] == cur_projs.shape[0]
                assert np.all(np.isfinite(cur_lands)), "inputs must be finite (dataset.py:419)"
                cur_lands = mark_oob_landmarks_inf(cur_lands, orig_img_shape)
                all_lands.append(cur_lands)

            if find_minmax:
                mm_min = min(mm_min, float(cur_projs.min()))
                mm_max = max(mm_max, float(cur_projs.max()))

            all_projs.append(cur_projs)

            if (not no_seg) and "segs" in pat_g:
                cur_segs = pat_g["segs"][:]
                assert cur_segs.ndim == 3
                all_segs.append(cur_segs.astype(np.uint8))

    projs = np.concatenate(all_projs, axis=0)
    segs = np.concatenate(all_segs, axis=0) if all_segs else None
    lands = np.concatenate(all_lands, axis=0) if all_lands else None
    # every requested specimen must carry the same datasets — a partial
    # concatenation would silently misalign supervision with projections
    if segs is not None and segs.shape[0] != projs.shape[0]:
        raise ValueError(
            "specimens {} disagree on having 'segs' ({} rows vs {} projs)".format(
                list(pat_inds), segs.shape[0], projs.shape[0]
            )
        )
    if lands is not None and lands.shape[0] != projs.shape[0]:
        raise ValueError(
            "specimens {} disagree on having 'lands' ({} rows vs {} projs)".format(
                list(pat_inds), lands.shape[0], projs.shape[0]
            )
        )

    mm = None
    if need_scale:
        assert (mm_max - mm_min) > 1.0e-6
        projs = (projs - mm_min) / (mm_max - mm_min)
        mm = (mm_min, mm_max)

    data = FluoroData(projs=projs, segs=segs, lands=lands, orig_img_shape=orig_img_shape, minmax=mm)
    if dup_lr_flip:
        names = None
        if lands is not None:
            try:
                names = get_land_names_from_dataset(h5_file_path)
            except (KeyError, OSError):
                names = None
        data = lr_flip_duplicate(data, land_names=names)
    return data


class LazyFluoroReader:
    """Index-addressable on-demand view of the preprocessed archive — the
    per-host data layer of multi-host streaming (SURVEY §2.3 DP row:
    "per-host data loading of disjoint specimen shards"). Nothing is held
    resident: ``take(rows)`` reads exactly the requested rows from disk, so
    a pod process feeding its 1/P slice of every global batch touches ~N/P
    rows per epoch and keeps O(batch) host memory instead of replicating
    the full union (2.5 GB at full res, README.md:62-68) into every host.

    Semantics match ``load_dataset`` row-for-row: specimens concatenate in
    ``pat_inds`` order, landmarks are finite-checked then OOB-marked inf.
    With ``dup_lr_flip`` the virtual index space doubles: row ``i + n_base``
    is the left/right mirror of row ``i`` (``_mirror_rows`` — identical math
    to lr_flip_duplicate, so streamed and resident trajectories coincide).

    Thread discipline: the persistent h5py handle is NOT thread-safe; all
    ``take`` calls must come from one thread at a time (the training loops
    call it from a single prefetch producer thread)."""

    def __init__(
        self,
        h5_file_path: str,
        pat_inds: Sequence[int],
        dup_lr_flip: bool = False,
        class_swap: Sequence[tuple[int, int]] = ((1, 2), (5, 6)),
    ):
        self._f = h5.File(h5_file_path, "r")
        self._groups = []
        self.orig_img_shape = None
        counts = []
        has_segs, has_lands = [], []
        for pat_idx in pat_inds:
            g = self._f["{:02d}".format(pat_idx)]
            shape = g["projs"].shape
            assert len(shape) == 3
            if self.orig_img_shape is None:
                self.orig_img_shape = (shape[1], shape[2])
            else:
                assert self.orig_img_shape == (shape[1], shape[2])
            counts.append(shape[0])
            has_segs.append("segs" in g)
            has_lands.append("lands" in g)
            self._groups.append(g)
        assert len(set(has_segs)) == 1 and len(set(has_lands)) == 1, (
            "specimens {} disagree on having segs/lands".format(list(pat_inds))
        )
        self.has_segs = has_segs[0]
        self.has_lands = has_lands[0]
        self._offsets = np.concatenate([[0], np.cumsum(counts)])
        self.n_base = int(self._offsets[-1])
        self._dup = dup_lr_flip
        self._class_swap = class_swap
        self.land_names = None
        if dup_lr_flip and self.has_lands:
            try:
                self.land_names = get_land_names_from_dataset(h5_file_path)
            except (KeyError, OSError):
                self.land_names = None
        self.num_lands = 0
        if self.has_lands:
            self.num_lands = self._groups[0]["lands"].shape[2]
        self.minmax = None

    def __len__(self) -> int:
        return self.n_base * 2 if self._dup else self.n_base

    def close(self) -> None:
        """Idempotent; also invoked on GC (__del__), so a setup failure
        between construction and the owning loop's try/finally cannot leak
        the handle past the reader object's lifetime."""
        if self._f is not None:
            self._f.close()
            self._f = None
            self._groups = []

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _read(self, dset_name: str, rows: np.ndarray, dtype) -> np.ndarray:
        """Gather arbitrary (unsorted, possibly duplicated) base rows from
        the per-specimen datasets. h5py fancy reads need sorted unique
        in-bounds indices per dataset; request order is restored after."""
        uniq, inverse = np.unique(rows, return_inverse=True)
        parts = []
        for si, g in enumerate(self._groups):
            lo, hi = self._offsets[si], self._offsets[si + 1]
            m = (uniq >= lo) & (uniq < hi)
            if not m.any():
                continue
            local = (uniq[m] - lo).astype(np.int64)
            parts.append(g[dset_name][local])
        out = np.concatenate(parts).astype(dtype)
        return out[inverse]

    def take(self, indices: Sequence[int]):
        """Read the given virtual rows -> (projs, segs, lands) numpy arrays
        in request order (segs/lands None when the archive lacks them)."""
        idx = np.asarray(indices, np.int64)
        assert idx.size and idx.min() >= 0 and idx.max() < len(self), (
            "rows out of range for {}-row reader".format(len(self))
        )
        mirrored = idx >= self.n_base
        base = np.where(mirrored, idx - self.n_base, idx)

        projs = self._read("projs", base, np.float32)
        segs = self._read("segs", base, np.uint8) if self.has_segs else None
        lands = None
        if self.has_lands:
            lands = self._read("lands", base, np.float32)
            assert np.all(np.isfinite(lands)), (
                "inputs must be finite (dataset.py:419)"
            )
            lands = mark_oob_landmarks_inf(lands, self.orig_img_shape)

        if mirrored.any():
            m = mirrored
            m_projs, m_segs, m_lands = _mirror_rows(
                projs[m], None if segs is None else segs[m],
                None if lands is None else lands[m],
                self.orig_img_shape[1], self.land_names, self._class_swap,
            )
            projs[m] = m_projs
            if segs is not None:
                segs[m] = m_segs
            if lands is not None:
                lands[m] = m_lands
        return projs, segs, lands


def split_indices(n: int, train_valid_split: float, seed: int | None = None):
    """The split core shared by every trainer: ceil(split*n) train positions
    after a Random(seed) shuffle (reference dataset.py:524-551 semantics).
    Single source so fit() and fit_multifold can never drift apart."""
    assert 0.0 < train_valid_split < 1.0
    num_train = int(math.ceil(train_valid_split * n))
    if n - num_train == 0:
        raise ValueError(
            "train_valid_split={} leaves an empty validation set for {} "
            "samples".format(train_valid_split, n)
        )
    all_inds = list(range(n))
    _pyrandom.Random(seed).shuffle(all_inds)
    return all_inds[:num_train], all_inds[num_train:]


def split_train_valid(
    data: FluoroData,
    train_valid_split: float,
    train_valid_idx: tuple[Sequence[int] | None, Sequence[int] | None] | None = None,
    seed: int | None = None,
):
    """Random (or restored) train/valid split (reference dataset.py:524-551).

    Returns (train_data, valid_data, train_inds, valid_inds); indices are
    plain python lists so they serialize into checkpoints like the
    reference's (train.py:512-513).
    """
    assert 0.0 < train_valid_split < 1.0
    n = len(data)
    num_train = int(math.ceil(train_valid_split * n))
    num_valid = n - num_train
    if num_valid == 0:
        raise ValueError(
            "train_valid_split={} leaves an empty validation set for {} samples; "
            "lower the split or provide explicit --valid-pats".format(train_valid_split, n)
        )

    if (
        train_valid_idx is None
        or train_valid_idx[0] is None
        or train_valid_idx[1] is None
    ):
        train_inds, valid_inds = split_indices(n, train_valid_split, seed)
    else:
        train_inds = list(train_valid_idx[0])
        valid_inds = list(train_valid_idx[1])
        assert len(train_inds) == num_train
        assert len(valid_inds) == num_valid

    return data.subset(train_inds), data.subset(valid_inds), train_inds, valid_inds
