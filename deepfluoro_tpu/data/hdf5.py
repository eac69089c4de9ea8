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
    projs = np.concatenate([data.projs, data.projs[:, :, ::-1]])

    segs = None
    if data.segs is not None:
        flipped = data.segs[:, :, ::-1]
        lut = np.arange(256, dtype=data.segs.dtype)
        for a, b in class_swap:
            lut[a], lut[b] = b, a
        segs = np.concatenate([data.segs, lut[flipped]])

    lands = None
    if data.lands is not None:
        cols = data.orig_img_shape[1]
        mirrored = data.lands.copy()
        finite = np.isfinite(mirrored[:, 0, :])
        mirrored[:, 0, :][finite] = (cols - 1) - mirrored[:, 0, :][finite]
        perm = _lr_land_permutation(mirrored.shape[-1], land_names)
        mirrored = mirrored[:, :, perm]
        lands = np.concatenate([data.lands, mirrored])

    return FluoroData(
        projs=projs, segs=segs, lands=lands,
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
