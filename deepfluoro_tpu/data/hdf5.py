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


def load_dataset(
    h5_file_path: str,
    pat_inds: Sequence[int],
    minmax: bool | tuple[float, float] | None = None,
    no_seg: bool = False,
) -> FluoroData:
    """Load all projections/segs/landmarks of the given specimens.

    Mirrors reference dataset.py:368-512 minus the host-side one-hot and the
    (disabled, broken) left/right-flip duplication — see SURVEY.md §2.4; flip
    augmentation, if desired, belongs in the device-side pipeline.
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

    return FluoroData(projs=projs, segs=segs, lands=lands, orig_img_shape=orig_img_shape, minmax=mm)


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
        all_inds = list(range(n))
        rng = _pyrandom.Random(seed)
        rng.shuffle(all_inds)
        train_inds = all_inds[:num_train]
        valid_inds = all_inds[num_train:]
    else:
        train_inds = list(train_valid_idx[0])
        valid_inds = list(train_valid_idx[1])
        assert len(train_inds) == num_train
        assert len(valid_inds) == num_valid

    return data.subset(train_inds), data.subset(valid_inds), train_inds, valid_inds
