"""Tests for the native chunk codec: correctness vs zlib in both directions,
HDF5 direct-chunk writes readable through the normal gzip filter, direct
reads matching h5py slicing, and the pure-Python fallback paths."""

import zlib

import h5py as h5
import numpy as np
import pytest

from deepfluoro_tpu.native import (
    compress_chunks,
    decompress_chunks,
    native_available,
    read_dataset_direct,
    write_dataset_direct,
)
from deepfluoro_tpu.native import chunkzip as cz


class TestCompressChunks:
    def test_roundtrip(self, rng):
        data = (rng.random((6, 500)) * 100).astype(np.float32)
        streams = compress_chunks(data, level=9)
        assert len(streams) == 6
        for i, blob in enumerate(streams):
            out = np.frombuffer(zlib.decompress(blob), np.float32)
            np.testing.assert_array_equal(out, data[i])

    def test_native_lib_builds(self):
        # g++ and zlib are part of the baked toolchain; the native path
        # should actually be exercised in CI, not just the fallback
        assert native_available()

    def test_matches_serial_zlib_decompressed(self, rng):
        data = rng.integers(0, 7, (4, 64, 64)).astype(np.uint8)
        streams = compress_chunks(data, level=9)
        for i, blob in enumerate(streams):
            assert zlib.decompress(blob) == data[i].tobytes()

    def test_fallback_path(self, rng, monkeypatch):
        monkeypatch.setattr(cz, "_LIB", None)
        monkeypatch.setattr(cz, "_TRIED", True)
        data = rng.random((3, 100)).astype(np.float32)
        streams = cz.compress_chunks(data, level=6)
        for i, blob in enumerate(streams):
            np.testing.assert_array_equal(
                np.frombuffer(zlib.decompress(blob), np.float32), data[i]
            )

    def test_empty(self):
        assert compress_chunks(np.zeros((0, 10), np.float32)) == []


class TestDirectWrite:
    def test_segs_layout(self, tmp_path, rng):
        data = rng.integers(0, 7, (5, 32, 32)).astype(np.uint8)
        p = str(tmp_path / "t.h5")
        with h5.File(p, "w") as f:
            d = f.create_dataset(
                "nn-segs", (5, 32, 32), dtype="u1", chunks=(1, 32, 32),
                compression="gzip", compression_opts=9,
            )
            write_dataset_direct(d, 0, data)
        with h5.File(p, "r") as f:
            np.testing.assert_array_equal(f["nn-segs"][:], data)

    def test_heats_layout_batched_offsets(self, tmp_path, rng):
        data = rng.random((4, 3, 16, 16)).astype(np.float32)
        p = str(tmp_path / "t.h5")
        with h5.File(p, "w") as f:
            d = f.create_dataset(
                "nn-heats", (4, 3, 16, 16), chunks=(1, 1, 16, 16),
                compression="gzip", compression_opts=9,
            )
            write_dataset_direct(d, 0, data[:2])
            write_dataset_direct(d, 2, data[2:])
        with h5.File(p, "r") as f:
            np.testing.assert_allclose(f["nn-heats"][:], data)

    def test_decompress_roundtrip(self, rng):
        data = (rng.random((7, 321)) * 50).astype(np.float32)
        streams = compress_chunks(data, level=6)
        flat = decompress_chunks(streams, data.shape[1] * 4)
        np.testing.assert_array_equal(flat.view(np.float32), data)

    def test_decompress_fallback_path(self, rng, monkeypatch):
        monkeypatch.setattr(cz, "_LIB", None)
        monkeypatch.setattr(cz, "_TRIED", True)
        data = rng.integers(0, 200, (3, 64)).astype(np.uint8)
        streams = [zlib.compress(data[i].tobytes(), 9) for i in range(3)]
        np.testing.assert_array_equal(cz.decompress_chunks(streams, 64), data)

    def test_decompress_size_mismatch_raises(self):
        blob = zlib.compress(b"x" * 10, 9)
        with pytest.raises(RuntimeError):
            decompress_chunks([blob], 11)

    def test_decompress_empty(self):
        assert decompress_chunks([], 16).shape == (0, 16)

    def test_file_readable_without_this_library(self, tmp_path, rng):
        """The written chunks must be plain HDF5-gzip — any h5py reader
        decodes them (the file contract of util.py:300-310)."""
        data = rng.integers(0, 255, (2, 8, 8)).astype(np.uint8)
        p = str(tmp_path / "t.h5")
        with h5.File(p, "w") as f:
            d = f.create_dataset(
                "x", (2, 8, 8), dtype="u1", chunks=(1, 8, 8),
                compression="gzip", compression_opts=9,
            )
            write_dataset_direct(d, 0, data)
        with h5.File(p, "r") as f:
            assert f["x"].compression == "gzip"
            np.testing.assert_array_equal(f["x"][:], data)


class TestDirectRead:
    def test_segs_layout(self, tmp_path, rng):
        data = rng.integers(0, 7, (5, 32, 32)).astype(np.uint8)
        p = str(tmp_path / "t.h5")
        with h5.File(p, "w") as f:
            f.create_dataset(
                "nn-segs", data=data, chunks=(1, 32, 32),
                compression="gzip", compression_opts=9,
            )
        with h5.File(p, "r") as f:
            np.testing.assert_array_equal(read_dataset_direct(f["nn-segs"], force_direct=True), data)

    def test_heats_layout(self, tmp_path, rng):
        data = rng.random((4, 3, 16, 16)).astype(np.float32)
        p = str(tmp_path / "t.h5")
        with h5.File(p, "w") as f:
            f.create_dataset(
                "nn-heats", data=data, chunks=(1, 1, 16, 16),
                compression="gzip", compression_opts=9,
            )
        with h5.File(p, "r") as f:
            np.testing.assert_array_equal(read_dataset_direct(f["nn-heats"], force_direct=True), data)

    def test_roundtrip_with_direct_write(self, tmp_path, rng):
        data = rng.random((6, 2, 12, 12)).astype(np.float32)
        p = str(tmp_path / "t.h5")
        with h5.File(p, "w") as f:
            d = f.create_dataset(
                "x", (6, 2, 12, 12), chunks=(1, 1, 12, 12),
                compression="gzip", compression_opts=9,
            )
            write_dataset_direct(d, 0, data)
        with h5.File(p, "r") as f:
            np.testing.assert_array_equal(read_dataset_direct(f["x"], force_direct=True), data)

    def test_fallback_layouts(self, tmp_path, rng):
        """Anything outside the per-image-chunk gzip contract must still read
        correctly (via the h5py slicing fallback)."""
        p = str(tmp_path / "t.h5")
        a = rng.random((4, 8, 8)).astype(np.float32)       # contiguous
        b = rng.random((4, 8, 8)).astype(np.float32)       # multi-image chunks
        c = rng.random((4, 8, 8)).astype(np.float32)       # gzip+shuffle
        d = rng.random((3, 5)).astype(np.float32)          # rank 2
        with h5.File(p, "w") as f:
            f.create_dataset("a", data=a)
            f.create_dataset("b", data=b, chunks=(2, 8, 8), compression="gzip")
            f.create_dataset(
                "c", data=c, chunks=(1, 8, 8), compression="gzip", shuffle=True
            )
            f.create_dataset("d", data=d)
        with h5.File(p, "r") as f:
            for name, ref in [("a", a), ("b", b), ("c", c), ("d", d)]:
                np.testing.assert_array_equal(read_dataset_direct(f[name], force_direct=True), ref)

    def test_unallocated_chunks(self, tmp_path):
        """A gzip dataset created but never written has no stored chunks;
        the direct path must fall back, not crash."""
        p = str(tmp_path / "t.h5")
        with h5.File(p, "w") as f:
            f.create_dataset(
                "x", (3, 8, 8), dtype="f4", chunks=(1, 8, 8),
                compression="gzip", fillvalue=0.5,
            )
        with h5.File(p, "r") as f:
            np.testing.assert_array_equal(
                read_dataset_direct(f["x"], force_direct=True), np.full((3, 8, 8), 0.5, np.float32)
            )
