"""Tests for the native chunk compressor: correctness vs zlib, HDF5
direct-chunk writes readable through the normal gzip filter, and the
pure-Python fallback path."""

import zlib

import h5py as h5
import numpy as np
import pytest

from deepfluoro_tpu.native import compress_chunks, native_available, write_dataset_direct
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
