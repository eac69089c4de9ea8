"""ctypes binding for the multithreaded chunk compressor (chunkzip.cpp),
with lazy on-demand compilation and a pure-Python (serial zlib) fallback.

HDF5's gzip filter (filter id 1) stores each chunk as a plain zlib deflate
stream, so chunks compressed here can be handed to
``h5py.h5d.DatasetID.write_direct_chunk`` unchanged — bypassing h5py's
serial filter pipeline while producing byte-identical file semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import zlib

import numpy as np

_LIB = None
_TRIED = False


def _build_lib() -> str | None:
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)), "chunkzip.cpp")
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "deepfluoro_tpu",
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, "libchunkzip.so")
    if os.path.exists(lib_path) and os.path.getmtime(lib_path) >= os.path.getmtime(src):
        return lib_path
    tmp = lib_path + ".build.{}".format(os.getpid())
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp, "-lz", "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, lib_path)
        return lib_path
    except (subprocess.SubprocessError, OSError):
        return None


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.dft_compress_bound.restype = ctypes.c_size_t
        lib.dft_compress_bound.argtypes = [ctypes.c_size_t]
        lib.dft_compress_chunks.restype = ctypes.c_int
        lib.dft_compress_chunks.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.dft_decompress_chunks.restype = ctypes.c_int
        lib.dft_decompress_chunks.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_size_t, ctypes.c_size_t, ctypes.c_int,
            ctypes.c_void_p,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def compress_chunks(data: np.ndarray, level: int = 9, n_threads: int | None = None) -> list[bytes]:
    """Compress ``data`` reshaped as (n_chunks, chunk_bytes) row-chunks into
    zlib streams. data: any C-contiguous array whose first axis is the chunk
    axis. Falls back to serial zlib when the native library is unavailable."""
    arr = np.ascontiguousarray(data)
    n_chunks = arr.shape[0]
    chunk_bytes = arr.nbytes // max(n_chunks, 1)
    if n_chunks == 0:
        return []

    lib = _load()
    if lib is None:
        raw = arr.reshape(n_chunks, -1)
        return [zlib.compress(raw[i].tobytes(), level) for i in range(n_chunks)]

    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, n_chunks, 16)

    bound = lib.dft_compress_bound(chunk_bytes)
    dst = np.empty((n_chunks, bound), np.uint8)
    sizes = (ctypes.c_uint64 * n_chunks)()
    rc = lib.dft_compress_chunks(
        arr.ctypes.data_as(ctypes.c_void_p),
        n_chunks,
        chunk_bytes,
        level,
        n_threads,
        dst.ctypes.data_as(ctypes.c_void_p),
        bound,
        sizes,
    )
    if rc != 0:
        raise RuntimeError("native compression failed with zlib code {}".format(rc))
    return [dst[i, : sizes[i]].tobytes() for i in range(n_chunks)]


def decompress_chunks(
    blobs: list[bytes], chunk_bytes: int, n_threads: int | None = None
) -> np.ndarray:
    """Inflate zlib streams in parallel into a (n_chunks, chunk_bytes) u8
    array. Falls back to serial zlib when the native library is unavailable."""
    n_chunks = len(blobs)
    out = np.empty((n_chunks, chunk_bytes), np.uint8)
    if n_chunks == 0:
        return out

    lib = _load()
    if lib is None:
        for i, blob in enumerate(blobs):
            raw = zlib.decompress(blob)
            if len(raw) != chunk_bytes:
                raise RuntimeError(
                    "chunk {} inflated to {} bytes, expected {}".format(i, len(raw), chunk_bytes)
                )
            out[i] = np.frombuffer(raw, np.uint8)
        return out

    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, n_chunks, 16)

    src = np.frombuffer(b"".join(blobs), np.uint8)
    sizes_np = np.asarray([len(b) for b in blobs], np.uint64)
    offsets_np = np.zeros(n_chunks, np.uint64)
    np.cumsum(sizes_np[:-1], out=offsets_np[1:])
    rc = lib.dft_decompress_chunks(
        src.ctypes.data_as(ctypes.c_void_p),
        offsets_np.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        sizes_np.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n_chunks,
        chunk_bytes,
        n_threads,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise RuntimeError("native decompression failed with zlib code {}".format(rc))
    return out


def _gzip_only(dset) -> bool:
    """True when the dataset's filter pipeline is exactly the gzip filter
    (no shuffle/fletcher32/scaleoffset), i.e. raw chunks are plain zlib."""
    return (
        dset.chunks is not None
        and dset.compression == "gzip"
        and not dset.shuffle
        and not dset.fletcher32
        and dset.scaleoffset is None
    )


def read_dataset_direct(dset, force_direct: bool = False) -> np.ndarray:
    """Read a whole per-image-chunked gzip dataset (the inference output
    contract: nn-segs (N,R,C) chunked (1,R,C); nn-heats (N,L,R,C) chunked
    (1,1,R,C)) via direct chunk reads + parallel inflate, bypassing h5py's
    serial filter pipeline. Any other layout falls back to ``dset[:]``, as
    does a single-CPU host (nothing to parallelize there; h5py's C pipeline
    measured fastest). ``force_direct`` bypasses only the CPU gate (tests)."""
    shape = dset.shape
    expected = (1,) + shape[1:] if len(shape) == 3 else (1, 1) + shape[2:]
    if (
        len(shape) not in (3, 4)
        or not _gzip_only(dset)
        or dset.chunks != expected
        or any(s == 0 for s in shape)
        or ((os.cpu_count() or 1) <= 1 and not force_direct)
    ):
        return dset[:]

    if len(shape) == 3:
        coords = [(i, 0, 0) for i in range(shape[0])]
    else:
        coords = [(i, j, 0, 0) for i in range(shape[0]) for j in range(shape[1])]
    try:
        pairs = [dset.id.read_direct_chunk(c) for c in coords]
    except Exception:  # unallocated chunk, unsupported driver, ... — not fatal
        return dset[:]
    if any(mask != 0 for mask, _ in pairs):  # a filter was skipped at write
        return dset[:]
    chunk_bytes = int(np.prod(expected)) * dset.dtype.itemsize
    try:
        flat = decompress_chunks([b for _, b in pairs], chunk_bytes)
    except Exception:
        # raw chunks that are not plain zlib of chunk_bytes (e.g. an extra
        # registered filter h5py exposes no property for) — let the normal
        # filter pipeline read them
        return dset[:]
    return flat.view(dset.dtype).reshape(shape)


def write_dataset_direct(dset, start_index: int, data: np.ndarray, level: int = 9) -> None:
    """Write ``data`` into an h5py gzip dataset starting at leading index
    ``start_index`` via parallel compression + direct chunk writes.

    Supported layouts (the inference output contract, util.py:300-310):
      dset chunks (1, R, C)    with data (B, R, C)       — nn-segs
      dset chunks (1, 1, R, C) with data (B, L, R, C)    — nn-heats
    """
    chunks = dset.chunks
    assert chunks is not None
    data = np.ascontiguousarray(data, dtype=dset.dtype)
    assert data.shape[1:] == dset.shape[1:], (data.shape, dset.shape)

    if len(dset.shape) == 3:
        assert chunks == (1,) + dset.shape[1:]
        streams = compress_chunks(data.reshape(data.shape[0], -1), level=level)
        for i, blob in enumerate(streams):
            dset.id.write_direct_chunk((start_index + i, 0, 0), blob)
    elif len(dset.shape) == 4:
        assert chunks == (1, 1) + dset.shape[2:]
        b, l = data.shape[0], data.shape[1]
        streams = compress_chunks(data.reshape(b * l, -1), level=level)
        k = 0
        for i in range(b):
            for j in range(l):
                dset.id.write_direct_chunk((start_index + i, j, 0, 0), streams[k])
                k += 1
    else:
        raise ValueError("unsupported dataset rank {}".format(len(dset.shape)))
