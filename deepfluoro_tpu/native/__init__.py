"""Native (C++) runtime components with graceful Python fallbacks.

Currently: ``chunkzip`` — a multithreaded zlib chunk codec bypassing h5py's
serial filter pipeline in both directions: parallel deflate feeding
direct-chunk writes of the gzip-9 inference outputs, and direct-chunk reads
feeding parallel inflate for the evaluation CLIs that load them back.
"""

from deepfluoro_tpu.native.chunkzip import (
    compress_chunks,
    decompress_chunks,
    native_available,
    read_dataset_direct,
    write_dataset_direct,
)

__all__ = [
    "compress_chunks",
    "decompress_chunks",
    "native_available",
    "read_dataset_direct",
    "write_dataset_direct",
]
