"""Native (C++) runtime components with graceful Python fallbacks.

Currently: ``chunkzip`` — a multithreaded zlib chunk compressor feeding
h5py direct-chunk writes for the gzip-9 inference outputs.
"""

from deepfluoro_tpu.native.chunkzip import (
    compress_chunks,
    native_available,
    write_dataset_direct,
)

__all__ = ["compress_chunks", "native_available", "write_dataset_direct"]
