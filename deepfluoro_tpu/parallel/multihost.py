"""Multi-host (multi-process) training support.

The reference is strictly single-process (SURVEY.md §2.3). For pod-scale
TPU training each host runs one process owning a subset of chips;
coordination is jax.distributed + the same jit shardings (collectives ride
ICI within a slice and DCN across slices — put the DCN axis first in the
mesh, parallel/mesh.py).

Host-side duties here:
- ``initialize`` wraps jax.distributed.initialize (no-op single-process);
- ``local_shard_indices`` splits the global example index range into
  disjoint per-host shards so each host's BatchIterator feeds only its
  slice of the global batch (host h takes every num_processes-th index);
- ``global_batch_from_local`` forms a globally-sharded array from per-host
  local batches via ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None, num_processes: int | None = None, process_id: int | None = None) -> None:
    """Initialize multi-process JAX when configured; safe no-op otherwise."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_shard_indices(n_examples: int, seed: int, epoch: int) -> np.ndarray:
    """Disjoint shuffled index shard for this process.

    All processes derive the identical global permutation from (seed, epoch)
    and stride over it by process index. The permutation is truncated to a
    multiple of the process count first (drop-tail), so every process holds
    EXACTLY the same shard size — ``jax.make_array_from_process_local_data``
    requires consistent global shapes across processes, and an uneven tail
    would desync the pod. Because the permutation is epoch-dependent, the
    dropped examples differ each epoch (standard distributed-sampler
    semantics), so coverage is complete over time.
    """
    rng = np.random.default_rng((seed << 20) ^ epoch)
    perm = rng.permutation(n_examples)
    p = jax.process_count()
    n_even = (n_examples // p) * p
    assert n_even > 0, (
        "dataset of {} examples cannot feed {} processes".format(n_examples, p)
    )
    return perm[:n_even][jax.process_index()::p]


def local_batch_slice(global_idx: np.ndarray) -> np.ndarray:
    """This process's contiguous slice of one global batch's index list.

    ``jax.make_array_from_process_local_data`` lays process p's rows at
    global batch positions ``[p*b_local, (p+1)*b_local)`` for a batch-axis-
    over-'data' sharding (jax orders devices process-contiguously), so
    contiguous chunking reproduces EXACTLY the single-process batch layout —
    multi-host training matches the single-host run sample-for-sample
    (tests/test_multiprocess.py pins the loss parity). Contrast with
    ``local_shard_indices``, which assigns disjoint example SETS per host
    (scalable per-host loading, different batch composition).

    The caller must hand every process the identical ``global_idx`` (derive
    it from a shared seed) with length divisible by the process count.
    """
    p = jax.process_count()
    b = int(global_idx.shape[0])
    assert b % p == 0, (
        "global batch of {} does not split over {} processes".format(b, p)
    )
    bl = b // p
    i = jax.process_index()
    return global_idx[i * bl : (i + 1) * bl]


def global_batch_from_local(mesh: Mesh, local_batch: np.ndarray, spec: P | None = None):
    """Assemble the global sharded array from this process's local slice of
    the batch. spec defaults to batch-axis over 'data'."""
    if spec is None:
        names = [None] * local_batch.ndim
        names[0] = "data"
        spec = P(*names)
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_batch)
    )


def replicated_from_local(sharding, x):
    """Place a host array fully replicated on a (possibly multi-process)
    mesh WITHOUT collectives.

    ``jax.device_put(host_array, cross_process_sharding)`` runs a hidden
    ``assert_equal`` — an allgather of the ENTIRE value across hosts to
    verify equality — which is real DCN traffic for large arrays (a
    device-resident archive, an eval batch per validation step) and is
    unsafe off the main thread. ``make_array_from_process_local_data``
    builds the same replicated global array from purely local transfers;
    the caller guarantees every process passes the same value (true for
    everything derived deterministically from the shared archive/seed).
    Single-process shardings take the plain device_put fast path (no
    assert there).
    """
    x = np.asarray(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x, x.shape)
