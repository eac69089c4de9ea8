"""Host batching + device prefetch.

The reference feeds training with torch DataLoader worker processes doing the
full augmentation on CPU (train.py:293-296). Here the host side only shuffles
indices and slices numpy arrays; everything compute-shaped (augmentation,
one-hot, padding, normalization, heatmap synthesis) runs on device inside
``prepare_batch`` (augment.py), which the train step consumes directly.

``BatchIterator`` optionally keeps the full dataset resident on device (it is
small: the 8x archive is 42 MB, README.md:66) and gathers batches with
device-side indexing, eliminating per-step host->device copies entirely.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from deepfluoro_tpu.data.hdf5 import FluoroData


def prefetch_sequence(
    make_item, num_items: int, prefetch: int = 2, join_timeout: float = 10.0
):
    """Producer-thread prefetch over ``make_item(i) for i in
    range(num_items)``: host work + (async) device_put inside ``make_item``
    for the next items overlap the consumer's compute, through a bounded
    queue (at most ``prefetch`` items live ahead). Producer errors re-raise
    on the consumer; breaking out of the generator stops and joins the
    producer (bounded by ``join_timeout`` per join so a wedged make_item —
    e.g. a hung tunnel device_put — cannot turn generator close into an
    unbounded hang). Shared machinery of PrefetchIterator.epoch and the
    multifold streaming path (train/multifold.py)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def produce():
        try:
            for i in range(num_items):
                if stop.is_set():
                    return
                q.put(make_item(i))
            q.put(None)
        except BaseException as e:  # surface producer errors to consumer
            q.put(e)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # the producer may be BLOCKED inside q.put (bounded queue, consumer
        # gone) where stop alone cannot reach it — drain the queue so the
        # pending put completes, the loop observes stop, and the thread
        # exits instead of leaking mid-read (matters when make_item holds
        # resources a caller is about to close, e.g. fit()'s lazy archive
        # reader). At most one post-drain orphan item can land; it is
        # simply garbage-collected.
        import queue as _queue

        try:
            while True:
                q.get_nowait()
        except _queue.Empty:
            pass
        # bounded wait for a clean exit (an in-flight make_item finishes
        # first); a daemon thread that somehow outlives this cannot block
        # interpreter shutdown
        t.join(timeout=join_timeout)
        # a second drain catches the one orphan put that can land between
        # the first drain and the producer observing stop
        try:
            while True:
                q.get_nowait()
        except _queue.Empty:
            pass
        t.join(timeout=join_timeout)
        if t.is_alive():
            # a wedged make_item (e.g. a hung tunnel device_put) must not
            # turn generator close into an unbounded hang — warn and move
            # on; the daemon thread cannot block interpreter shutdown
            import warnings

            warnings.warn(
                "prefetch producer thread still alive after bounded join; "
                "abandoning it (make_item appears wedged)",
                RuntimeWarning,
            )


class PrefetchIterator:
    """Double-buffered host->device streaming behind the BatchIterator API.

    For datasets that exceed HBM (full-res / 2x training: the full-res
    archive is 2.5 GB, README.md:62-66), the dataset stays in host memory
    and a producer thread slices numpy batches and ``jax.device_put``s them
    ahead of consumption through a bounded queue — the next batch's H2D
    transfer overlaps the current step's compute, so the device never waits
    on PCIe/tunnel latency (at most ``prefetch`` batches live in HBM).
    """

    def __init__(
        self,
        data: FluoroData,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        sharding=None,
    ):
        """``sharding`` (optional jax.sharding.Sharding, e.g. batch-axis over
        a mesh's 'data' axis) places each prefetched batch directly onto the
        mesh instead of the default device — single-process mesh training
        streams through this."""
        assert prefetch >= 1
        self.data = data
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.prefetch = prefetch
        self.sharding = sharding
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return -(-len(self.data) // self.batch_size)

    def epoch(self):
        n = len(self.data)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)

        def _make_put(batch_len: int):
            if self.sharding is None:
                return jax.device_put
            sharding = self.sharding
            try:
                sharding.shard_shape((batch_len,) + self.data.projs.shape[1:])
            except ValueError:
                # final partial batch not divisible over the sharding's batch
                # axis: place it fully replicated instead — the consuming
                # step's in-program sharding constraint redistributes it
                # (GSPMD allows uneven partitions in compiled programs; only
                # device_put is strict), so training parity is preserved
                # without dropping the tail
                from jax.sharding import NamedSharding, PartitionSpec

                sharding = NamedSharding(sharding.mesh, PartitionSpec())
            return lambda x: jax.device_put(x, sharding)

        def make_batch(i):
            idx = order[i * self.batch_size : (i + 1) * self.batch_size]
            # device_put is asynchronous: it returns immediately and the
            # transfer proceeds while the consumer computes
            put = _make_put(len(idx))
            projs = put(self.data.projs[idx])
            segs = None if self.data.segs is None else put(self.data.segs[idx])
            lands = None if self.data.lands is None else put(self.data.lands[idx])
            return projs, segs, lands

        return prefetch_sequence(make_batch, len(self), prefetch=self.prefetch)


class BatchIterator:
    """Shuffled epoch iterator yielding raw (projs, segs, lands) batches.

    The final partial batch is kept (like torch DataLoader's default
    drop_last=False) — at most one extra jit specialization for the
    remainder shape.
    """

    def __init__(
        self,
        data: FluoroData,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        device_resident: bool = True,
    ):
        self.data = data
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self.device_resident = device_resident
        if device_resident:
            self._projs = jnp.asarray(data.projs)
            self._segs = None if data.segs is None else jnp.asarray(data.segs)
            self._lands = None if data.lands is None else jnp.asarray(data.lands)

    def __len__(self) -> int:
        return -(-len(self.data) // self.batch_size)

    def epoch(self):
        n = len(self.data)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.device_resident:
                jidx = jnp.asarray(idx)
                projs = jnp.take(self._projs, jidx, axis=0)
                segs = None if self._segs is None else jnp.take(self._segs, jidx, axis=0)
                lands = None if self._lands is None else jnp.take(self._lands, jidx, axis=0)
            else:
                projs = self.data.projs[idx]
                segs = None if self.data.segs is None else self.data.segs[idx]
                lands = None if self.data.lands is None else self.data.lands[idx]
            yield projs, segs, lands
