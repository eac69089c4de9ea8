"""Self-describing single-file checkpoints with atomic writes.

Mirrors the reference's checkpoint contract (train.py:473-515): one file
holding the model/optimizer/scheduler state plus *every* hyperparameter, so
a network can be rebuilt from the checkpoint alone (test_ensemble.py:61-98)
and a resumed run restores all settings (train.py:191-273). Writes go to a
``.tmp`` sibling then ``os.replace`` — atomic like the reference's
shutil.move (train.py:474,515).

Format: flax msgpack of a nested dict. Optimizer state is converted through
``flax.serialization.to_state_dict`` so it round-trips as plain dicts and is
restored into a freshly built optax state on load.
"""

from __future__ import annotations

import os
import threading

import numpy as np
import jax
from flax import serialization


def _to_plain(tree):
    """Pytree -> nested plain containers of numpy arrays / scalars."""
    return jax.tree.map(lambda x: np.asarray(x), serialization.to_state_dict(tree))


_jit_copy = None


def _snapshot(trees: dict) -> dict:
    """Copy every jax.Array leaf of ``trees`` in ONE jitted dispatch;
    non-array leaves (python ints in optimizer states, ...) pass through
    untouched so their types survive serialization unchanged."""
    global _jit_copy
    if _jit_copy is None:
        import jax.numpy as jnp

        _jit_copy = jax.jit(lambda xs: [jnp.copy(x) for x in xs])
    leaves, treedef = jax.tree_util.tree_flatten(trees)
    arr_idx = [i for i, x in enumerate(leaves) if isinstance(x, jax.Array)]
    if arr_idx:
        copied = _jit_copy([leaves[i] for i in arr_idx])
        for i, c in zip(arr_idx, copied):
            leaves[i] = c
    return jax.tree_util.tree_unflatten(treedef, leaves)


class AsyncCheckpointer:
    """Overlap checkpoint I/O with training.

    ``save`` snapshots the state with an on-device copy (cheap; survives the
    next step's buffer donation) and enqueues the device->host fetch plus
    the serialized file write onto a background worker thread. Tasks run
    strictly in submission order, so writes to the same file keep the
    atomic-replace contract, and ``copy`` (the reference's best-valid
    copy-instead-of-resave optimization, train.py:523-531) is ordered after
    the save that produced its source. Submission only blocks when
    ``max_pending`` snapshots are already queued — backpressure so a slow
    filesystem cannot accumulate unbounded device snapshots. Worker errors
    surface on the next ``save``/``copy``/``wait`` call.
    """

    def __init__(self, max_pending: int = 2):
        import queue

        self._q: "queue.Queue" = queue.Queue(maxsize=max_pending)
        self._thread: threading.Thread | None = None
        self._err: BaseException | None = None
        # generation tagging: tasks queued before an error surfaced are
        # permanently stale — once the error is raised to the caller they
        # must never run, even though _err has been cleared (a copy(src,dst)
        # queued behind a failed save(src) would otherwise publish the old
        # src as dst when the caller catches the error and continues)
        self._gen = 0
        self._min_gen = 0

    def _worker(self):
        while True:
            gen, kind, args, kwargs = self._q.get()
            try:
                # fail fast: after an error, skip queued tasks until the
                # error has surfaced to the caller; after it surfaces, skip
                # any task from a pre-error generation
                if self._err is None and gen >= self._min_gen:
                    if kind == "save":
                        save_checkpoint(*args, **kwargs)
                    else:
                        _atomic_copy(*args)
            except BaseException as e:
                self._err = e
            finally:
                self._q.task_done()

    def _submit(self, task) -> None:
        self._raise_pending()
        if self._thread is None:
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()
        self._q.put((self._gen,) + task)

    def _raise_pending(self) -> None:
        if self._err is not None:
            # everything queued up to now is stale: drop it even after _err
            # is cleared by this raise. The generation bump must happen
            # BEFORE _err clears — the worker checks `_err is None and
            # gen >= _min_gen`, so clearing first would open a window where
            # a stale pre-error task (e.g. a copy queued behind the failed
            # save) slips through and publishes old state.
            self._gen += 1
            self._min_gen = self._gen
            err, self._err = self._err, None
            raise err

    def wait(self) -> None:
        self._q.join()
        self._raise_pending()

    def save(self, path: str, **kwargs) -> None:
        if jax.process_index() != 0:
            return  # single-writer (see save_checkpoint); skip snapshot work
        snap = {
            key: kwargs[key]
            for key in ("params", "batch_stats", "opt_state")
            if kwargs.get(key) is not None
        }
        if snap:
            if jax.process_count() > 1:
                # multi-process state is replicated GLOBAL arrays: a jitted
                # device copy dispatched from process 0 alone would desync
                # the pod, so snapshot by synchronous host fetch instead —
                # reading a fully-replicated array is a local, collective-
                # free operation, and it completes before the caller's next
                # step can donate the buffers
                kwargs.update(
                    jax.tree.map(
                        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
                        snap,
                    )
                )
            else:
                # device-side copy: jnp arrays are immutable, but the
                # *buffers* get donated by the next train step, so snapshot
                # before returning. One jitted dispatch for all trees (an
                # eager per-leaf .copy() is hundreds of round trips on
                # remote-device transports).
                kwargs.update(_snapshot(snap))
        self._submit(("save", (path,), kwargs))

    def copy(self, src: str, dst: str) -> None:
        """Enqueue an atomic file copy, ordered after pending saves of src."""
        if jax.process_index() != 0:
            return
        self._submit(("copy", (src, dst), {}))


def _atomic_copy(src: str, dst: str) -> None:
    import shutil

    tmp = dst + ".tmp"
    shutil.copy(src, tmp)
    os.replace(tmp, dst)


def save_checkpoint(
    path: str,
    meta: dict,
    params,
    batch_stats=None,
    opt_state=None,
    sched_state: dict | None = None,
    epoch: int = 0,
    best_valid_loss: float | None = None,
    last_loss: float | None = None,
    num_restarts: int = 0,
    train_idx=None,
    valid_idx=None,
) -> None:
    # Multi-host safety: single-writer. Under jax.distributed every process
    # runs the training loop; parameters are replicated (data/spatial
    # sharding shards batches/activations, not weights), so process 0 holds
    # a complete copy and the others writing the same file would race.
    if jax.process_index() != 0:
        return
    payload = {
        "meta": dict(meta),
        "epoch": epoch,
        "loss": -1.0 if last_loss is None else float(last_loss),
        "best-valid-loss": np.nan if best_valid_loss is None else float(best_valid_loss),
        "lrs-num-restarts": num_restarts,
        "model-state-dict": {
            "params": _to_plain(params),
            "batch_stats": _to_plain(batch_stats) if batch_stats is not None else {},
        },
        "optimizer-state-dict": _to_plain(opt_state) if opt_state is not None else {},
        "scheduler-state-dict": sched_state or {},
        "train-idx": [] if train_idx is None else [int(i) for i in train_idx],
        "valid-idx": [] if valid_idx is None else [int(i) for i in valid_idx],
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = "{}.tmp".format(path)
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def is_torch_checkpoint(path: str) -> bool:
    """Reference ``.pt`` files are torch.save artifacts: a zip archive
    (``PK``, the modern default) or a bare pickle stream (``\\x80`` PROTO
    opcode, legacy serialization). This framework's msgpack checkpoints
    start with a map header for their >2-entry top-level dict (0x82-0x8f
    fixmap or 0xde/0xdf map16/32), so the magics cannot collide."""
    with open(path, "rb") as f:
        magic = f.read(2)
    return magic[:2] == b"PK" or magic[:1] == b"\x80"


def load_checkpoint(path: str) -> dict:
    """Load the raw checkpoint dict. Use ``restore_tree`` to rebuild typed
    pytrees (params/opt_state) from templates."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_tree(template, state_dict):
    """Restore a typed pytree (e.g. a freshly initialized opt_state or params
    tree) from its plain-dict serialized form."""
    return serialization.from_state_dict(template, state_dict)
