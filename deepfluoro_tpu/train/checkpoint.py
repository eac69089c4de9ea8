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


class AsyncCheckpointer:
    """Overlap checkpoint I/O with training.

    ``save`` snapshots the state with an on-device copy (cheap; survives the
    next step's buffer donation) and hands the device->host fetch plus the
    serialized file write to a background thread. At most one save is in
    flight; a new save (or ``wait``) joins the previous one first, so file
    writes stay ordered and the atomic-replace contract holds.
    """

    def __init__(self):
        self._thread: threading.Thread | None = None

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def save(self, path: str, **kwargs) -> None:
        if jax.process_index() != 0:
            return  # single-writer (see save_checkpoint); skip snapshot work
        self.wait()
        # device-side copy: jnp arrays are immutable, but the *buffers* get
        # donated by the next train step, so snapshot before returning
        snap = {}
        for key in ("params", "batch_stats", "opt_state"):
            if kwargs.get(key) is not None:
                snap[key] = jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x, kwargs[key])
        kwargs.update(snap)

        def run():
            save_checkpoint(path, **kwargs)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()


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


def load_checkpoint(path: str) -> dict:
    """Load the raw checkpoint dict. Use ``restore_tree`` to rebuild typed
    pytrees (params/opt_state) from templates."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_tree(template, state_dict):
    """Restore a typed pytree (e.g. a freshly initialized opt_state or params
    tree) from its plain-dict serialized form."""
    return serialization.from_state_dict(template, state_dict)
