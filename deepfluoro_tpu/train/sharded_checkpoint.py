"""Sharded (multi-host / partitioned-parameter) checkpoints via orbax.

The single-file msgpack checkpoints (train/checkpoint.py) fetch every array
with ``np.asarray``, which requires each value to be fully addressable from
the writing process. That holds in the reference's setting (one process,
train.py:473-515) and in this framework's DP/spatial paths, where weights
are replicated. It breaks when the parameters themselves are sharded across
processes: tensor parallelism over a 'model' mesh axis
(parallel/sharding.py::make_tp_train_step) or the multifold stacked-fold
axis over 'ensemble' spanning hosts.

This module provides the orbax-backed equivalent (SURVEY.md §5 failure-
detection row: "orbax-style single-writer or per-host sharded"):

* ``save_sharded_checkpoint`` — every process writes only its local shards
  through orbax's OCDBT tree format (a collective call); process 0 adds the
  same self-describing metadata payload as the single-file format (minus the
  big arrays) as ``meta.msgpack``.
* ``load_sharded_checkpoint`` — restores onto ANY target topology: the
  caller provides typed templates plus a sharding (one sharding for all
  leaves, or a sharding pytree such as the TP rule from
  parallel.sharding.tp_state_shardings), and orbax reshards on read. Saving
  from 4-way TP and restoring replicated on one device — or the reverse —
  both work; tests pin each direction.

The returned payload dict has the exact key layout of
``checkpoint.load_checkpoint`` so downstream consumers (config rebuild,
resume, test_ensemble) treat both formats uniformly.
"""

from __future__ import annotations

import os
import shutil

import jax
import numpy as np
from flax import serialization

_ARRAYS_SUBDIR = "arrays"
_META_FILE = "meta.msgpack"
_CURRENT_FILE = "CURRENT"
_SLOTS = ("slot0", "slot1")


def _read_current(path: str) -> str | None:
    """Name of the committed slot, or None (legacy/fresh layout)."""
    try:
        with open(os.path.join(path, _CURRENT_FILE)) as f:
            slot = f.read().strip()
        return slot if slot in _SLOTS else None
    except FileNotFoundError:
        return None


def _sync(tag: str) -> None:
    """Cross-process barrier (no-op single-process). The orbax array save is
    itself collective, but the directory prep and metadata sidecar are
    process-0-only host I/O — without barriers another process can race past
    them (e.g. load before meta.msgpack exists)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("sharded_ckpt:" + tag)


def _is_array_leaf(x) -> bool:
    return hasattr(x, "shape") and hasattr(x, "dtype")


def _path_key(path) -> tuple:
    """Normalize a tree_flatten_with_path key path to comparable strings."""
    return tuple(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def _state_dicts(params, batch_stats=None, opt_state=None) -> dict:
    """Plain-container (dict) trees for a stable saved structure, exactly
    like the msgpack format's model-state-dict/optimizer-state-dict. Parts
    that are None or empty are omitted (save and load use the same rule, so
    saved and requested structures always line up)."""
    tree = {"params": serialization.to_state_dict(params)}
    if batch_stats is not None:
        bs = serialization.to_state_dict(batch_stats)
        if bs:
            tree["batch_stats"] = bs
    if opt_state is not None:
        tree["opt_state"] = serialization.to_state_dict(opt_state)
    return tree


def save_sharded_checkpoint(
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
    """Write a sharded checkpoint directory at ``path``.

    A collective operation: under ``jax.distributed`` every process must
    call it (each writes its own shards); the metadata sidecar is written by
    process 0 only.

    Atomicity (the reference's contract, train.py:474,515): each save goes
    into an A/B slot subdirectory (``slot0``/``slot1``) — arrays first, then
    the metadata sidecar — and only once the slot is complete does process 0
    atomically repoint the ``CURRENT`` file at it. A crash at ANY point
    before the pointer flip leaves the previously committed slot (and its
    matching metadata) untouched; stale half-written slots are replaced by
    the next save. Re-saving therefore never destroys the last good
    checkpoint, and arrays can never pair with a mismatched meta.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    # CURRENT is only rewritten at commit time, so every process reads the
    # same stable value here (shared filesystem — a requirement orbax's
    # multi-process array write already imposes)
    cur = _read_current(path)
    slot = _SLOTS[1] if cur == _SLOTS[0] else _SLOTS[0]
    slot_dir = os.path.join(path, slot)
    if jax.process_index() == 0:
        os.makedirs(path, exist_ok=True)
        if os.path.exists(slot_dir):  # stale half-written slot from a crash
            shutil.rmtree(slot_dir)
        os.makedirs(slot_dir)
    _sync("dir-prepped")

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.join(slot_dir, _ARRAYS_SUBDIR),
        _state_dicts(params, batch_stats, opt_state),
    )
    ckptr.wait_until_finished()

    if jax.process_index() == 0:
        payload = {
            "meta": dict(meta),
            "epoch": epoch,
            "loss": -1.0 if last_loss is None else float(last_loss),
            "best-valid-loss": np.nan if best_valid_loss is None else float(best_valid_loss),
            "lrs-num-restarts": num_restarts,
            "scheduler-state-dict": sched_state or {},
            "train-idx": [] if train_idx is None else [int(i) for i in train_idx],
            "valid-idx": [] if valid_idx is None else [int(i) for i in valid_idx],
        }
        tmp = os.path.join(slot_dir, _META_FILE + ".tmp")
        with open(tmp, "wb") as f:
            f.write(serialization.msgpack_serialize(payload))
        os.replace(tmp, os.path.join(slot_dir, _META_FILE))
    _sync("slot-complete")

    if jax.process_index() == 0:
        # commit: atomic pointer flip, then garbage-collect the old slot and
        # any pre-slot-scheme legacy layout
        tmp = os.path.join(path, _CURRENT_FILE + ".tmp")
        with open(tmp, "w") as f:
            f.write(slot)
        os.replace(tmp, os.path.join(path, _CURRENT_FILE))
        if cur is not None:
            old = os.path.join(path, cur)
            if os.path.exists(old):
                shutil.rmtree(old)
        for legacy in (_ARRAYS_SUBDIR, _META_FILE):
            p = os.path.join(path, legacy)
            if os.path.isdir(p):
                shutil.rmtree(p)
            elif os.path.exists(p):
                os.remove(p)
    _sync("committed")


def _abstract_tree(template_state_dict, shardings):
    """ShapeDtypeStruct tree (with target shardings) for orbax restore.

    ``shardings`` is None (→ replicate on the default device), a single
    jax.sharding.Sharding for every array leaf, or a pytree whose flattened
    paths match ``template_state_dict`` (extra sharding entries are ignored;
    a template leaf missing from the sharding tree is an error).
    """
    from jax.sharding import Sharding, SingleDeviceSharding

    default = SingleDeviceSharding(jax.devices()[0])
    if shardings is None:
        lookup = lambda _path: default
    elif isinstance(shardings, Sharding):
        lookup = lambda _path: shardings
    else:
        flat = {
            _path_key(p): s
            for p, s in jax.tree_util.tree_flatten_with_path(shardings)[0]
        }
        lookup = flat.__getitem__

    leaves, treedef = jax.tree_util.tree_flatten_with_path(template_state_dict)
    out = []
    for path, leaf in leaves:
        if _is_array_leaf(leaf):
            out.append(
                jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=lookup(_path_key(path)))
            )
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def load_sharded_checkpoint(
    path: str,
    params_template,
    batch_stats_template=None,
    opt_state_template=None,
    shardings=None,
) -> dict:
    """Restore a sharded checkpoint into plain state-dict trees of
    jax.Arrays placed per ``shardings``.

    Args:
      path: checkpoint directory written by ``save_sharded_checkpoint``.
      params_template / batch_stats_template / opt_state_template: typed
        trees (e.g. from a fresh ``make_train_state``) giving structure and
        dtypes; pass None for parts that were not saved / are not wanted.
      shardings: target placement — None (single default device), one
        Sharding for every leaf, or a dict
        ``{"params": tree, "batch_stats": tree, "opt_state": tree}`` of
        typed sharding trees (e.g. from parallel.sharding's TP rule).

    Returns the same payload layout as ``checkpoint.load_checkpoint``;
    rebuild typed pytrees from it with ``restore_typed``.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    # slot layout: follow the committed CURRENT pointer; fall back to the
    # pre-slot legacy layout (arrays/ + meta.msgpack directly under path)
    cur = _read_current(path)
    root = path if cur is None else os.path.join(path, cur)
    meta_path = os.path.join(root, _META_FILE)
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            "incomplete sharded checkpoint (no {}): {}".format(_META_FILE, root)
        )
    with open(meta_path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())

    templates = _state_dicts(params_template, batch_stats_template, opt_state_template)
    if isinstance(shardings, dict):
        shardings = _state_dicts(
            shardings["params"],
            shardings.get("batch_stats"),
            shardings.get("opt_state"),
        )

    abstract = _abstract_tree(templates, shardings)
    # PyTreeRestore with partial_restore: the caller may request a SUBSET of
    # the saved parts (e.g. params only, for inference, from a checkpoint
    # that also stored opt_state) — StandardCheckpointer.restore rejects
    # that with a structure-mismatch error. construct_restore_args carries
    # the target shardings from the ShapeDtypeStructs (PyTreeRestore ignores
    # shardings passed via the abstract tree alone).
    ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    restored = ckptr.restore(
        os.path.join(root, _ARRAYS_SUBDIR),
        args=ocp.args.PyTreeRestore(
            item=abstract,
            restore_args=ocp.checkpoint_utils.construct_restore_args(abstract),
            partial_restore=True,
        ),
    )

    payload["model-state-dict"] = {
        "params": restored["params"],
        "batch_stats": restored.get("batch_stats", {}),
    }
    payload["optimizer-state-dict"] = restored.get("opt_state", {})
    return payload


def restore_typed(template, state_dict_tree):
    """``serialization.from_state_dict`` alias: rebuild a typed pytree (optax
    state, FrozenDict params) from the restored plain-dict tree."""
    return serialization.from_state_dict(template, state_dict_tree)
