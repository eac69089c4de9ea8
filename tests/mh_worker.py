"""Worker process for the REAL multi-process (jax.distributed) test.

Launched by tests/test_multiprocess.py — one OS process per simulated host,
4 virtual CPU devices each. Exercises the actual pod-scale code paths the
in-process tests cannot: jax.distributed.initialize, cross-process global
mesh + collectives, per-process disjoint index shards, global-batch
assembly from process-local data, and single-writer checkpointing
(SURVEY.md §2.3 multi-host row).

Usage: python mh_worker.py <process_id> <num_processes> <port> <workdir>
Prints machine-readable lines the parent asserts on:
  SHARD <pid> <sorted indices>
  LOSS <loss after one global DP step>
  WROTE <pid> <0|1>
"""
import os
import sys

pid, nproc, port, workdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:{}".format(port),
    num_processes=nproc,
    process_id=pid,
)
assert jax.process_count() == nproc
assert len(jax.devices()) == 4 * nproc, jax.devices()
assert len(jax.local_devices()) == 4

import jax.numpy as jnp
import numpy as np

from deepfluoro_tpu.parallel import make_mesh, make_sharded_train_step
from deepfluoro_tpu.parallel.multihost import global_batch_from_local, local_shard_indices
from deepfluoro_tpu.train import TrainConfig, make_train_state
from deepfluoro_tpu.train.step import make_optimizer
from deepfluoro_tpu.train.checkpoint import save_checkpoint

cfg = TrainConfig(
    num_classes=7, batch_size=8, proj_unet_dim=32, depth=2, init_feats_exp=2,
    batch_norm=True, padding=True, no_max_pool=True, num_lands=4,
    optim_type="sgd", init_lr=0.1, momentum=0.9, nesterov=True, wgt_decay=1e-4,
)

# deterministic synthetic dataset, identical on every process (and in the
# parent, which recomputes the expected loss single-process)
rng = np.random.default_rng(7)
N = 19  # deliberately NOT divisible by nproc: exercises drop-tail sharding
projs = rng.random((N, 32, 32, 1)).astype(np.float32)
segs = np.eye(7, dtype=np.float32)[rng.integers(0, 7, (N, 32, 32))]
heats = rng.random((N, 32, 32, 4)).astype(np.float32)

model, state = make_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
tx = make_optimizer(cfg)
mesh = make_mesh({"data": 4 * nproc})
step, place = make_sharded_train_step(cfg, model, tx, mesh)
state = place(state)

my_idx = local_shard_indices(N, seed=3, epoch=0)
print("SHARD", pid, sorted(int(i) for i in my_idx), flush=True)
assert cfg.batch_size % nproc == 0, (cfg.batch_size, nproc)
B_local = cfg.batch_size // nproc
sel = my_idx[:B_local]
gp = global_batch_from_local(mesh, projs[sel])
gs = global_batch_from_local(mesh, segs[sel])
gh = global_batch_from_local(mesh, heats[sel])

state, loss = step(state, gp, gs, gh, 0.1)
print("LOSS {:.8f}".format(float(loss)), flush=True)

# single-writer: each process is handed its OWN path; the internal
# process_index gate means only process 0's file may appear on disk
ck = os.path.join(workdir, "mh_ck_p{}.pt".format(pid))
save_checkpoint(ck, meta=cfg.to_checkpoint_meta(), params=state.params, epoch=1)
print("WROTE", pid, int(os.path.exists(ck)), flush=True)

# --- sharded-checkpoint phase: params channel-sharded ACROSS processes ---
# (each process holds only its local shards; exactly the case the orbax
# format exists for — train/sharded_checkpoint.py)
from jax.sharding import NamedSharding, PartitionSpec as P
from deepfluoro_tpu.parallel import tp_state_shardings
from deepfluoro_tpu.train.sharded_checkpoint import (
    load_sharded_checkpoint,
    restore_typed,
    save_sharded_checkpoint,
)

tp_mesh = make_mesh({"model": 4 * nproc})
sh = tp_state_shardings(tp_mesh, state, axis="model")
placed = jax.tree.map(jax.device_put, state, sh)
first_leaf = jax.tree.leaves(placed.params)[0]
assert not first_leaf.is_fully_addressable, "expected cross-process shards"
# genuinely SHARDED, not merely replicated-across-processes (any array on
# a cross-process mesh is not fully addressable): at least one leaf's local
# shard must be a strict piece of its global value (small/indivisible
# leaves like biases legitimately replicate under the channel rule)
assert any(
    leaf.addressable_shards[0].data.shape != leaf.shape
    for leaf in jax.tree.leaves(placed.params)
), "no param leaf is actually channel-sharded across the mesh"

sck = os.path.join(workdir, "mh_sharded_ck")
save_sharded_checkpoint(
    sck, meta=cfg.to_checkpoint_meta(),
    params=placed.params, batch_stats=placed.batch_stats, epoch=2,
)

# restore replicated over the global mesh and checksum a couple of trees
out = load_sharded_checkpoint(
    sck, state.params, state.batch_stats,
    shardings=NamedSharding(tp_mesh, P()),
)
params_r = restore_typed(state.params, out["model-state-dict"]["params"])
orig_sum = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(state.params)))
rest_sum = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(params_r)))
print("SHARDED_SUM {:.6f} {:.6f} {}".format(orig_sum, rest_sum, out["epoch"]), flush=True)
