"""Worker process for the fit()-level multi-host test (VERDICT r2 item 1
'done' criterion (b)): two OS processes run the FLAGSHIP training loop
(train.loop.fit) end-to-end over one global 'data' mesh — per-process
contiguous batch slices assembled with global_batch_from_local, replicated
state, single-writer checkpoints/logs — and must reproduce the single-host
run exactly.

Usage: python mh_fit_worker.py <process_id> <num_processes> <port> <workdir>
                               <h5> [stream:0|1]
With stream=1 the run exercises per-host disjoint loading (the lazy
archive reader): the worker additionally verifies NO training union was
materialized and reports how many archive rows this host actually read.
Prints machine-readable lines the parent asserts on:
  FIT_EPOCH <pid> <final epoch>
  FIT_BVL <pid> <best valid loss>
  FIT_SUM <pid> <sum of |params|>
  FIT_ROWS <pid> <valid rows read> <train rows read>   (stream mode only)
"""
import os
import sys

pid, nproc, port, workdir, h5path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5],
)
stream = len(sys.argv) > 6 and sys.argv[6] == "1"

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    # 2 devices per process: the 4-way global 'data' axis divides the
    # batch_size-4 batches evenly (multi-host batch assembly is strictly
    # even over the data axis — see train/loop.py multihost feed mode)
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:{}".format(port),
    num_processes=nproc,
    process_id=pid,
)
assert jax.process_count() == nproc

import numpy as np

from deepfluoro_tpu.parallel import make_mesh
from deepfluoro_tpu.train import TrainConfig, fit

cfg = TrainConfig(
    num_classes=7, batch_size=4, proj_unet_dim=36, depth=2, init_feats_exp=3,
    batch_norm=True, padding=True, no_max_pool=True, num_lands=14,
    optim_type="sgd", init_lr=0.05, momentum=0.9, nesterov=True, wgt_decay=1e-4,
    lr_sched_meth="plateau", max_num_epochs=2, heat_coeff=0.5,
    train_valid_split=0.75, data_aug=False, checkpoint_freq=1, seed=0,
)

rows = {"valid": 0, "train": 0, "calls": 0}
prefix = "fit_mh"
if stream:
    # instrument the lazy reader (first take = the validation subset, the
    # rest are per-batch training reads from the producer thread) and trap
    # any attempt to materialize the full training union
    import deepfluoro_tpu.train.loop as loop_mod
    from deepfluoro_tpu.data import hdf5

    prefix = "fit_mhs"
    orig_take = hdf5.LazyFluoroReader.take

    def counting_take(self, idx):
        import numpy as _np

        n = int(_np.asarray(idx).size)
        rows["calls"] += 1
        rows["valid" if rows["calls"] == 1 else "train"] += n
        return orig_take(self, idx)

    hdf5.LazyFluoroReader.take = counting_take

    def no_union(*a, **k):
        raise AssertionError(
            "stream-mode multi-host fit() must not load the union dataset"
        )

    loop_mod.load_dataset = no_union

mesh = make_mesh({"data": 2 * nproc})
out = fit(
    h5path, [1, 2], cfg,
    checkpoint_filename=os.path.join(workdir, prefix + "_ck.pt"),
    best_valid_filename=os.path.join(workdir, prefix + "_best.pt"),
    train_loss_txt=os.path.join(workdir, prefix + "_tl.txt"),
    valid_loss_txt=os.path.join(workdir, prefix + "_vl.txt"),
    verbose=False,
    mesh=mesh,
    stream_data=stream,
)

# local (collective-free) reads of the fully-replicated final state
psum = float(sum(np.abs(np.asarray(x)).sum() for x in jax.tree.leaves(out["state"].params)))
print("FIT_EPOCH {} {}".format(pid, out["epoch"]), flush=True)
print("FIT_BVL {} {:.8f}".format(pid, out["best_valid_loss"]), flush=True)
print("FIT_SUM {} {:.8f}".format(pid, psum), flush=True)
if stream:
    print("FIT_ROWS {} {} {}".format(pid, rows["valid"], rows["train"]), flush=True)
