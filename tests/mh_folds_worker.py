"""Worker process for the multi-process fit_multifold test (VERDICT r3
item 3): two OS processes train FOUR leave-one-specimen-out folds in
lockstep over one global 4-device 'ensemble' mesh (2 virtual CPU devices
per process — each device owns one fold, each PROCESS owns two). The
per-step loss all-gather, replicated-eval drains, lockstep fold-gathering
checkpoint saves, and the per-epoch stop agreement all execute for real.

Usage: python mh_folds_worker.py <process_id> <num_processes> <port>
                                 <workdir> <h5> <stream:0|1>
Prints machine-readable lines the parent asserts on:
  FOLDS_EPOCH <pid> <final epoch>
  FOLDS_BVL <pid> <best valid loss fold 0> ... <fold 3>
"""
import os
import sys

pid, nproc, port, workdir, h5path, stream = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5],
    int(sys.argv[6]),
)

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
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
from deepfluoro_tpu.train import TrainConfig
from deepfluoro_tpu.train.multifold import fit_multifold

cfg = TrainConfig(
    num_classes=7, batch_size=4, proj_unet_dim=36, depth=2, init_feats_exp=3,
    batch_norm=True, padding=True, no_max_pool=True, num_lands=14,
    optim_type="sgd", init_lr=0.05, momentum=0.9, nesterov=True, wgt_decay=1e-4,
    lr_sched_meth="plateau", max_num_epochs=2, heat_coeff=0.5,
    train_valid_split=0.75, data_aug=False, checkpoint_freq=1, seed=0,
)

mesh = make_mesh({"ensemble": 2 * nproc})
out = fit_multifold(
    h5path, [1, 2, 3, 4], cfg,
    checkpoint_prefix=os.path.join(workdir, "mf_mh_ck"),
    best_prefix=os.path.join(workdir, "mf_mh_best"),
    train_loss_txt_prefix=os.path.join(workdir, "mf_mh_tl"),
    valid_loss_txt_prefix=os.path.join(workdir, "mf_mh_vl"),
    mesh=mesh,
    stream_data=bool(stream),
    verbose=False,
)

bvl = np.asarray(out["best_valid_losses"])
print("FOLDS_EPOCH {} {}".format(pid, out["epoch"]), flush=True)
print(
    "FOLDS_BVL {} {}".format(pid, " ".join("{:.8f}".format(v) for v in bvl)),
    flush=True,
)
