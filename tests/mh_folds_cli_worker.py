"""Worker for the CLI-level multi-process train_folds test: the documented
pod entry point (cli.train_folds --coordinator/--num-processes/--process-id
with NO --ensemble-devices) must join the pod BEFORE backend pinning,
default the 'ensemble' mesh to every pod device, and run the lockstep fold
program end-to-end.

Usage: python mh_folds_cli_worker.py <process_id> <num_processes> <port>
                                     <workdir> <h5>
"""
import os
import sys

pid, nproc, port, workdir, h5path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5],
)

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()

# the CLI joins the pod, then pins the backend itself (select_platform)
from deepfluoro_tpu.cli.train_folds import main

main([
    h5path, "--pats", "1,2,3,4", "--num-classes", "7", "--batch-size", "4",
    "--unet-img-dim", "36", "--unet-num-lvls", "2", "--unet-init-feats-exp", "3",
    "--unet-batch-norm", "--unet-padding", "--unet-no-max-pool", "--use-lands",
    "--train-valid-split", "0.75", "--epochs", "2", "--lr-sched", "plateau",
    "--init-lr", "0.05", "--momentum", "0.9", "--nesterov", "--wgt-decay", "1e-4",
    "--net-prefix", os.path.join(workdir, "cli_mf_best"),
    "--checkpoint-prefix", os.path.join(workdir, "cli_mf_ck"),
    "--valid-loss-prefix", os.path.join(workdir, "cli_mf_vl"),
    "--no-gpu",
    "--coordinator", "127.0.0.1:{}".format(port),
    "--num-processes", str(nproc), "--process-id", str(pid),
])
print("CLI_FOLDS_DONE {}".format(pid), flush=True)
