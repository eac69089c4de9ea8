"""Worker process for the CLI-level multi-host test: two OS processes run
the DOCUMENTED pod entry point — ``python -m deepfluoro_tpu.cli.train ...
--coordinator host:port --num-processes 2 --process-id $RANK`` with NO
explicit --dp-devices — so the CLI's default-to-all-devices mesh branch,
the spans-every-process assertion, and the multi-host fit() feed mode are
all exercised exactly as a user would hit them.

Usage: python mh_cli_worker.py <process_id> <num_processes> <port> <workdir> <h5>
Prints: CLI_FIT_DONE <pid>
"""
import os
import sys

pid, nproc, port, workdir, h5path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5],
)

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    # 2 devices per process -> a 4-way global 'data' axis; batch_size 4
    # divides evenly (the multi-host feed mode requires it)
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()

from deepfluoro_tpu.cli.train import main

main([
    h5path, "--train-pats", "1,2", "--num-classes", "7",
    "--batch-size", "4", "--unet-img-dim", "36", "--unet-num-lvls", "2",
    "--unet-init-feats-exp", "3", "--unet-batch-norm", "--unet-padding",
    "--unet-no-max-pool", "--use-lands", "--train-valid-split", "0.75",
    "--max-num-epochs", "2", "--lr-sched", "plateau", "--init-lr", "0.05",
    "--momentum", "0.9", "--nesterov", "--wgt-decay", "1e-4",
    "--no-gpu",
    # multi-host flags as documented; NO --dp-devices: the CLI must default
    # the data axis to every device in the pod
    "--coordinator", "127.0.0.1:{}".format(port),
    "--num-processes", str(nproc), "--process-id", str(pid),
    "--checkpoint-net", os.path.join(workdir, "cli_mh_ck.pt"),
    "--best-net", os.path.join(workdir, "cli_mh_best.pt"),
    "--train-loss-txt", os.path.join(workdir, "cli_mh_tl.txt"),
    "--valid-loss-txt", os.path.join(workdir, "cli_mh_vl.txt"),
])

print("CLI_FIT_DONE {}".format(pid), flush=True)
