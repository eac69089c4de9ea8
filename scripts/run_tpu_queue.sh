#!/usr/bin/env bash
# Restart-resilient runner for the round-5 TPU measurement queue.
#
# Waits until the 1x quality harness (scripts/run_1x_persistent.sh) no
# longer holds the TPU, then runs the queued items SEQUENTIALLY (one chip,
# 1-CPU box — nothing may overlap). Each stage is idempotent: a committed
# marker in zz_queue/ skips it on re-run, so a VM restart mid-queue just
# needs this script relaunched (after `pip install -e . --no-build-isolation`).
#
# NEVER edit this file while it is running (bash re-reads by byte offset);
# the body is brace-wrapped to force a full parse up front.
{
set -uo pipefail
cd /root/repo
mkdir -p zz_queue

# --- wait for the 1x harness to finish and release the TPU --------------
# Gate on the wrapper's one-shot exit sentinel in the log (written on every
# exit path), plus a liveness check that no cli.train still holds the chip.
# (pgrep is used only to OBSERVE — never kill by pattern on this box.)
while :; do
  if grep -q "\[persist\] harness exited rc=" zz_1x_r5.log 2>/dev/null && \
     ! pgrep -f 'deepfluoro_tpu.cli.train' >/dev/null 2>&1; then
    break
  fi
  sleep 120
done
echo "[queue] TPU free at $(date -u) — starting queue" >> zz_queue/queue.log

stage() {  # stage <name> <logfile> <timeout-s> <cmd...>
  local NAME="$1" LOG="$2" TMO="$3"; shift 3
  if [ -f "zz_queue/$NAME.done" ]; then
    echo "[queue] $NAME already done, skipping" >> zz_queue/queue.log
    return 0
  fi
  echo "[queue] $NAME starting at $(date -u)" >> zz_queue/queue.log
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  local RC=$?
  echo "rc=$RC" > "zz_queue/$NAME.done"
  echo "[queue] $NAME finished rc=$RC at $(date -u)" >> zz_queue/queue.log
  ( flock 9
    git add -f "$LOG" "zz_queue/$NAME.done" zz_queue/queue.log >/dev/null 2>&1
    git commit -q -m "TPU queue: $NAME (rc=$RC)" \
      -- "$LOG" "zz_queue/$NAME.done" zz_queue/queue.log >/dev/null 2>&1 || true
  ) 9>/tmp/git.lock
}

# 1) int8 HLO structure profile: is the requantize fold already fused?
stage int8_hlo_2x  zz_int8_hlo_r5.log 3600 \
  python scripts/profile_int8_hlo.py --rung 2
stage int8_hlo_8x  zz_int8_hlo_r5.log 3600 \
  python scripts/profile_int8_hlo.py --rung 8
stage int8_hlo_2xh zz_int8_hlo_r5.log 3600 \
  python scripts/profile_int8_hlo.py --rung 2 --float-levels 2

# 2) hybrid int8 ladder (big rungs) + 8x deployment batches
stage int8_ladder zz_ladder_int8_r5.log 7200 \
  python scripts/bench_fullres_ladder.py --rungs 8,4,2 --int8 --float-levels 1,2
stage int8_b64  zz_int8_b64_r5.log  3600 python scripts/bench_int8.py --batch 64
stage int8_b512 zz_int8_b512_r5.log 3600 python scripts/bench_int8.py --batch 512

# 3) train-step MFU decomposition (VERDICT r4 #7)
stage train_mfu zz_train_mfu_r5.log 5400 python scripts/bench_train_mfu.py

# 4) largest fused fold-count at 2x (VERDICT r4 #8)
stage multifold_2x zz_multifold_2x_r5.log 5400 \
  python scripts/bench_multifold_2x.py

# 5) 4x end-to-end training rung (VERDICT r4 #4)
stage e2e_4x zz_4x_r5.log 7200 bash scripts/e2e_ladder.sh zz_4x_r5 4

# 6) driver metric re-measure at HEAD
stage bench zz_bench_r5.log 3600 python bench.py

echo "[queue] ALL TPU STAGES DONE at $(date -u)" >> zz_queue/queue.log
( flock 9
  git add -f zz_queue/queue.log >/dev/null 2>&1
  git commit -q -m "TPU queue: all TPU stages complete" -- zz_queue/queue.log \
    >/dev/null 2>&1 || true
) 9>/tmp/git.lock
}
