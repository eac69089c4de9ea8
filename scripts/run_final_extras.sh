#!/usr/bin/env bash
# Restart-resilient runner for the LAST round-5 measurement extras, after
# the main queue AND post-queue stages are done (the final suite is
# CPU-heavy and must never overlap these tunnel TPU jobs):
#   1) 16x ladder rung (float + int8 + hybrid) — completes the 5-rung
#      fused-inference ladder (reference README.md:62-68 documents 16x as
#      its CPU-smoke config; the rung was added in round 5 but never timed)
#   2) 1x int8 rung — the only ladder rung the int8 path has never been
#      timed at (queue stage int8_ladder covers 8,4,2)
#
# Same idempotent stage discipline as run_tpu_queue.sh; relaunch after a
# VM restart (after `pip install -e . --no-build-isolation`).
#
# NEVER edit this file while it is running (bash re-reads by byte
# offset); the body is brace-wrapped to force a full parse up front.
{
set -uo pipefail
cd /root/repo
mkdir -p zz_queue

while :; do
  if grep -q "ALL POST-QUEUE STAGES DONE" zz_queue/queue.log 2>/dev/null; then
    break
  fi
  sleep 180
done
echo "[extras] starting at $(date -u)" >> zz_queue/queue.log

stage() {  # stage <name> <logfile> <timeout-s> <cmd...>
  local NAME="$1" LOG="$2" TMO="$3"; shift 3
  if [ -f "zz_queue/$NAME.done" ]; then
    echo "[extras] $NAME already done, skipping" >> zz_queue/queue.log
    return 0
  fi
  echo "[extras] $NAME starting at $(date -u)" >> zz_queue/queue.log
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  local RC=$?
  echo "rc=$RC" > "zz_queue/$NAME.done"
  echo "[extras] $NAME finished rc=$RC at $(date -u)" >> zz_queue/queue.log
  ( flock 9
    git add -f "$LOG" "zz_queue/$NAME.done" zz_queue/queue.log >/dev/null 2>&1
    git commit -q -m "TPU extras: $NAME (rc=$RC)" >/dev/null 2>&1 || true
  ) 9>/tmp/git.lock
}

stage ladder_16x zz_ladder_16x_r5.log 3600 \
  python scripts/bench_fullres_ladder.py --rungs 16 --int8 --float-levels 1
stage ladder_1x_int8 zz_ladder_1x_int8_r5.log 5400 \
  python scripts/bench_fullres_ladder.py --rungs 1 --int8

echo "[extras] ALL EXTRA STAGES DONE at $(date -u)" >> zz_queue/queue.log
( flock 9
  git add -f zz_queue/queue.log >/dev/null 2>&1
  git commit -q -m "TPU extras: all stages complete" -- zz_queue/queue.log \
    >/dev/null 2>&1 || true
) 9>/tmp/git.lock
}
