#!/usr/bin/env bash
# End-to-end TRAINING at ANY rung of the reference's downsample ladder
# (README.md:62-68: 16x/8x/4x/2x/full-res archives; 16x is the documented
# CPU-smoke config, README.md:68). One factor-parametrized harness
# (VERDICT r4 #4) subsuming the former e2e_2x.sh / e2e_fullres.sh:
#   synthetic archive at the rung's frame geometry (1436//f after the 50px
#   crop of 1536^2, hdf5_layouts/Readme.md:42-45) -> cli.train epochs
#   (+ checkpoint RESUME leg) -> held-out test_ensemble -> est_lands_csv ->
#   compute_actual_dice, scoring pinned to CPU.
#
# Usage: scripts/e2e_ladder.sh <workdir> <factor: 16|8|4|2|1>
#                              [epochs] [projs-per-specimen] [batch]
# Env:   E2E_CPU=1  pins training to CPU too (the reference's 16x smoke
#        runs CPU-only; useful when no TPU tunnel is up).
{
set -euo pipefail

WORKDIR="${1:?usage: e2e_ladder.sh <workdir> <factor> [epochs] [projs] [batch]}"
FACTOR="${2:?factor required: 16|8|4|2|1}"

# Per-rung geometry + defaults. Frame dim = 1436//factor; pad dim = the
# training dims used across BASELINE.md (192 = paper 8x config; 96/368/
# 736/1440 by the same pad rule). Batch sizes sized under the HBM
# envelope measured in round 4 (1x: batch 4 OOMs 16 GB even w/ remat).
case "$FACTOR" in
  16) IMG_DIM=89;   PAD_DIM=96;   DEF_BATCH=5; DEF_EPOCHS=4; DEF_PROJS=16; BIG=0 ;;
  8)  IMG_DIM=179;  PAD_DIM=192;  DEF_BATCH=5; DEF_EPOCHS=4; DEF_PROJS=16; BIG=0 ;;
  4)  IMG_DIM=359;  PAD_DIM=384;  DEF_BATCH=5; DEF_EPOCHS=4; DEF_PROJS=16; BIG=1 ;;  # 384=12*32: training needs the 5 strided halvings even (the 368 inference rung tolerates odd levels via bridge crops)
  2)  IMG_DIM=718;  PAD_DIM=736;  DEF_BATCH=5; DEF_EPOCHS=4; DEF_PROJS=16; BIG=1 ;;
  1)  IMG_DIM=1436; PAD_DIM=1440; DEF_BATCH=2; DEF_EPOCHS=3; DEF_PROJS=8;  BIG=1 ;;
  *) echo "unknown factor '$FACTOR' (want 16|8|4|2|1)" >&2; exit 2 ;;
esac
EPOCHS="${3:-$DEF_EPOCHS}"
PROJS="${4:-$DEF_PROJS}"
BATCH="${5:-$DEF_BATCH}"

# big-frame rungs stream the archive from host RAM and remat activations
# (BASELINE.md --remat rows: doubles the largest batch that fits at 2x);
# small rungs train device-resident like the paper runs
EXTRA=()
if [ "$BIG" = 1 ]; then EXTRA+=(--stream-data --remat); fi
if [ "${E2E_CPU:-0}" = 1 ]; then EXTRA+=(--no-gpu); fi

TAG="${FACTOR}x"
mkdir -p "$WORKDIR"
cd "$WORKDIR"
DATASET="ds${TAG}.h5"

if [ ! -f "$DATASET" ]; then
  echo "=== building synthetic ${TAG} archive (3 specimens x $PROJS projs, ${IMG_DIM}^2) ==="
  python - "$DATASET" "$PROJS" "$IMG_DIM" <<'EOF'
import sys

from deepfluoro_tpu.data.fixtures import write_synthetic_dataset

write_synthetic_dataset(
    sys.argv[1], num_specimens=3, num_projs=int(sys.argv[2]),
    img_dim=int(sys.argv[3]),
)
print("wrote", sys.argv[1])
EOF
fi

TRAIN_ARGS=(
  --train-pats 1,2 --num-classes 7 --batch-size "$BATCH"
  --unet-img-dim "$PAD_DIM" --unet-num-lvls 6 --unet-init-feats-exp 5
  --unet-batch-norm --unet-padding --unet-no-max-pool --data-aug --use-lands
  --heat-coeff 0.5 --train-valid-split 0.85 --optim sgd --lr-sched plateau
  --init-lr 0.1 --momentum 0.9 --nesterov --wgt-decay 1e-4
  --checkpoint-net "zz${TAG}_ck.pt" --best-net "zz${TAG}_best.pt"
  --train-loss-txt "zz${TAG}_tl.txt" --valid-loss-txt "zz${TAG}_vl.txt"
  --bf16 --seed 42 --light-best-nets
)

echo "=== ${TAG} training run (batch $BATCH @ ${PAD_DIM}^2${EXTRA[0]:+; ${EXTRA[*]}}) ==="
time python -m deepfluoro_tpu.cli.train "$DATASET" \
  "${TRAIN_ARGS[@]}" ${EXTRA[@]+"${EXTRA[@]}"} --max-num-epochs "$EPOCHS"

echo "=== resume for one more epoch (checkpoint round trip at ${TAG}) ==="
time python -m deepfluoro_tpu.cli.train "$DATASET" \
  "${TRAIN_ARGS[@]}" ${EXTRA[@]+"${EXTRA[@]}"} --max-num-epochs $((EPOCHS + 1))

echo "=== held-out inference + scoring at ${TAG} (specimen 3) ==="
INFER_EXTRA=()
if [ "${E2E_CPU:-0}" = 1 ]; then INFER_EXTRA+=(--no-gpu); fi
time python -m deepfluoro_tpu.cli.test_ensemble "$DATASET" "out${TAG}_03.h5" \
  --pats 3 --nets "zz${TAG}_best.pt" --times "times${TAG}_03.txt" \
  --batch-size "$BATCH" ${INFER_EXTRA[@]+"${INFER_EXTRA[@]}"}
JAX_PLATFORMS=cpu python -m deepfluoro_tpu.cli.est_lands_csv "out${TAG}_03.h5" nn-heats \
  --use-seg nn-segs --pat 3 --out "lands${TAG}_03.csv"
JAX_PLATFORMS=cpu python -m deepfluoro_tpu.cli.compute_actual_dice_on_test "$DATASET" \
  "out${TAG}_03.h5" nn-segs "dice${TAG}_03.csv" 3

python - "$TAG" <<'EOF'
import csv
import sys

import h5py
import numpy as np

tag = sys.argv[1]
dice = [float(r["dice"]) for r in csv.DictReader(open("dice{}_03.csv".format(tag)))]
tm = [float(x) for x in open("times{}_03.txt".format(tag))]
tl = [float(x) for x in open("zz{}_tl.txt".format(tag))]
vl = [float(x) for x in open("zz{}_vl.txt".format(tag))]
# landmark detection + error vs GT, counting only in-view landmarks by the
# LOADER's bound (0 <= x <= dim-1, data/hdf5.py::mark_oob_landmarks_inf) —
# same convention as synthetic_e2e.sh's scorer
det, total, errs = 0, 0, []
with h5py.File("ds{}.h5".format(tag)) as ds:
    gt = np.asarray(ds["03/lands"])  # (N, 2, L) col-then-row
    R, C = ds["03/projs"].shape[1:3]
for row in csv.DictReader(open("lands{}_03.csv".format(tag))):
    p, l = int(row["proj"]), int(row["land"])
    gx, gy = float(gt[p, 0, l]), float(gt[p, 1, l])
    if not (np.isfinite(gx) and np.isfinite(gy)
            and 0 <= gx <= C - 1 and 0 <= gy <= R - 1):
        continue
    total += 1
    r, c = float(row["row"]), float(row["col"])
    if r < 0:
        continue
    det += 1
    errs.append(float(np.hypot(r - gy, c - gx)))
print("train iters: {} | first loss {:.4f} -> last {:.4f}".format(
    len(tl), tl[0], tl[-1]))
print("valid epochs: {} | last {:.4f}".format(len(vl), vl[-1]))
print("held-out mean hard Dice: {:.4f} | detected {}/{} lands ({:.1f}%) | "
      "err median {:.2f} px | {:.2f} ms/img inference".format(
          np.mean(dice), det, total, 100.0 * det / max(1, total),
          float(np.median(errs)) if errs else float("nan"), 1e3 * np.mean(tm)))
print("=== E2E {} COMPLETE ===".format(tag.upper()))
EOF
}
