#!/usr/bin/env bash
# End-to-end TRAINING at the 2x geometry (VERDICT r3 item 5): the first
# complete exercise of the big-frame loop — fit() epochs at 736^2 with
# --stream-data (host-resident archive) + --remat (activation headroom) +
# --bf16, periodic checkpoint + validation, then held-out inference
# (test_ensemble), landmark decode and hard Dice at full 2x resolution.
# Reference capability: training is documented for any downsample level
# (README.md:62-68); the 2x archive frames are 718^2, padded to 736.
#
# Usage: scripts/e2e_2x.sh <workdir> [epochs] [projs-per-specimen]
{
set -euo pipefail

WORKDIR="${1:?usage: e2e_2x.sh <workdir> [epochs] [projs-per-specimen]}"
EPOCHS="${2:-4}"
PROJS="${3:-16}"
mkdir -p "$WORKDIR"
cd "$WORKDIR"
DATASET=ds2x.h5

if [ ! -f "$DATASET" ]; then
  echo "=== building synthetic 2x archive (3 specimens x $PROJS projs, 718^2) ==="
  python - "$PROJS" <<'EOF'
import sys

from deepfluoro_tpu.data.fixtures import write_synthetic_dataset

# 718^2 frames; 16 projs (~130 MB float32) exercises the streaming/remat
# path in minutes, 60+ gives the heat head enough data for a QUALITY run
write_synthetic_dataset("ds2x.h5", num_specimens=3, num_projs=int(sys.argv[1]), img_dim=718)
print("wrote ds2x.h5")
EOF
fi

echo "=== 2x training run (stream + remat + bf16) ==="
time python -m deepfluoro_tpu.cli.train "$DATASET" \
  --train-pats 1,2 --num-classes 7 --batch-size 5 --unet-img-dim 736 \
  --unet-num-lvls 6 --unet-init-feats-exp 5 --unet-batch-norm \
  --unet-padding --unet-no-max-pool --data-aug --use-lands \
  --heat-coeff 0.5 --train-valid-split 0.85 --optim sgd --lr-sched plateau \
  --init-lr 0.1 --momentum 0.9 --nesterov --wgt-decay 1e-4 \
  --max-num-epochs "$EPOCHS" --checkpoint-net zz2x_ck.pt \
  --best-net zz2x_best.pt --train-loss-txt zz2x_tl.txt \
  --valid-loss-txt zz2x_vl.txt --stream-data --remat --bf16 --seed 42 \
  --light-best-nets

echo "=== resume for one more epoch (checkpoint round trip at 2x) ==="
time python -m deepfluoro_tpu.cli.train "$DATASET" \
  --train-pats 1,2 --num-classes 7 --batch-size 5 --unet-img-dim 736 \
  --unet-num-lvls 6 --unet-init-feats-exp 5 --unet-batch-norm \
  --unet-padding --unet-no-max-pool --data-aug --use-lands \
  --heat-coeff 0.5 --train-valid-split 0.85 --optim sgd --lr-sched plateau \
  --init-lr 0.1 --momentum 0.9 --nesterov --wgt-decay 1e-4 \
  --max-num-epochs $((EPOCHS + 1)) --checkpoint-net zz2x_ck.pt \
  --best-net zz2x_best.pt --train-loss-txt zz2x_tl.txt \
  --valid-loss-txt zz2x_vl.txt --stream-data --remat --bf16 --seed 42 \
  --light-best-nets

echo "=== held-out inference + scoring at 2x (specimen 3) ==="
time python -m deepfluoro_tpu.cli.test_ensemble "$DATASET" out2x_03.h5 \
  --pats 3 --nets zz2x_best.pt --times times2x_03.txt --batch-size 4
JAX_PLATFORMS=cpu python -m deepfluoro_tpu.cli.est_lands_csv out2x_03.h5 nn-heats \
  --use-seg nn-segs --pat 3 --out lands2x_03.csv
JAX_PLATFORMS=cpu python -m deepfluoro_tpu.cli.compute_actual_dice_on_test "$DATASET" out2x_03.h5 \
  nn-segs dice2x_03.csv 3

python - <<'EOF'
import csv
import numpy as np

dice = [float(r["dice"]) for r in csv.DictReader(open("dice2x_03.csv"))]
tm = [float(x) for x in open("times2x_03.txt")]
tl = [float(x) for x in open("zz2x_tl.txt")]
vl = [float(x) for x in open("zz2x_vl.txt")]
print("train iters: {} | first loss {:.4f} -> last {:.4f}".format(
    len(tl), tl[0], tl[-1]))
print("valid epochs: {} | last {:.4f}".format(len(vl), vl[-1]))
print("held-out mean hard Dice: {:.4f} | {:.2f} ms/img inference".format(
    np.mean(dice), 1e3 * np.mean(tm)))
print("=== E2E 2X COMPLETE ===")
EOF
}
