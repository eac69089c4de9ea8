#!/usr/bin/env bash
# End-to-end TRAINING at FULL resolution — the last geometry on the
# reference's documented ladder (README.md:62-68: training works at any
# downsample level; full-res preprocessed frames are 1436^2 after the 50px
# crop, padded to 1440 = 45*32 for the 6-level U-Net). Same shape as
# scripts/e2e_2x.sh: fit() epochs with --stream-data (host-resident
# archive) + --remat (activation headroom; without it batch 4 at 736^2
# already failed to compile, BASELINE.md remat row) + --bf16, periodic
# checkpoint + validation, then held-out inference (test_ensemble),
# landmark decode and hard Dice at the full 1436^2 resolution.
#
# Usage: scripts/e2e_fullres.sh <workdir> [epochs] [projs-per-specimen]
{
set -euo pipefail

WORKDIR="${1:?usage: e2e_fullres.sh <workdir> [epochs] [projs-per-specimen]}"
EPOCHS="${2:-3}"
PROJS="${3:-8}"
mkdir -p "$WORKDIR"
cd "$WORKDIR"
DATASET=ds1x.h5

if [ ! -f "$DATASET" ]; then
  echo "=== building synthetic full-res archive (3 specimens x $PROJS projs, 1436^2) ==="
  python - "$PROJS" <<'EOF'
import sys

from deepfluoro_tpu.data.fixtures import write_synthetic_dataset

write_synthetic_dataset("ds1x.h5", num_specimens=3, num_projs=int(sys.argv[1]), img_dim=1436)
print("wrote ds1x.h5")
EOF
fi

# batch 2: batch 4 at 1440^2 OOMs HBM even with remat+bf16 (24.45G vs
# 15.75G; level-0/1 activations are ~530 MB each at b4 and the padded
# HLO-temp footprint lands at 2.07x unpadded)
echo "=== full-res training run (stream + remat + bf16, batch 2 @ 1440^2) ==="
time python -m deepfluoro_tpu.cli.train "$DATASET" \
  --train-pats 1,2 --num-classes 7 --batch-size 2 --unet-img-dim 1440 \
  --unet-num-lvls 6 --unet-init-feats-exp 5 --unet-batch-norm \
  --unet-padding --unet-no-max-pool --data-aug --use-lands \
  --heat-coeff 0.5 --train-valid-split 0.85 --optim sgd --lr-sched plateau \
  --init-lr 0.1 --momentum 0.9 --nesterov --wgt-decay 1e-4 \
  --max-num-epochs "$EPOCHS" --checkpoint-net zz1x_ck.pt \
  --best-net zz1x_best.pt --train-loss-txt zz1x_tl.txt \
  --valid-loss-txt zz1x_vl.txt --stream-data --remat --bf16 --seed 42 \
  --light-best-nets

echo "=== held-out inference + scoring at full res (specimen 3) ==="
time python -m deepfluoro_tpu.cli.test_ensemble "$DATASET" out1x_03.h5 \
  --pats 3 --nets zz1x_best.pt --times times1x_03.txt --batch-size 2
JAX_PLATFORMS=cpu python -m deepfluoro_tpu.cli.est_lands_csv out1x_03.h5 nn-heats \
  --use-seg nn-segs --pat 3 --out lands1x_03.csv
JAX_PLATFORMS=cpu python -m deepfluoro_tpu.cli.compute_actual_dice_on_test "$DATASET" out1x_03.h5 \
  nn-segs dice1x_03.csv 3

python - <<'EOF'
import csv
import numpy as np

dice = [float(r["dice"]) for r in csv.DictReader(open("dice1x_03.csv"))]
tm = [float(x) for x in open("times1x_03.txt")]
tl = [float(x) for x in open("zz1x_tl.txt")]
vl = [float(x) for x in open("zz1x_vl.txt")]
print("train iters: {} | first loss {:.4f} -> last {:.4f}".format(
    len(tl), tl[0], tl[-1]))
print("valid epochs: {} | last {:.4f}".format(len(vl), vl[-1]))
print("held-out mean hard Dice: {:.4f} | {:.2f} ms/img inference".format(
    np.mean(dice), 1e3 * np.mean(tm)))
print("=== E2E FULLRES COMPLETE ===")
EOF
}
