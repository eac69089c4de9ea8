#!/bin/bash
# End-to-end quality harness: the complete paper workflow — 6-fold
# leave-one-specimen-out training (train_test_code/Readme.md:14-17 recipe),
# per-fold held-out inference, landmark decode, hard-Dice scoring — in one
# command.
#
#   scripts/synthetic_e2e.sh <workdir> [dataset.h5] [epochs]
#
# With no dataset argument a synthetic 6-specimen archive is generated at
# the 8x-downsample geometry (180^2), so the harness runs anywhere; pass the
# real ipcai_2020_ds_8x.h5 to produce the paper's quality numbers
# (BASELINE.md "to be measured" table) when the JHU archives are available.
# Runs on whatever jax.devices() provides (TPU chip or CPU).
set -euo pipefail

# whole body inside braces: bash parses it completely before executing, so
# editing this file while a run is in flight cannot garble that run
{

WORKDIR=${1:?usage: synthetic_e2e.sh <workdir> [dataset.h5] [epochs]}
DATASET=${2:-}
EPOCHS=${3:-150}
# resolve before cd so a dataset path relative to the caller's cwd works
if [ -n "$DATASET" ]; then
  DATASET=$(realpath "$DATASET")
fi
mkdir -p "$WORKDIR"
cd "$WORKDIR"

if [ -z "$DATASET" ]; then
  DATASET=ds.h5
  python -c "
from deepfluoro_tpu.data.fixtures import write_synthetic_dataset
write_synthetic_dataset('$DATASET', num_specimens=6, num_projs=100, img_dim=180, seed=11)
print('synthetic dataset written: $DATASET')
"
fi

echo "=== train_folds: 6-fold paper recipe, $EPOCHS epochs ==="
python -m deepfluoro_tpu.cli.train_folds "$DATASET" \
  --pats 1,2,3,4,5,6 --epochs "$EPOCHS" --batch-size 5 --unet-img-dim 192 \
  --optim sgd --lr-sched plateau --init-lr 0.1 --momentum 0.9 --nesterov \
  --wgt-decay 1e-4 --unet-num-lvls 6 --unet-init-feats-exp 5 \
  --unet-batch-norm --unet-padding --unet-no-max-pool \
  --data-aug --use-lands --heat-coeff 0.5 --train-valid-split 0.85 \
  --checkpoint-freq 75 --net-prefix zz_fold --bf16 --seed 42 \
  --light-best-nets

echo "=== per-fold held-out evaluation ==="
for k in 1 2 3 4 5 6; do
  kk=$(printf "%02d" "$k")
  echo "--- specimen $k (net zz_fold_spec${kk}.pt) ---"
  python -m deepfluoro_tpu.cli.test_ensemble "$DATASET" "out_${kk}.h5" \
    --pats "$k" --nets "zz_fold_spec${kk}.pt" --times "times_${kk}.txt" --batch-size 10
  # landmark decode + Dice scoring are tiny compute (the reference runs them
  # on plain CPU, est_lands_csv.py / compute_actual_dice_on_test.py) — pin
  # them to the CPU backend so they don't pay device-compile latency
  JAX_PLATFORMS=cpu python -m deepfluoro_tpu.cli.est_lands_csv "out_${kk}.h5" nn-heats \
    --use-seg nn-segs --pat "$k" --out "lands_${kk}.csv"
  JAX_PLATFORMS=cpu python -m deepfluoro_tpu.cli.compute_actual_dice_on_test "$DATASET" "out_${kk}.h5" \
    nn-segs "dice_${kk}.csv" "$k"
  # visual artifacts for projection 3: estimated seg + landmarks overlay and
  # one heatmap overlay (the reference Readme's documented workflow ends
  # with these, train_test_code/Readme.md:38-61)
  JAX_PLATFORMS=cpu python -m deepfluoro_tpu.cli.overlay_est_ann "$DATASET" "out_${kk}.h5" \
    nn-segs "$k" 3 "overlay_ann_${kk}_proj3.png" --lands-csv "lands_${kk}.csv"
  JAX_PLATFORMS=cpu python -m deepfluoro_tpu.cli.overlay_est_heat "$DATASET" "out_${kk}.h5" \
    nn-heats "$k" 3 0 "overlay_heat_${kk}_proj3_land0.png"
done

echo "=== summary ==="
python - "$DATASET" <<'EOF'
import csv, sys
import numpy as np
import h5py

dataset = sys.argv[1]
folds = ["01", "02", "03", "04", "05", "06"]
dice_all, det_tot, det_hit, errs_all = [], 0, 0, []
with h5py.File(dataset) as ds:
    for kk in folds:
        vals = [float(r["dice"]) for r in csv.DictReader(open("dice_%s.csv" % kk))]
        dice_all.append(np.mean(vals))
        gt = np.asarray(ds[kk + "/lands"])  # (N, 2, L) col-then-row
        R, C = ds[kk + "/projs"].shape[1:3]
        det, errs, total = 0, [], 0
        for row in csv.DictReader(open("lands_%s.csv" % kk)):
            p, l = int(row["proj"]), int(row["land"])
            gx, gy = float(gt[p, 0, l]), float(gt[p, 1, l])
            # archives store out-of-view landmarks as finite out-of-bounds
            # coords (the loader marks them inf by the bounds test,
            # data/hdf5.py::mark_oob_landmarks_inf) — skip them here too
            # in-view means what the LOADER trains on: 0 <= x <= cols-1
            # (mark_oob_landmarks_inf) — `< C` would score landmarks in
            # (C-1, C) that training treated as out-of-view
            if not (np.isfinite(gx) and np.isfinite(gy)
                    and 0 <= gx <= C - 1 and 0 <= gy <= R - 1):
                continue
            total += 1
            r, c = float(row["row"]), float(row["col"])
            if r < 0:
                continue
            det += 1
            errs.append(float(np.hypot(r - gy, c - gx)))
        det_tot += total; det_hit += det; errs_all += errs
        tm = [float(x) for x in open("times_%s.txt" % kk)]
        print("spec %s: mean hard Dice %.4f | lands %d/%d | err median %.2f px | %.2f ms/img"
              % (kk, dice_all[-1], det, total,
                 np.median(errs) if errs else float("nan"), 1e3 * np.mean(tm)))
dice_mean = float(np.mean(dice_all))
det_pct = 100.0 * det_hit / max(1, det_tot)
err_med = float(np.median(errs_all)) if errs_all else float("nan")
print("OVERALL: mean Dice %.4f | detection %.1f%% | err median %.2f px"
      % (dice_mean, det_pct, err_med))

# --- regression gate (VERDICT r4 #2): at a pinned NON-SATURATED operating
# point (the 8-epoch smoke: Dice ~0.995, detection ~50-60% — both still
# climbing, so regressions move them) the harness asserts tolerance bands
# instead of just printing. Bands live in BASELINE.md next to the
# operating-point rows; activate with e.g.
#   E2E_MIN_DICE=0.985 E2E_MIN_DET=40 E2E_MAX_ERR=1.0 scripts/synthetic_e2e.sh wd '' 8
import os
failures = []
if os.environ.get("E2E_MIN_DICE") and dice_mean < float(os.environ["E2E_MIN_DICE"]):
    failures.append("mean Dice %.4f < band %s" % (dice_mean, os.environ["E2E_MIN_DICE"]))
if os.environ.get("E2E_MIN_DET") and det_pct < float(os.environ["E2E_MIN_DET"]):
    failures.append("detection %.1f%% < band %s%%" % (det_pct, os.environ["E2E_MIN_DET"]))
if os.environ.get("E2E_MAX_ERR") and not (err_med <= float(os.environ["E2E_MAX_ERR"])):
    failures.append("median err %.2f px > band %s" % (err_med, os.environ["E2E_MAX_ERR"]))
if failures:
    print("REGRESSION GATE FAILED: " + "; ".join(failures))
    raise SystemExit(1)
if any(os.environ.get(k) for k in ("E2E_MIN_DICE", "E2E_MIN_DET", "E2E_MAX_ERR")):
    print("REGRESSION GATE PASSED")
EOF
echo "=== E2E COMPLETE ==="
exit 0

}
