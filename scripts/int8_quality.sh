#!/usr/bin/env bash
# int8 quality bound on TRAINED networks (VERDICT r3 item 1).
#
# Re-runs the held-out inference of a completed synthetic_e2e.sh workdir
# through `test_ensemble --int8`, scores hard Dice + landmark detection
# with the SAME CLIs the float pass used, and prints the float-vs-int8
# deltas per specimen (the metrics quantization must not move:
# compute_actual_dice_on_test.py:84-91 hard Dice, est_lands_csv.py:121-133
# NCC>=0.9 landmark gate).
#
# Usage: scripts/int8_quality.sh <e2e_workdir>
# Expects in <e2e_workdir>: ds.h5, zz_fold_spec0K.pt, dice_0K.csv,
# lands_0K.csv (the float outputs synthetic_e2e.sh left behind).
{
set -euo pipefail

WORKDIR="${1:?usage: int8_quality.sh <e2e_workdir>}"
cd "$WORKDIR"
DATASET=ds.h5

echo "=== int8 per-fold held-out evaluation ==="
for k in 1 2 3 4 5 6; do
  kk=$(printf "%02d" "$k")
  echo "--- specimen $k (net zz_fold_spec${kk}.pt, int8) ---"
  python -m deepfluoro_tpu.cli.test_ensemble "$DATASET" "int8_out_${kk}.h5" \
    --pats "$k" --nets "zz_fold_spec${kk}.pt" --batch-size 10 --int8
  JAX_PLATFORMS=cpu python -m deepfluoro_tpu.cli.est_lands_csv "int8_out_${kk}.h5" nn-heats \
    --use-seg nn-segs --pat "$k" --out "int8_lands_${kk}.csv"
  JAX_PLATFORMS=cpu python -m deepfluoro_tpu.cli.compute_actual_dice_on_test "$DATASET" "int8_out_${kk}.h5" \
    nn-segs "int8_dice_${kk}.csv" "$k"
done

echo "=== float vs int8 summary ==="
python - "$DATASET" <<'EOF'
import csv, sys
import numpy as np
import h5py

dataset = sys.argv[1]
folds = ["01", "02", "03", "04", "05", "06"]


def score(ds, prefix):
    """Same scoring as synthetic_e2e.sh's summary: per-fold mean hard Dice;
    landmark detection over the loader's in-view set (0 <= x <= C-1, the
    mark_oob_landmarks_inf bound); pixel errors of detected landmarks."""
    dice_all, det_tot, det_hit, errs_all = [], 0, 0, []
    for kk in folds:
        vals = [
            float(r["dice"])
            for r in csv.DictReader(open("%sdice_%s.csv" % (prefix, kk)))
        ]
        dice_all.append(np.mean(vals))
        gt = np.asarray(ds[kk + "/lands"])  # (N, 2, L) col-then-row
        R, C = ds[kk + "/projs"].shape[1:3]
        det, errs, total = 0, [], 0
        for row in csv.DictReader(open("%slands_%s.csv" % (prefix, kk))):
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
        det_tot += total; det_hit += det; errs_all += errs
    return (
        float(np.mean(dice_all)), det_hit, det_tot,
        float(np.median(errs_all)) if errs_all else float("nan"),
    )


with h5py.File(dataset) as ds:
    fd, fhit, ftot, ferr = score(ds, "")
    qd, qhit, qtot, qerr = score(ds, "int8_")
print("float: mean Dice %.4f | detection %d/%d (%.2f%%) | err median %.3f px"
      % (fd, fhit, ftot, 100.0 * fhit / max(1, ftot), ferr))
print("int8 : mean Dice %.4f | detection %d/%d (%.2f%%) | err median %.3f px"
      % (qd, qhit, qtot, 100.0 * qhit / max(1, qtot), qerr))
print("DELTA: Dice %+0.5f | detection %+0.3f%% | err median %+0.4f px"
      % (qd - fd, 100.0 * (qhit / max(1, qtot) - fhit / max(1, ftot)), qerr - ferr))
print("=== INT8 QUALITY COMPLETE ===")
EOF
}
