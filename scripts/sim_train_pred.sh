#!/usr/bin/env bash
# The canonical end-to-end workload of the reference
# (/root/reference/scripts/sim_train_pred.sh): simulate-xy under a
# lasso-base net (1 branch x 20 markers, n=1000, width 10, depth 0,
# Gamma(3,1) init) for a grid of heritabilities, train with chain lengths
# 10 and 100 at integration length 300, and write train/test predictions.
#
# Usage: scripts/sim_train_pred.sh [OUTDIR] [EXTRA_TRAIN_FLAGS...]
set -euo pipefail

OUT="${1:-./sim_train_pred_out}"
shift || true
PY="${PYTHON:-python}"
RB="$PY -m rs_bann_tpu"

# route --cpu to every subcommand (simulate/predict too), not just train-new
DEVFLAGS=""
case " $* " in *" --cpu "*) DEVFLAGS="--cpu" ;; esac

mkdir -p "$OUT"

for H in 0.25 0.5 0.8 0.95; do
  simdir=$($RB simulate-xy lasso-base tanh 20 1 1000 10 0 "$H" \
    --init-gamma-shape 3 --init-gamma-scale 1 --seed 1 $DEVFLAGS -o "$OUT")
  echo "simulated: $simdir"
  for CL in 10 100; do
    rundir=$($RB train-new \
      "$simdir/train" "$simdir/train.phen" "$simdir/train.groups" \
      --bfile-test "$simdir/test" --p-test "$simdir/test.phen" \
      lasso-base tanh 0 "$CL" 300 --trace --seed 1 \
      --outpath "$simdir" "$@" | tail -1)
    echo "trained:   $rundir"
    $RB predict "$simdir/train" "$simdir/train.groups" $DEVFLAGS \
      -m "$rundir/models" > "$rundir/train_preds.csv"
    $RB predict "$simdir/test" "$simdir/train.groups" $DEVFLAGS \
      -m "$rundir/models" > "$rundir/test_preds.csv"
  done
done
echo "done: $OUT"
