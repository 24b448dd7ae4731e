#!/bin/bash
# VERDICT r1 item 2: the reference training schedule end-to-end at scale.
# Generates a rich 1080p synthetic dataset (trained-like geometry,
# multi-scale texture) and runs the FULL 30k-iteration schedule —
# densification to 10^5-10^6 active splats, capacity doubling, pairs
# overflow escalation, opacity resets — logging one JSONL line per tick
# (incl. peak HBM) to RUNLOG_scale.jsonl at the repo root.
# Reference contract: /root/reference/train.py:54-168 +
# arguments/__init__.py:75,93 (30k iters, densify to 15k).
set -ue
cd "$(dirname "$0")/.."
DATA=${DATA:-/tmp/rich_1080p}
OUT=${OUT:-/tmp/rich_run}
LOG=RUNLOG_scale.jsonl

if [ ! -f "$DATA/transforms_train.json" ]; then
  echo "=== generating dataset ($(date +%T)) ==="
  python scripts/make_synthetic_scene.py --preset rich --out "$DATA" \
    --width 1920 --height 1080 --n_train 40 --n_test 8 \
    --n_surfels 250000
fi

echo "=== training 30k ($(date +%T)) ==="
# resume from the newest checkpoint if a previous run was cut short
RESUME=""
LAST=$(ls -1 "$OUT"/chkpnt*.npz 2>/dev/null | sed 's/.*chkpnt//;s/\.npz//' | sort -n | tail -1)
if [ -n "${LAST:-}" ]; then
  RESUME="--start_checkpoint $OUT/chkpnt$LAST.npz"
  echo "resuming from iteration $LAST"
fi
# start pairs capacity at 4M: the scene densifies toward ~10M pairs, so
# a 512k start would pay ~5 overflow-doubling recompiles (minutes each
# on the flaky remote-compile tunnel); 4M leaves 1-2 amortized doublings
python train.py -s "$DATA" -m "$OUT" --eval --iterations 30000 \
  --pairs_capacity $((1<<22)) \
  --lambda_dist 10 --no_viewer --run_log "$LOG" $RESUME \
  --test_iterations 7000 15000 30000 \
  --save_iterations 30000 --checkpoint_iterations 7000 15000 30000
echo "=== done ($(date +%T)) ==="
