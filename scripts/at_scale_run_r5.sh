#!/bin/bash
# Round-5 at-scale run (VERDICT r4 items 2+4 in one artifact): the FULL
# 30k-iteration reference schedule at 1080p with densification pressure
# targeting >=500k active splats, on the round-5 optimized step (lane-major
# SH path, (K,N) interval tables, periodic capacity re-tightening).
# Logs one JSONL line per tick to RUNLOG_r5.jsonl; checkpoints at
# 7000/15000/22500/30000 so scripts/quality_readout.py can score the best
# completed iteration even if wall-clock runs out.
# Reference contract: /root/reference/train.py:54-168 +
# arguments/__init__.py:75,93 (30k iters, densify to 15k).
set -ue
cd "$(dirname "$0")/.."
DATA=${DATA:-/tmp/rich_1080p}
OUT=${OUT:-/tmp/rich_run_r5}
LOG=${LOG:-RUNLOG_r5.jsonl}
THRESH=${THRESH:-0.00006}

if [ ! -f "$DATA/transforms_train.json" ]; then
  echo "=== generating dataset ($(date +%T)) ==="
  python scripts/make_synthetic_scene.py --preset rich --out "$DATA" \
    --width 1920 --height 1080 --n_train 40 --n_test 8 \
    --n_surfels 250000
fi

echo "=== training 30k ($(date +%T)) ==="
RESUME=""
LAST=$(ls -1 "$OUT"/chkpnt*.npz 2>/dev/null | sed 's/.*chkpnt//;s/\.npz//' | sort -n | tail -1)
if [ -n "${LAST:-}" ]; then
  RESUME="--start_checkpoint $OUT/chkpnt$LAST.npz"
  echo "resuming from iteration $LAST"
fi
python train.py -s "$DATA" -m "$OUT" --eval --iterations 30000 \
  --pairs_capacity $((1<<22)) \
  --densify_grad_threshold "$THRESH" \
  --lambda_dist 10 --no_viewer --run_log "$LOG" $RESUME \
  --test_iterations 7000 15000 30000 \
  --save_iterations 7000 15000 22500 30000 \
  --checkpoint_iterations 7000 15000 22500 30000
echo "=== done ($(date +%T)) ==="
