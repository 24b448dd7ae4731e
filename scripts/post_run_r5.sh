#!/bin/bash
# Round-5 post-training TPU sequence: waits for the training process to
# release the chip, then (in artifact-priority order) verifies the fwd
# path on hardware, produces QUALITY_scale.json from the newest completed
# checkpoint, re-measures the post-fix stage table at 1M, and runs the
# bwd stage-bench artifact diagnosis. Each step is timeout-guarded so the
# chain cannot hold the chip past the round's bench window.
set -u
cd "$(dirname "$0")/.."
TRAIN_PID=${1:?usage: post_run_r5.sh <train_pid>}
OUT=${OUT:-/tmp/rich_run_r5}
DATA=${DATA:-/tmp/rich_1080p}

echo "=== waiting for train pid $TRAIN_PID ($(date +%T)) ==="
while kill -0 "$TRAIN_PID" 2>/dev/null; do sleep 20; done
sleep 10
echo "=== train done ($(date +%T)) ==="

echo "=== 1. fwd smoke (verify) ==="
timeout 900 python scripts/tpu_smoke_fwd.py
timeout 600 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python scripts/cpu_check_fwd.py

# newest completed save
ITER=""
for c in 30000 22500 15000 7000; do
  if [ -d "$OUT/point_cloud/iteration_$c" ]; then ITER=$c; break; fi
done
if [ -n "$ITER" ]; then
  echo "=== 2. quality readout @ iteration $ITER ==="
  timeout 3900 python scripts/quality_readout.py \
    --model "$OUT" --data "$DATA" --iteration "$ITER"
else
  echo "=== 2. SKIPPED quality readout: no saved point_cloud ==="
fi

echo "=== 3. stage table at 1M (post-fix) ==="
timeout 2400 python scripts/bench_scale.py 1000000

echo "=== 4. bwd stage-bench artifact diagnosis ==="
timeout 1500 python scripts/diag_bwd_artifact.py

echo "=== post-run chain done ($(date +%T)) ==="
