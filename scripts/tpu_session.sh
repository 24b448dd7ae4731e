#!/bin/bash
# One-shot TPU measurement session. Run as:  bash scripts/tpu_session.sh
# Runs every queued TPU measurement sequentially in ONE process window
# (the axon tunnel tolerates exactly one TPU process at a time; compile
# costs vary wildly between sessions — see memory/tpu-axon-quirks).
# Logs land in /tmp/tpu_session/.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_session
mkdir -p $OUT

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  # idempotent: a stage that already succeeded in an earlier window is
  # skipped, so a flapping tunnel only re-pays the unfinished stages
  if [ -f "$OUT/$name.ok" ]; then
    echo "=== $name skipped — already ok ===" | tee -a $OUT/session.log
    return 0
  fi
  echo "=== $name ($(date +%T)) ===" | tee -a $OUT/session.log
  timeout "$to" "$@" >$OUT/$name.log 2>&1
  local rc=$?
  [ $rc -eq 0 ] && touch "$OUT/$name.ok"
  echo "    exit=$rc ($(date +%T))" | tee -a $OUT/session.log
}

# Ordered so the highest-value results land first if the window is
# short (the tunnel has flapped for hours at a time).
# 0. sanity: kernels on hardware agree with interpret/oracle
run smoke      1800 python scripts/tpu_smoke_fwd.py
# 0b. CPU oracle cross-check of the fresh hardware dump (separate
# process, axon plugin disabled — required when the tunnel flaps)
run cpu_check  1200 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python scripts/cpu_check_fwd.py
# 0b2. hw-vs-interpret kernel+gradient parity on the post-extent-fix
# code (VERDICT r2 weak item 7): build on TPU, compare on CPU
run kdiff_hw   1800 python scripts/tpu_kernel_diff.py
run kdiff_cpu  1200 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python scripts/tpu_kernel_diff.py
# 0c. compiled-kernel train-quality gate at 256x256 (VERDICT r2 item 6)
run quality256 1800 python scripts/quality_gate_pallas.py
# 1. THE headline: post-layout-change scale bench at 1M splats
run scale1m    3600 python scripts/bench_scale.py 1000000
# 2. official bench artifact on real hardware (same line the driver runs)
run bench      3600 python bench.py
# 3. the 30k at-scale training run (VERDICT r2 item 4). Auto-resumable:
# if the window closes mid-run, the next session picks up from the last
# checkpoint. Budget most of a tunnel window for it.
run at_scale  28800 bash scripts/at_scale_run.sh
# 4. primitive cost map at the 1M-splat scene (the glue attack's compass)
run glue3      3600 python scripts/profile_glue3.py
# 5. chunk-size A/B: DMA-issue amortization vs padded-slot waste
run scale1m_c256 3600 env BENCH_CHUNK=256 python scripts/bench_scale.py 1000000
run scale1m_c512 3600 env BENCH_CHUNK=512 python scripts/bench_scale.py 1000000
# 6. secondary microbench sweep
run glue2      3600 python scripts/profile_glue2.py
echo "=== done ($(date +%T)) ===" | tee -a $OUT/session.log
