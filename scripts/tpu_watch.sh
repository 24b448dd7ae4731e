#!/bin/bash
# TPU-window supervisor: probe the axon tunnel every PROBE_EVERY seconds;
# whenever jax.devices() answers, (re-)fire scripts/tpu_session.sh. The
# session is per-stage idempotent (skips stages that already succeeded),
# so a flapping tunnel incrementally completes the queue across windows.
# Exits when the final stage (the 30k at-scale run) has succeeded, or
# after MAX_WAIT_S total.
set -u
cd "$(dirname "$0")/.."
PROBE_EVERY=${PROBE_EVERY:-300}
PROBE_TIMEOUT=${PROBE_TIMEOUT:-240}
MAX_WAIT_S=${MAX_WAIT_S:-39600}
LOG=/tmp/tpu_watch.log
OUT=/tmp/tpu_session
start=$(date +%s)
echo "watch start $(date +%T)" >>$LOG
while true; do
  if timeout "$PROBE_TIMEOUT" python -c "import jax; print(jax.devices())" >>$LOG 2>&1; then
    echo "TUNNEL UP $(date +%T) — firing tpu_session.sh" >>$LOG
    bash scripts/tpu_session.sh >>$LOG 2>&1
    echo "session pass done $(date +%T)" >>$LOG
    if [ -f "$OUT/at_scale.ok" ]; then
      echo "all stages ok $(date +%T) — exiting" >>$LOG
      exit 0
    fi
  fi
  now=$(date +%s)
  if [ $((now - start)) -ge "$MAX_WAIT_S" ]; then
    echo "budget exhausted after ${MAX_WAIT_S}s $(date +%T)" >>$LOG
    exit 2
  fi
  echo "probe failed or session incomplete $(date +%T); retry in ${PROBE_EVERY}s" >>$LOG
  sleep "$PROBE_EVERY"
done
