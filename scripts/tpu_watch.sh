#!/bin/bash
# TPU-window watcher: probe the axon tunnel every PROBE_EVERY seconds; the
# moment jax.devices() answers, fire the queued one-shot measurement session
# (scripts/tpu_session.sh) and then the at-scale training run. Exits after
# the session completes, or after MAX_WAIT_S without a window.
set -u
cd "$(dirname "$0")/.."
PROBE_EVERY=${PROBE_EVERY:-300}
PROBE_TIMEOUT=${PROBE_TIMEOUT:-240}
MAX_WAIT_S=${MAX_WAIT_S:-14400}
LOG=/tmp/tpu_watch.log
start=$(date +%s)
echo "watch start $(date +%T)" >>$LOG
while true; do
  if timeout "$PROBE_TIMEOUT" python -c "import jax; print(jax.devices())" >>$LOG 2>&1; then
    echo "TUNNEL UP $(date +%T) — firing tpu_session.sh" >>$LOG
    bash scripts/tpu_session.sh >>$LOG 2>&1
    echo "session done $(date +%T)" >>$LOG
    exit 0
  fi
  now=$(date +%s)
  if [ $((now - start)) -ge "$MAX_WAIT_S" ]; then
    echo "no window after ${MAX_WAIT_S}s $(date +%T)" >>$LOG
    exit 2
  fi
  echo "probe failed $(date +%T); retry in ${PROBE_EVERY}s" >>$LOG
  sleep "$PROBE_EVERY"
done
