#!/bin/bash
# Stall-watchdog runner for TPU jobs over the flaky axon tunnel: runs the
# command, kills and retries (fresh client) if the log stops growing for
# STALL_S seconds. Usage: tpu_retry.sh LOGFILE STALL_S MAX_TRIES CMD...
LOG=$1; STALL=$2; TRIES=$3; shift 3
for attempt in $(seq 1 $TRIES); do
  : > "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  last_size=0; last_change=$(date +%s)
  while kill -0 $PID 2>/dev/null; do
    sleep 15
    size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    now=$(date +%s)
    if [ "$size" != "$last_size" ]; then last_size=$size; last_change=$now; fi
    if [ $((now - last_change)) -gt "$STALL" ]; then
      echo "[tpu_retry] attempt $attempt stalled (${STALL}s no output); killing $PID" >> "$LOG"
      kill $PID 2>/dev/null; sleep 2; kill -9 $PID 2>/dev/null
      # also kill the direct child (python under timeout)
      pkill -9 -P $PID 2>/dev/null
      break
    fi
  done
  wait $PID 2>/dev/null; rc=$?
  if [ $rc -eq 0 ]; then echo "[tpu_retry] attempt $attempt succeeded" >> "$LOG"; exit 0; fi
  echo "[tpu_retry] attempt $attempt exited rc=$rc; retrying" >> "$LOG"
  sleep 20
done
echo "[tpu_retry] all $TRIES attempts failed" >> "$LOG"
exit 1
