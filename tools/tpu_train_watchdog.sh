#!/bin/bash
# Watchdog wrapper for epic_tpu.cli.train_device on the tunneled TPU.
#
# The tunnel to the real chip intermittently hangs whole processes
# (CLAUDE.md); the trainer journals progress and resumes mid-stage, so the
# recovery strategy is: watch the heartbeat file the trainer touches at
# every log point, kill (by PID, never by pattern) when it goes stale, and
# relaunch. Exits when the curriculum completes or on a non-finite loss.
#
# Usage: tools/tpu_train_watchdog.sh SAVE_PATH STEPS_SPEC [extra trainer args]
set -u
SAVE=$1; shift
STEPS=$1; shift
mkdir -p "$SAVE"
HB="$SAVE/heartbeat"
PIDFILE="$SAVE/trainer.pid"
STALE=1500           # seconds without a heartbeat before we kill
MAX_RESTARTS=300

for attempt in $(seq 1 $MAX_RESTARTS); do
  touch "$HB"
  echo "[watchdog] attempt $attempt $(date -u +%FT%TZ)" >> "$SAVE/run.log"
  python -m epic_tpu.cli.train_device --save_path "$SAVE" --steps "$STEPS" \
      --heartbeat "$HB" "$@" >> "$SAVE/run.log" 2>&1 &
  PID=$!
  echo $PID > "$PIDFILE"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y "$HB" 2>/dev/null || echo 0) ))
    if [ "$age" -gt "$STALE" ]; then
      echo "[watchdog] heartbeat stale (${age}s) -> kill $PID" >> "$SAVE/run.log"
      kill -9 "$PID" 2>/dev/null
      sleep 5
      break
    fi
  done
  wait "$PID" 2>/dev/null
  rc=$?
  echo "[watchdog] trainer exit rc=$rc" >> "$SAVE/run.log"
  if [ "$rc" -eq 0 ] && grep -q "curriculum complete" "$SAVE/run.log"; then
    echo "[watchdog] curriculum complete" >> "$SAVE/run.log"
    exit 0
  fi
  if [ "$rc" -eq 3 ]; then
    echo "[watchdog] non-finite loss — stopping" >> "$SAVE/run.log"
    exit 3
  fi
  if [ "$rc" -eq 4 ]; then
    echo "[watchdog] NaN rewind — relaunching from last checkpoint" >> "$SAVE/run.log"
  fi
  sleep 15
done
echo "[watchdog] max restarts exceeded" >> "$SAVE/run.log"
exit 1
