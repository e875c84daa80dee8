#!/bin/bash
# Poll the TPU tunnel; the moment it answers, run the measurement queue.
# The queue does its own single start-up health check (the backend often
# refuses a second fresh connection right after one closes, so the watcher
# must NOT health-check separately back-to-back with the queue).
# Keeps watching until the queue completes successfully (exit 0).
# Launch detached:  nohup bash scripts/tpu_watch.sh &
cd "$(dirname "$0")/.."
LOG=scripts/tpu_watch.log
echo "$(date +%H:%M:%S) watcher started" >> $LOG
while true; do
  if bash scripts/tpu_measure_queue.sh >> $LOG 2>&1; then
    echo "$(date +%H:%M:%S) queue done" >> $LOG
    break
  fi
  echo "$(date +%H:%M:%S) queue aborted (tunnel down?) — still watching" >> $LOG
  sleep 75
done
