#!/bin/bash
# Poll the TPU tunnel; the moment it answers, run the measurement queue.
# Keeps watching until the queue completes successfully (exit 0) — a
# tunnel that flaps between the health check and the queue start must not
# kill the watcher. Launch detached:  nohup bash scripts/tpu_watch.sh &
cd "$(dirname "$0")/.."
LOG=scripts/tpu_watch.log
echo "$(date +%H:%M:%S) watcher started" >> $LOG
while true; do
  if timeout 90 python -c "import jax, jax.numpy as j; print(float(j.arange(8.).sum()))" >/dev/null 2>&1; then
    echo "$(date +%H:%M:%S) tunnel UP — running measurement queue" >> $LOG
    if bash scripts/tpu_measure_queue.sh >> $LOG 2>&1; then
      echo "$(date +%H:%M:%S) queue done" >> $LOG
      break
    fi
    echo "$(date +%H:%M:%S) queue aborted (tunnel flapped?) — still watching" >> $LOG
  fi
  sleep 75
done
