#!/bin/bash
# Sequential TPU measurement queue — run when the tunnel is healthy.
# Each step has its own timeout; results append to scripts/tpu_results.log.
# Health policy (learned the hard way): the backend often REFUSES a fresh
# connection for ~1-3 min right after a process disconnects, so a health
# check between every step reads "down" while the tunnel is actually fine.
# Health-check only at queue start; after a step that *failed with a
# backend error*, re-check once with a long timeout before deciding the
# tunnel is gone. Completed steps are recorded in /tmp/tpu_queue_done so
# a rerun skips them.
cd "$(dirname "$0")/.."
LOG=scripts/tpu_results.log
DONE=/tmp/tpu_queue_done
touch $DONE
# the queue health-checks at start; bench must NOT open a second probe
# connection right after (the backend refuses back-to-back fresh
# connections for ~1-3 min) — skip bench's own check entirely
export FRCNN_BENCH_HEALTH_ATTEMPTS=0

health() {
  timeout 150 python -c "import jax, jax.numpy as j; print('tunnel ok', float(j.arange(8.).sum()))"
}

runt() {
  t=$1; shift
  key=$(echo "$*" | tr -c 'a-zA-Z0-9' _)
  if grep -qx "$key" $DONE; then
    echo "skip (done): $*"
    return 0
  fi
  echo "=== $(date +%H:%M:%S) $*" | tee -a $LOG
  raw=$(timeout "$t" "$@" 2>&1)
  rc=$?
  out=$(echo "$raw" | grep -vE "WARNING|WARN |INFO " | tail -8)
  echo "$out" | tee -a $LOG
  if echo "$out" | grep -q "backend unavailable\|backend health check\|Unable to initialize backend"; then
    # backend error mid-step: give the tunnel one long-grace recheck
    sleep 60
    health || { echo "tunnel died during: $*"; exit 1; }
    echo "tunnel recovered; step stays eligible: $*"
    return 0
  fi
  if [ -z "$out" ]; then
    echo "no output (timeout?): $*"; exit 1
  fi
  # only a CLEAN step is marked done: a nonzero exit, a traceback, or a
  # bench error-JSON must stay eligible for rerun after a fix
  if [ "$rc" -ne 0 ] || echo "$raw" | grep -q 'Traceback\|"error":'; then
    echo "step failed (rc=$rc), NOT marked done: $*" | tee -a $LOG
    return 0
  fi
  echo "$key" >> $DONE
}

run() { runt 560 "$@"; }

health || { echo "tunnel down"; exit 1; }

# headline candidate: split-layout s2d frontend (Pallas block0 + planar norm)
run python bench.py 16 40 int8s+pallas+s2d
run python scripts/profile_detect.py 16 60 s2dstages
run python scripts/bench_block0.py normparts 16 40
run python bench.py 32 40 int8s+pallas+s2d
run python scripts/profile_train.py 8 12 loss grad step
run python scripts/profile_train.py 8 12 step pallas
run python scripts/profile_detect.py 16 60 fwdparts mode=int8s
run python scripts/profile_detect.py 16 60 decode select nms pool cnet mode=int8s+pallas
run python bench.py 16 40 int8s+pallas+large
# accuracy at the REAL duplo scale (vgg_small, 800x450) on hardware:
# ~3 min of training at the measured 16 steps/s + eval/demo compiles
runt 1500 python scripts/train_synthetic_eval.py --scale duplo --steps 2500 --images 200 --out /tmp/acc_duplo
