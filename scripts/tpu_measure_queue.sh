#!/bin/bash
# Sequential TPU measurement queue — run when the tunnel is healthy.
# Each step has its own timeout; results append to scripts/tpu_results.log.
# Health policy (learned the hard way): the backend often REFUSES a fresh
# connection for ~1-3 min right after a process disconnects, so a health
# check between every step reads "down" while the tunnel is actually fine.
# Health-check only at queue start; after a step that *failed with a
# backend error*, re-check once with a long timeout before deciding the
# tunnel is gone. Completed steps are recorded in /tmp/tpu_queue_done so
# a rerun skips them; steps that fail for non-tunnel reasons 3 times are
# retired. The queue only exits 0 when every step is done or retired, so
# the watcher keeps watching until nothing is left to measure.
cd "$(dirname "$0")/.."
LOG=scripts/tpu_results.log
DONE=/tmp/tpu_queue_done
FAILS=/tmp/tpu_queue_fails
touch $DONE $FAILS
# the queue health-checks at start; bench must NOT open a second probe
# connection right after (the backend refuses back-to-back fresh
# connections for ~1-3 min) — skip bench's own check entirely
export FRCNN_BENCH_HEALTH_ATTEMPTS=0
# without -u python block-buffers stdout into the $(...) capture, so a
# step killed by timeout loses EVERY stage it already measured
export PYTHONUNBUFFERED=1
ALLKEYS=()

health() {
  timeout 150 python -c "import jax, jax.numpy as j; print('tunnel ok', float(j.arange(8.).sum()))"
}

runt() {
  t=$1; shift
  key=$(echo "$*" | tr -c 'a-zA-Z0-9' _)
  ALLKEYS+=("$key")
  if grep -qx "$key" $DONE; then
    echo "skip (done): $*"
    return 0
  fi
  if [ "$(grep -cx "$key" $FAILS)" -ge 3 ]; then
    echo "skip (retired after 3 failures): $*"
    return 0
  fi
  echo "=== $(date +%H:%M:%S) $*" | tee -a $LOG
  raw=$(timeout "$t" "$@" 2>&1)
  rc=$?
  out=$(echo "$raw" | grep -vE "WARNING|WARN |INFO " | tail -8)
  echo "$out" | tee -a $LOG
  if echo "$out" | grep -q "backend unavailable\|backend health check\|Unable to initialize backend"; then
    # backend error mid-step: give the tunnel one long-grace recheck;
    # the step is NOT done — the final completeness check (below) makes
    # the queue exit nonzero so the watcher comes back for it
    sleep 60
    health || { echo "tunnel died during: $*"; exit 1; }
    echo "tunnel recovered; step stays eligible: $*"
    return 0
  fi
  if [ -z "$out" ]; then
    # count it: a step that hangs to timeout 3 times (e.g. tunnel died
    # mid-compile, or a genuinely too-slow program) retires instead of
    # blocking every later step forever
    echo "$key" >> $FAILS
    echo "no output (timeout?, fail #$(grep -cx "$key" $FAILS)): $*"; exit 1
  fi
  # only a CLEAN step is marked done: a nonzero exit, a traceback, or a
  # bench error-JSON must stay eligible for rerun after a fix
  if [ "$rc" -ne 0 ] || echo "$raw" | grep -q 'Traceback\|"error":'; then
    echo "$key" >> $FAILS
    echo "step failed (rc=$rc, fail #$(grep -cx "$key" $FAILS)), NOT marked done: $*" | tee -a $LOG
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
# unmeasured-stage profiles FIRST (highest information value per tunnel
# minute); the batch-32 bench has hung to timeout twice — run it late.
# Profile steps compile SEVERAL never-cached programs through the remote
# compile service (minutes each) — give them 1200s, not 560s
runt 1200 python scripts/profile_train.py 8 12 loss grad step
runt 1200 python scripts/profile_train.py 8 12 step pallas
# train throughput scaling: batch 16 with the Pallas pool fwd+bwd kernels
runt 1200 python scripts/profile_train.py 16 12 step pallas
runt 1200 python scripts/profile_detect.py 16 60 fwdparts mode=int8s
runt 1200 python scripts/profile_detect.py 16 60 decode select nms pool cnet mode=int8s+pallas
runt 1200 python bench.py 16 40 int8s+pallas+large
runt 1200 python bench.py 32 40 int8s+pallas+s2d
# accuracy at the REAL duplo scale (vgg_small, 800x450) on hardware:
# ~3 min of training at the measured 16 steps/s + eval/demo compiles
# chunked (16 steps/dispatch) + auto-resume from /tmp/acc_duplo2/partial.ckpt:
# a tunnel flap mid-run only loses the last <=160 steps, and the queue
# retries until the run completes
runt 1500 python scripts/train_synthetic_eval.py --scale duplo --steps 2500 --images 200 --out /tmp/acc_duplo2 --chunk 16 --snapshot-every 160

# exit 0 ONLY if every step is done or retired — otherwise the watcher
# must keep watching (a mid-run tunnel flap previously lost steps forever)
missing=0
for k in "${ALLKEYS[@]}"; do
  if ! grep -qx "$k" $DONE && [ "$(grep -cx "$k" $FAILS)" -lt 3 ]; then
    echo "incomplete: $k"
    missing=1
  fi
done
exit $missing
