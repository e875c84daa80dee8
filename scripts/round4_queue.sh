#!/bin/bash
# Round-4 TPU queue: parity re-measure of the fixed int8s+s2d mode, bench
# sanity, vgg_large imagenet-envelope ceiling profile, photo 12.5k -> 50k
# continuation, clean imagenet e2e, then converged-checkpoint evals
# (parity table / gate sweep / recall attribution).
#
# Hygiene (round-3 lessons, ADVICE #3/#4):
#  - flock single-instance guard: a second launch exits immediately.
#  - markers under runs/r4 (survive box restarts; /tmp does not).
#  - tunnel wait logs a heartbeat (no silent hangs).
#  - training stages are retry-until-done with a cap (resume via
#    partial.ckpt), bounded by a GLOBAL deadline so the chip is free for
#    the driver's end-of-round bench.
#  - NEVER run CPU-heavy work (pytest) concurrently with measurement
#    stages: 1 core.
set -u
cd /root/repo
mkdir -p runs/r4
LOCK=runs/r4/queue.lock
exec 9>"$LOCK"
if ! flock -n 9; then
  echo "another round4_queue holds $LOCK; refusing to double-start" >&2
  exit 1
fi
echo $$ > runs/r4/queue.pid
LOG=scripts/round4_queue.log
M=runs/r4
DEADLINE=${R4_DEADLINE:-$(( $(date +%s) + 10*3600 ))}   # default: +10h

log(){ echo "[$(date '+%F %T')] $*" >> "$LOG"; }

past_deadline(){ [ "$(date +%s)" -ge "$DEADLINE" ]; }

wait_tpu(){
  while true; do
    if timeout 90 python -c "import jax, jax.numpy as j
print(float(j.arange(8.).sum()))" >/dev/null 2>&1; then
      log "tunnel UP"; return 0
    fi
    log "still waiting for TPU tunnel..."
    past_deadline && { log "deadline passed while waiting"; return 1; }
    sleep 120
  done
}

# stage NAME TIMEOUT_S CMD... — once-only via marker; logs rc on failure.
stage(){
  local name=$1 tmo=$2; shift 2
  [ -f "$M/$name.done" ] && { log "skip $name (done)"; return 0; }
  past_deadline && { log "skip $name (deadline)"; return 1; }
  wait_tpu || return 1
  log "start $name: $*"
  if timeout "$tmo" "$@" >> "$LOG" 2>&1; then
    touch "$M/$name.done"; log "done $name"; return 0
  fi
  log "FAIL $name rc=$?"
  return 1
}

# retry_stage NAME TIMEOUT_S MAX_TRIES CMD... — for resumable training:
# each attempt resumes from partial.ckpt; success = the command exits 0.
retry_stage(){
  local name=$1 tmo=$2 max=$3; shift 3
  [ -f "$M/$name.done" ] && { log "skip $name (done)"; return 0; }
  local i=0
  while [ $i -lt "$max" ]; do
    past_deadline && { log "abandon $name (deadline, attempt $i)"; return 1; }
    wait_tpu || return 1
    i=$((i+1))
    log "start $name attempt $i/$max: $*"
    if timeout "$tmo" "$@" >> "$LOG" 2>&1; then
      touch "$M/$name.done"; log "done $name (attempt $i)"; return 0
    fi
    log "retry $name rc=$? (attempt $i)"
    sleep 60
  done
  log "FAIL $name after $max attempts"
  return 1
}

log "=== round4 queue start (pid $$, deadline $(date -d @$DEADLINE '+%F %T')) ==="

# 1. Parity re-measure of the FIXED headline mode (VERDICT #1): eval-only.
stage parity_fixed 10800 python scripts/eval_quant_parity.py \
  --run runs/acc_photo --scale photo --eval-count 240 \
  --modes bf16,int8_static,int8_static_s2d --out quant_parity_fixed.json

# 2. Headline bench sanity after the calibration change (same program,
#    fresh r4 number).
stage bench_sanity 3600 python bench.py

# 3. vgg_large @ imagenet envelope ceiling profile (VERDICT #6).
stage large_tail 7200 env FRCNN_PROFILE_HW=480x1000 \
  python scripts/profile_detect.py 16 40 tailparts mode=int8s+pallas+s2d+large
stage large_fwdparts 7200 env FRCNN_PROFILE_HW=480x1000 \
  python scripts/profile_detect.py 16 40 fwdparts mode=int8s+large

# 4. Photo continuation 12.5k -> 50k (VERDICT #3; reference schedule
#    main.lua:126-150 is 50k). Resumes from runs/acc_photo/partial.ckpt.
retry_stage photo50k 28800 40 python scripts/train_synthetic_eval.py \
  --scale photo --steps 50000 --out runs/acc_photo \
  --named-snapshot-every 12500 --eval-count 240

# 5. Clean imagenet e2e (VERDICT #5): fresh dir (the old one is
#    race-tainted), one owner (this queue), resumable.
retry_stage imagenet_e2e 21600 30 python scripts/train_synthetic_eval.py \
  --scale imagenet --steps 8000 --out runs/acc_imagenet_r4 \
  --named-snapshot-every 2000 --eval-count 60

# 6. Converged-checkpoint evals (VERDICT #7 + #3 diagnostics) — only
#    meaningful if photo50k completed.
if [ -f "$M/photo50k.done" ]; then
  stage parity_50k 14400 python scripts/eval_quant_parity.py \
    --run runs/acc_photo --scale photo --eval-count 240 \
    --modes bf16,int8_dynamic,int8_static,int8_static_s2d \
    --out quant_parity_50k.json
  stage gate_sweep_50k 7200 python scripts/sweep_conf_gate.py \
    --run runs/acc_photo --scale photo --eval-count 240
  stage recall_attr_50k 14400 python scripts/recall_attribution.py \
    --run runs/acc_photo --scale photo --eval-count 240
fi

log "=== round4 queue COMPLETE ==="
touch "$M/QUEUE_DONE"
