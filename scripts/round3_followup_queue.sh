#!/bin/bash
# Round-3 follow-up queue: replaces the tail of round3_perf2_queue.sh
# (killed by PID while it idled waiting for the acc queue) so the
# pool-backward A/B diagnosis runs BEFORE the long imagenet e2e, all
# serialized on the single chip:
#   1. isolated first-max kernel vs SelectAndScatter per backbone shape
#      (scripts/bench_pool_bwd.py) — the in-situ train profile regressed
#      49.7 -> 55.8 ms b8 / 95.8 -> 106.0 b16 with the kernel enabled,
#   2. A/B train profiles at identical HEAD via FRCNN_POOL_VJP=xla,
#   3. the imagenet-scale end-to-end from the perf2 queue (unchanged).
# Launch:  nohup bash scripts/round3_followup_queue.sh & echo $! > runs/follow3.pid
cd "$(dirname "$0")/.."
LOG=scripts/round3_followup.log
MARK=runs/r3follow
PERFMARK=runs/r3perf
mkdir -p $MARK
export PYTHONUNBUFFERED=1
export FRCNN_BENCH_HEALTH_ATTEMPTS=0

say() { echo "$(date +%H:%M:%S) $*" >> $LOG; }
say "=== round3 followup queue started (waits for acc QUEUE_DONE)"

while [ ! -f runs/acc_photo/QUEUE_DONE ]; do sleep 120; done
say "acc queue done; starting follow-up stages"

run_stage() { # $1 marker, $2 timeout, $3.. command
  local m=$1 t=$2; shift 2
  [ -f $MARK/$m ] && return 0
  say "stage $m: $*"
  if timeout "$t" "$@" >> $LOG 2>&1; then
    touch $MARK/$m
    say "stage $m DONE"
    return 0
  fi
  say "stage $m failed; will retry"
  return 1
}

while [ ! -f $MARK/ALL_DONE ]; do
  if ! timeout 150 python -c "import jax, jax.numpy as j; print('tunnel ok', float(j.arange(8.).sum()))" >> $LOG 2>&1; then
    say "tunnel down; waiting"
    sleep 90
    continue
  fi

  run_stage poolbwd_iso 2400 python scripts/bench_pool_bwd.py 30 8 || { sleep 90; continue; }
  run_stage train8_ss 2400 env FRCNN_POOL_VJP=xla python scripts/profile_train.py 8 20 step pallas || { sleep 90; continue; }
  run_stage train16_ss 2400 env FRCNN_POOL_VJP=xla python scripts/profile_train.py 16 20 step pallas || { sleep 90; continue; }
  # in-situ re-measure of the improved (4-roll) first-max kernel — the
  # 55.8/106.0 numbers in runs/r3perf were the 6-roll version
  run_stage train8_pk 2400 env FRCNN_POOL_VJP=pallas python scripts/profile_train.py 8 20 step pallas || { sleep 90; continue; }
  run_stage train16_pk 2400 env FRCNN_POOL_VJP=pallas python scripts/profile_train.py 16 20 step pallas || { sleep 90; continue; }

  # imagenet-scale e2e (moved verbatim from round3_perf2_queue.sh)
  if [ ! -f runs/acc_imagenet/result.json ]; then
    say "stage imagenet e2e: train_synthetic_eval --scale imagenet"
    timeout 5400 python scripts/train_synthetic_eval.py --scale imagenet \
      --steps 2000 --images 240 --out runs/acc_imagenet --chunk 8 \
      --snapshot-every 80 --eval-count 60 --demo-count 4 >> $LOG 2>&1
    if [ ! -f runs/acc_imagenet/result.json ]; then
      say "imagenet e2e attempt ended; retrying"; sleep 90; continue
    fi
  fi
  cp -f runs/acc_imagenet/result.json docs/accuracy/imagenet_2000_result.json 2>/dev/null
  for f in runs/acc_imagenet/demo*.jpg; do
    [ -f "$f" ] || continue
    cp -f "$f" docs/accuracy/imagenet_2000_$(basename "$f")
  done
  touch $PERFMARK/E2E_DONE
  touch $MARK/ALL_DONE
  say "=== round3 followup queue FULLY DONE"
done
