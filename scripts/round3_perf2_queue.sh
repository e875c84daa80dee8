#!/bin/bash
# Round-3 perf queue, take 2: supersedes round3_perf_queue.sh (killed by
# PID mid-run to insert the zg-layout 2-conv kernel measurement BEFORE the
# accuracy queue takes the chip for hours). Shares runs/r3perf markers, so
# completed stages are not re-run. Usage:
#   nohup bash scripts/round3_perf2_queue.sh [wait_pid] & echo $! > runs/perf3.pid
# wait_pid: a still-running orphaned bench python from the killed queue —
# we wait for it to exit so two programs never contend for the chip.
cd "$(dirname "$0")/.."
LOG=scripts/round3_perf.log
MARK=runs/r3perf
mkdir -p $MARK
export PYTHONUNBUFFERED=1
export FRCNN_BENCH_HEALTH_ATTEMPTS=0

say() { echo "$(date +%H:%M:%S) $*" >> $LOG; }
say "=== round3 perf2 queue started (zg kernel measurement inserted)"

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do
    say "waiting for orphan bench pid $1"
    sleep 60
  done
fi

run_bench_stage() { # $1 marker, $2.. command
  local m=$1; shift
  [ -f $MARK/$m ] && return 0
  say "stage $m: $*"
  if timeout 2400 "$@" >> $LOG 2>&1 && ! tail -3 $LOG | grep -q '"error"'; then
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

  # the zg-layout 2-conv kernel (group-ordered conv1 stack, no rolls) is
  # now the default for mode large+int8s+pallas+s2d; the roll-layout
  # number for the same mode is the pre-edit large_s2d stage (654.56)
  run_bench_stage large_s2d_zg    python bench.py 16 40 large+int8s+pallas+s2d || { sleep 90; continue; }
  run_bench_stage large_bf16s2d   python bench.py 16 40 large+pallas+s2d || { sleep 90; continue; }
  run_bench_stage imagenet_s2d    python bench.py 16 20 imagenet+int8s+pallas+s2d || { sleep 90; continue; }

  if [ ! -f $MARK/train8 ]; then
    say "stage train8: profile_train 8 20 step pallas"
    if timeout 2400 python scripts/profile_train.py 8 20 step pallas >> $LOG 2>&1; then
      touch $MARK/train8; say "stage train8 DONE"
    else
      say "stage train8 failed; retry"; sleep 90; continue
    fi
  fi
  if [ ! -f $MARK/train16 ]; then
    say "stage train16: profile_train 16 20 step pallas"
    if timeout 2400 python scripts/profile_train.py 16 20 step pallas >> $LOG 2>&1; then
      touch $MARK/train16; say "stage train16 DONE"
    else
      say "stage train16 failed; retry"; sleep 90; continue
    fi
  fi

  touch $MARK/ALL_DONE
  say "=== round3 perf2 queue: bounded stages DONE (acc queue unblocked)"
done

# short imagenet-scale end-to-end after the accuracy queue finishes (never
# contend with it for the single chip)
say "waiting for acc queue QUEUE_DONE before imagenet e2e"
while [ ! -f runs/acc_photo/QUEUE_DONE ]; do sleep 120; done
while [ ! -f $MARK/E2E_DONE ]; do
  if ! timeout 150 python -c "import jax, jax.numpy as j; print('tunnel ok', float(j.arange(8.).sum()))" >> $LOG 2>&1; then
    say "tunnel down; waiting"
    sleep 90
    continue
  fi
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
  touch $MARK/E2E_DONE
  say "=== round3 perf2 queue FULLY DONE (imagenet e2e artifacts published)"
done
