#!/bin/bash
# Round-3 TPU perf measurement queue (VERDICT items 5, 6, 8 + BENCH_r03
# rehearsal). Waits for the accuracy queue (round3_acc_queue.sh) to finish
# so the two never contend for the single chip, then measures:
#   1. headline best-chain bench (batch 32),
#   2. vgg_large with the fused 2-conv s2d frontend (item 5: target >=700
#      img/s) plus the no-s2d variant for the kernel's isolated delta,
#   3. vgg_large at the imagenet 480x1000 envelope (item 8),
#   4. train step with the Pallas first-max pool backward, batch 8 + 16
#      (item 6: target <=45 ms/batch-8),
#   5. a short imagenet-scale train->evaluate (dual compile buckets,
#      portrait+landscape, vgg_large) — end-to-end proof at scale.
# Each stage drops a marker in /tmp/r3perf/ so tunnel flaps resume where
# they left off. Health policy: one check per outer iteration (round-2
# lesson: the backend refuses fresh connections ~1-3 min after a drop).
# Launch detached:  nohup bash scripts/round3_perf_queue.sh & echo $! > /tmp/perf3.pid
cd "$(dirname "$0")/.."
LOG=scripts/round3_perf.log
MARK=runs/r3perf
mkdir -p $MARK
export PYTHONUNBUFFERED=1
export FRCNN_BENCH_HEALTH_ATTEMPTS=0

say() { echo "$(date +%H:%M:%S) $*" >> $LOG; }
say "=== round3 perf queue started (runs FIRST; acc queue waits on ALL_DONE)"

# bench stages: name | cmd
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

  # quick viability probe first: Mosaic int8 dot (informs whether the
  # parked int8-conv-kernel ceiling math in docs/perf_ceiling.md changes)
  if [ ! -f $MARK/int8dot ]; then
    say "stage int8dot: probe_int8_dot"
    if timeout 1200 python scripts/probe_int8_dot.py 1024 1024 1024 40 >> $LOG 2>&1; then
      touch $MARK/int8dot; say "stage int8dot DONE"
    else
      say "stage int8dot failed; retry"; sleep 90; continue
    fi
  fi

  run_bench_stage best32          python bench.py 32 40 best || { sleep 90; continue; }
  run_bench_stage large_s2d       python bench.py 16 40 large+int8s+pallas+s2d || { sleep 90; continue; }
  run_bench_stage large_s2d_b0bf16 python bench.py 16 40 large+int8s+pallas+s2d+b0bf16 || { sleep 90; continue; }
  run_bench_stage large_nos2d     python bench.py 16 40 large+int8s+pallas || { sleep 90; continue; }
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

  # bounded measurement stages done -> release the chip to the accuracy
  # queue NOW (the elastic imagenet e2e train would otherwise delay the
  # VERDICT-priority accuracy evidence by >1h)
  touch $MARK/ALL_DONE
  say "=== round3 perf queue: bounded stages DONE (acc queue unblocked)"
done

# short imagenet-scale end-to-end: dual buckets (480x1000 landscape +
# 1000x480 portrait), vgg_large, train -> eval -> demos. Resumable via
# partial.ckpt like the accuracy queue. Runs AFTER the accuracy queue so
# the two never contend for the single chip.
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
  say "=== round3 perf queue FULLY DONE (imagenet e2e artifacts published)"
done
