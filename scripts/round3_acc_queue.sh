#!/bin/bash
# Round-3 accuracy evidence queue (VERDICT items 3, 4, 9):
#   1. bench sanity (the detector padding change must stay perf-neutral),
#   2. photo-scale training to 25k steps — real-photo backgrounds, 960
#      images (240-image validation split), restart-until-done: each
#      attempt resumes /tmp/acc_photo/partial.ckpt, so a tunnel flap or a
#      stale RPC (killed by the per-attempt timeout) costs <=160 steps,
#   3. serving-mode parity eval (bf16 / int8 / int8s / int8s+pallas+s2d),
#   4. confidence-gate sensitivity sweep.
# The outer loop keeps retrying every stage until $OUT/QUEUE_DONE exists.
# Launch detached:  nohup bash scripts/round3_acc_queue.sh & echo $! > /tmp/acc3.pid
# Health policy (round-2 lesson): check once per outer iteration; the
# backend refuses fresh connections ~1-3 min after a disconnect, so no
# per-step checks.
cd "$(dirname "$0")/.."
LOG=scripts/round3_acc.log
OUT=/tmp/acc_photo
TRAIN_ARGS="--scale photo --steps 25000 --images 960 --out $OUT --chunk 16
  --snapshot-every 160 --named-snapshot-every 5000 --eval-count 240
  --demo-count 6"
export PYTHONUNBUFFERED=1
export FRCNN_BENCH_HEALTH_ATTEMPTS=0

say() { echo "$(date +%H:%M:%S) $*" >> $LOG; }
say "=== round3 acc queue started"

while [ ! -f $OUT/QUEUE_DONE ]; do
  if ! timeout 150 python -c "import jax, jax.numpy as j; print('tunnel ok', float(j.arange(8.).sum()))" >> $LOG 2>&1; then
    say "tunnel down; waiting"
    sleep 90
    continue
  fi

  if [ ! -f /tmp/acc3_bench_done ]; then
    say "bench sanity (batch 32, best chain)"
    if timeout 1500 python bench.py 32 40 >> $LOG 2>&1 \
        && ! grep -q '"error"' <(tail -3 $LOG); then
      touch /tmp/acc3_bench_done
    else
      say "bench attempt failed; will retry next iteration"
      sleep 90
      continue
    fi
  fi

  if [ ! -f $OUT/result.json ]; then
    say "training attempt (resumes partial.ckpt if present)"
    timeout 4000 python scripts/train_synthetic_eval.py $TRAIN_ARGS >> $LOG 2>&1
    rc=$?
    if [ ! -f $OUT/result.json ]; then
      say "training attempt ended rc=$rc; retrying"
      sleep 90
      continue
    fi
    say "training COMPLETE"
  fi

  if [ ! -f $OUT/quant_parity.json ]; then
    say "serving parity eval"
    timeout 3600 python scripts/eval_quant_parity.py --run $OUT --scale photo \
        --eval-count 240 >> $LOG 2>&1 || { say "parity eval failed rc=$?"; sleep 90; continue; }
  fi

  if [ ! -f $OUT/gate_sweep.json ]; then
    say "confidence gate sweep"
    timeout 3600 python scripts/sweep_conf_gate.py --run $OUT --scale photo \
        --eval-count 240 >> $LOG 2>&1 || { say "gate sweep failed rc=$?"; sleep 90; continue; }
  fi

  touch $OUT/QUEUE_DONE
  say "=== round3 acc queue DONE"
done
