#!/bin/bash
# Round-3 accuracy evidence queue (VERDICT items 3, 4, 9):
#   1. photo-scale training to 12.5k steps — real-photo backgrounds, 960
#      images (240-image validation split), restart-until-done: each
#      attempt resumes runs/acc_photo/partial.ckpt, so a tunnel flap or a
#      stale RPC (killed by the per-attempt timeout) costs <=160 steps.
#      12.5k not 25k: the duplo curve plateaus by 12.5k (0.43/0.39/0.45 at
#      12.5/25/50k is noise) and the shorter schedule lets the parity eval
#      and gate sweep finish in the same session,
#   2. serving-mode parity eval (bf16 / int8 / int8s / int8s+pallas+s2d),
#   3. confidence-gate sensitivity sweep.
# The outer loop keeps retrying every stage until $OUT/QUEUE_DONE exists.
# Launch detached:  nohup bash scripts/round3_acc_queue.sh & echo $! > /tmp/acc3.pid
# Health policy (round-2 lesson): check once per outer iteration; the
# backend refuses fresh connections ~1-3 min after a disconnect, so no
# per-step checks.
cd "$(dirname "$0")/.."
LOG=scripts/round3_acc.log
OUT=runs/acc_photo
TRAIN_ARGS="--scale photo --steps 12500 --images 960 --out $OUT --chunk 16
  --snapshot-every 160 --named-snapshot-every 5000 --eval-count 240
  --demo-count 6"
export PYTHONUNBUFFERED=1
export FRCNN_BENCH_HEALTH_ATTEMPTS=0

say() { echo "$(date +%H:%M:%S) $*" >> $LOG; }
say "=== round3 acc queue started (waits for perf queue ALL_DONE)"

# do not contend with the perf queue for the chip (perf runs first: it is
# bounded; training is elastic and can spill into the next session)
while [ ! -f runs/r3perf/ALL_DONE ]; do sleep 120; done
say "perf queue done; starting accuracy stages"

while [ ! -f $OUT/QUEUE_DONE ]; do
  if ! timeout 150 python -c "import jax, jax.numpy as j; print('tunnel ok', float(j.arange(8.).sum()))" >> $LOG 2>&1; then
    say "tunnel down; waiting"
    sleep 90
    continue
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

  # publish evidence into the tracked docs/ tree so it survives in git even
  # if the session ends before a manual copy
  DOCS=docs/accuracy
  cp -f $OUT/result.json $DOCS/photo_12500_result.json 2>/dev/null
  cp -f $OUT/quant_parity.json $DOCS/photo_12500_quant_parity.json 2>/dev/null
  cp -f $OUT/gate_sweep.json $DOCS/photo_12500_gate_sweep.json 2>/dev/null
  for f in $OUT/demo*.jpg; do
    [ -f "$f" ] || continue
    cp -f "$f" $DOCS/photo_12500_$(basename "$f")
  done
  touch $OUT/QUEUE_DONE
  say "=== round3 acc queue DONE (artifacts published to $DOCS)"
done
