#!/bin/bash
# Round-5 post-queue sidecar: secondary measurements that must not steal
# chip time from the photo50k/imagenet campaigns. Triggers when the main
# queue is COMPLETE, its process is gone, or the session deadline passes.
set -u
cd /root/repo
mkdir -p runs/r5post
exec 8>runs/r5post/lock
flock -n 8 || { echo "round5_post already running" >&2; exit 1; }
echo $$ > runs/r5post/pid
LOG=scripts/round5_post.log
log(){ echo "[$(date '+%F %T')] $*" >> "$LOG"; }
DEADLINE=${R5_POST_TRIGGER:-$(date -d '2026-08-20 20:29:00' +%s)}

log "=== round5 post sidecar start (pid $$) ==="
while true; do
  [ -f runs/r5/QUEUE_DONE ] && { log "trigger: QUEUE_DONE"; break; }
  if [ -f runs/r5/queue.pid ] && ! kill -0 "$(cat runs/r5/queue.pid)" 2>/dev/null; then
    log "trigger: queue process gone"; break
  fi
  [ "$(date +%s)" -ge "$DEADLINE" ] && { log "trigger: deadline"; break; }
  sleep 120
done

# pause whatever the queue might still be doing
touch runs/r5/HOLD
QPID=$(cat runs/r5/queue.pid 2>/dev/null || echo 0)
for i in $(seq 1 90); do
  if [ "$QPID" != 0 ] && pgrep -P "$QPID" -x python >/dev/null 2>&1; then
    sleep 60
  else break; fi
done

wait_tpu(){
  while ! timeout 90 python -c "import jax, jax.numpy as j
print(float(j.arange(8.).sum()))" >/dev/null 2>&1; do
    log "tunnel down; probing"; sleep 120
  done
}

record(){ # record NAME JSON_LINE -> rc 0 only for a CLEAN measurement
  local name=$1 json=$2
  [ -n "$json" ] || { log "$name: no JSON"; return 1; }
  echo "$json" >> "$LOG"
  if echo "$json" | grep -q '"error"'; then
    log "$name: errored measurement (no marker)"; return 1
  fi
  echo "$json" >> scripts/tpu_results.log
  echo "$json" >> docs/tpu_results_r05.log
}

ab(){ # ab NAME BATCH ITERS MODE
  local name=$1 b=$2 it=$3 mode=$4
  [ -f "runs/r5post/$name.done" ] && { log "skip $name"; return 0; }
  wait_tpu
  log "start $name: bench $b $it $mode"
  local out
  out=$(timeout 2400 env FRCNN_BENCH_HEALTH_ATTEMPTS=0 python bench.py "$b" "$it" "$mode" 2>>"$LOG")
  record "$name" "$(echo "$out" | grep '^{"metric"' | tail -1)" \
    && touch "runs/r5post/$name.done"
}

stage(){ # stage NAME TIMEOUT CMD...
  local name=$1 tmo=$2; shift 2
  [ -f "runs/r5post/$name.done" ] && { log "skip $name"; return 0; }
  wait_tpu
  log "start $name: $*"
  if timeout "$tmo" "$@" >> "$LOG" 2>&1; then
    touch "runs/r5post/$name.done"; log "done $name"
  else
    log "FAIL $name rc=$?"
  fi
}

# 1. s8p on the vgg_large family (the headline A/B showed +8.2% on
#    vgg_small; these fill the family table)
ab large_duplo_s8p 16 40 "int8s+pallas+s2d+large+s8p"
ab large_imagenet_s8p 16 40 "imagenet+int8s+pallas+s2d+s8p"
# 2. headline at batch 16 (b16-vs-b32 check at the new operating point)
ab small_s8p_b16 16 60 "int8s+pallas+s2d+s8p"
# 3. stage attribution: tailparts at both envelopes (slab-store b0 delta;
#    also diagnoses the 566-vs-613 imagenet bench/profile gap)
stage tailparts_small 3600 python scripts/profile_detect.py 16 60 \
  tailparts mode=int8s+pallas+s2d+s8p
stage tailparts_imagenet 3600 env FRCNN_PROFILE_HW=480x1000 \
  python scripts/profile_detect.py 16 40 tailparts mode=int8s+pallas+s2d+large
# 4. parity of the shipped serving default at the best photo checkpoint
PCK=""
if [ -f runs/acc_photo/final.ckpt ]; then PCK=final.ckpt;
elif [ -f runs/acc_photo/partial.ckpt ]; then PCK=partial.ckpt; fi
if [ -n "$PCK" ]; then
  stage parity_s8p 7200 python scripts/eval_quant_parity.py \
    --run runs/acc_photo --scale photo --eval-count 240 \
    --modes bf16,int8_static_s2d,int8_static_s2d_s8p \
    --ckpt "$PCK" --out quant_parity_s8p.json
  if [ -f runs/acc_photo/quant_parity_s8p.json ]; then
    cp -f runs/acc_photo/quant_parity_s8p.json \
      docs/accuracy/photo_r5_quant_parity_s8p.json
  fi
fi

git add docs/tpu_results_r05.log docs/accuracy 2>>"$LOG"
git commit -q -m "Round-5 post-queue measurements (s8p family benches, stage profiles, s8p parity)" \
  -m "No-Verification-Needed: measurement artifacts only, no code change" \
  >>"$LOG" 2>&1 || log "nothing to commit"

rm -f runs/r5/HOLD
log "post sidecar done"
touch runs/r5post/DONE
