#!/bin/bash
# Round-5 perf A/B sidecar. Waits for the round5 queue's bench_r5 stage to
# finish (or 15 min after first tunnel contact), then HOLDs the queue and
# measures the two levers landed this session:
#   1. block0_2conv luminance slab stores  -> vgg_large duplo-bucket and
#      imagenet-envelope benches (baselines: 720.84 / 613.1 img/s).
#   2. s8-pooled int8 serving (+s8p)       -> vgg_small headline bench
#      (baseline: 1156.59-1177 img/s).
# Results append to scripts/tpu_results.log + docs/tpu_results_r05.log and
# are committed. Queue resumes when HOLD is removed at the end.
set -u
cd /root/repo
mkdir -p runs/r5ab
LOCK=runs/r5ab/lock
exec 8>"$LOCK"
flock -n 8 || { echo "round5_ab already running" >&2; exit 1; }
echo $$ > runs/r5ab/pid
LOG=scripts/round5_ab.log
log(){ echo "[$(date '+%F %T')] $*" >> "$LOG"; }

log "=== round5 A/B sidecar start (pid $$) ==="

# trigger: bench_r5 done, or 15 min after first tunnel contact (covers a
# failed bench stage), or queue already gone
while true; do
  [ -f runs/r5/bench_r5.done ] && { log "trigger: bench_r5.done"; break; }
  if [ -f runs/r5/t0 ]; then
    T0=$(cat runs/r5/t0)
    [ "$(date +%s)" -ge $((T0 + 900)) ] && { log "trigger: t0+15min"; break; }
  fi
  if [ -f runs/r5/queue.pid ] && ! kill -0 "$(cat runs/r5/queue.pid)" 2>/dev/null; then
    log "trigger: queue process gone"; break
  fi
  sleep 60
done

touch runs/r5/HOLD
log "HOLD placed"

# if a queue training attempt is mid-flight, wait for the chip to free up:
# watch for the queue's python child to exit (bounded 70 min)
QPID=$(cat runs/r5/queue.pid 2>/dev/null || echo 0)
for i in $(seq 1 70); do
  if [ "$QPID" != 0 ] && pgrep -P "$QPID" -x python >/dev/null 2>&1; then
    sleep 60
  else
    break
  fi
done

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
  [ -f "runs/r5ab/$name.done" ] && { log "skip $name"; return 0; }
  log "start $name: bench $b $it $mode"
  local out
  out=$(timeout 2400 env FRCNN_BENCH_HEALTH_ATTEMPTS=0 python bench.py "$b" "$it" "$mode" 2>>"$LOG")
  record "$name" "$(echo "$out" | grep '^{"metric"' | tail -1)" \
    && touch "runs/r5ab/$name.done"
}

# health gate once
if ! timeout 90 python -c "import jax, jax.numpy as j
print(float(j.arange(8.).sum()))" >/dev/null 2>&1; then
  log "tunnel down at A/B start; waiting up to deadline via 2-min probes"
  while ! timeout 90 python -c "import jax, jax.numpy as j
print(float(j.arange(8.).sum()))" >/dev/null 2>&1; do
    sleep 120
  done
fi
log "tunnel up; measuring"

# 1. slab-store A/B on vgg_large (the lever's home envelope first)
ab large_imagenet_slab 16 40 "imagenet+int8s+pallas+s2d"
ab large_duplo_slab 16 40 "int8s+pallas+s2d+large"
# 2. s8-pooled serving on the vgg_small headline
ab small_s8p 32 20 "int8s+pallas+s2d+s8p"
# 3. control: plain headline re-measure in the same window (day-to-day
#    jitter reference for 1+2)
ab small_headline_ctl 32 20 "int8s+pallas+s2d"

git add docs/tpu_results_r05.log >>"$LOG" 2>&1
git commit -q -m "Record round-5 A/B measurements (slab-store block0, s8-pooled serving)" \
  -m "No-Verification-Needed: measurement log only, no code change" \
  >>"$LOG" 2>&1 || log "nothing to commit"

rm -f runs/r5/HOLD
log "HOLD removed; sidecar done"
touch runs/r5ab/DONE
