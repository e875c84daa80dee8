#!/bin/bash
# Round-5 TPU queue. Addresses VERDICT-r4 items in priority order:
#  1. bench_r5    — non-zero BENCH_r05 evidence: the bench JSON line is
#                   appended to scripts/tpu_results.log AND committed as
#                   docs/tpu_results_r05.log so bench.py's outage hedge can
#                   always find the round's best measurement.
#  2. photo50k    — resume runs/acc_photo (~19.8k) to the reference's 50k
#                   schedule (main.lua:126-130), then the full evidence
#                   package: finalize + quant parity + gate sweep + recall
#                   attribution at the final checkpoint.
#  3. imagenet125 — continue runs/acc_imagenet_r4 from 3k to 12.5k steps
#                   (trainability evidence; duplo curve predicts mAP >=0.1).
#  5. large_fwdparts — vgg_large imagenet-envelope per-block profile.
#
# Differences from round4_queue.sh:
#  - Stage WINDOWS are anchored to the FIRST successful tunnel contact
#    (T0), not queue start: the tunnel was down at launch in rounds 3-5
#    and absolute windows silently closed before any chip time arrived.
#    The session deadline stays absolute.
#  - photo_finalize / imagenet_finalize re-run when the partial checkpoint
#    is NEWER than result.json (mtime), so a relaunched queue that trains
#    further re-finalizes instead of publishing stale results (ADVICE-r4).
#  - The stale imagenet final.ckpt (step 3000) is rotated into partial so
#    best_ckpt cannot prefer it over a fresher mid-continuation partial.
#
# Hygiene (unchanged): flock single-instance guard; markers runs/r5;
# HOLD file pauses before the next stage; NEVER edit this file while its
# bash instance runs — kill by PID (children inherit fd 9: find stray
# flock holders with ps -eo pid,ppid,args and kill by THEIR pid).
set -u
cd /root/repo
mkdir -p runs/r5 artifacts/ckpt docs/accuracy
LOCK=runs/r5/queue.lock
exec 9>"$LOCK"
if ! flock -n 9; then
  echo "another round5_queue holds $LOCK; refusing to double-start" >&2
  exit 1
fi
echo $$ > runs/r5/queue.pid
LOG=scripts/round5_queue.log
M=runs/r5
NOW=$(date +%s)
DEADLINE=${R5_DEADLINE:-$(( NOW + 33000 ))}   # default +9.2h (absolute)
PHOTO_WINDOW=${R5_PHOTO_WINDOW:-16200}        # 4.5h of chip time from T0
IMAGENET_WINDOW=${R5_IMAGENET_WINDOW:-27000}  # imagenet must START by T0+7.5h

log(){ echo "[$(date '+%F %T')] $*" >> "$LOG"; }
past(){ [ "$(date +%s)" -ge "$1" ]; }
past_deadline(){ past "$DEADLINE"; }

wait_hold(){
  while [ -f runs/r5/HOLD ]; do log "HOLD present; waiting"; sleep 60; done
}

T0FILE=runs/r5/t0
wait_tpu(){
  while true; do
    wait_hold
    if timeout 90 python -c "import jax, jax.numpy as j
print(float(j.arange(8.).sum()))" >/dev/null 2>&1; then
      if [ ! -f "$T0FILE" ]; then date +%s > "$T0FILE"; log "tunnel UP (T0 set)"; fi
      return 0
    fi
    log "still waiting for TPU tunnel..."
    past_deadline && { log "deadline passed while waiting"; return 1; }
    sleep 120
  done
}
t0(){ cat "$T0FILE" 2>/dev/null || date +%s; }
window_end(){ # window_end SECONDS -> min(DEADLINE, T0+SECONDS)
  local e=$(( $(t0) + $1 ))
  [ "$e" -lt "$DEADLINE" ] && echo "$e" || echo "$DEADLINE"
}

commit_snap(){
  local src=$1 dst=$2 msg=$3
  [ -f "$src" ] || return 0
  local sz; sz=$(stat -c %s "$src")
  [ "$sz" -lt 629145600 ] || { log "snap $src too big ($sz B); skip"; return 0; }
  cp "$src" "artifacts/ckpt/.tmp.$dst" && mv "artifacts/ckpt/.tmp.$dst" "artifacts/ckpt/$dst"
  if git add -f "artifacts/ckpt/$dst" >>"$LOG" 2>&1 && \
     git commit -q -m "$msg" \
       -m "No-Verification-Needed: binary training artifact, no code change" \
       >>"$LOG" 2>&1; then
    log "committed artifacts/ckpt/$dst ($sz B)"
  else
    log "snapshot commit FAILED for $dst (index busy?)"
  fi
}

restore_run(){
  local dir=$1 art=$2
  [ -f "$dir/partial.ckpt" ] && return 0
  [ -f "artifacts/ckpt/$art" ] || return 0
  mkdir -p "$dir"
  cp "artifacts/ckpt/$art" "$dir/partial.ckpt"
  log "restored $dir/partial.ckpt from artifacts/ckpt/$art"
}

best_ckpt(){
  local d=$1
  if [ -f "$d/final.ckpt" ]; then echo final.ckpt; return; fi
  if [ -f "$d/partial.ckpt" ]; then echo partial.ckpt; return; fi
  local s; s=$(ls "$d"/step_*.ckpt 2>/dev/null | sort | tail -1)
  [ -n "$s" ] && basename "$s"
}

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

train_stage(){ # NAME WINDOW_S ATTEMPT_TMO ARTNAME RUNDIR CMD...
  local name=$1 win=$2 tmo=$3 art=$4 dir=$5; shift 5
  [ -f "$M/$name.done" ] && { log "skip $name (done)"; return 0; }
  restore_run "$dir" "$art"
  local i=0
  while true; do
    local end; end=$(window_end "$win")
    if past "$end" || past_deadline; then
      log "window closed for $name (attempt $i); moving on"
      commit_snap "$dir/partial.ckpt" "$art" \
        "Rolling $name snapshot (restart-proofing)"
      return 1
    fi
    wait_tpu || return 1
    i=$((i+1))
    log "start $name attempt $i: $*"
    timeout "$tmo" "$@" >> "$LOG" 2>&1
    local rc=$?
    commit_snap "$dir/partial.ckpt" "$art" \
      "Rolling $name snapshot (restart-proofing)"
    if [ "$rc" -eq 0 ]; then
      touch "$M/$name.done"; log "done $name (attempt $i)"
      commit_snap "$dir/final.ckpt" "${art%.ckpt}_final.ckpt" \
        "Final $name checkpoint"
      return 0
    fi
    log "retry $name rc=$rc (attempt $i)"
    sleep 30
  done
}

log "=== round5 queue start (pid $$, deadline $(date -d @$DEADLINE '+%F %T'), photo window ${PHOTO_WINDOW}s from first tunnel contact) ==="

# 0. One-time prep: rotate the completed-at-3000 imagenet final.ckpt into
#    partial (it IS the freshest state) so the continuation resumes from
#    step 3000 and best_ckpt cannot pick the stale final mid-run. The 3000
#    state stays reachable as step_003000.ckpt + the committed artifact.
if [ ! -f "$M/prep.done" ]; then
  if [ -f runs/acc_imagenet_r4/final.ckpt ]; then
    mv -f runs/acc_imagenet_r4/final.ckpt runs/acc_imagenet_r4/partial.ckpt
    log "rotated imagenet final.ckpt (step 3000) -> partial.ckpt"
  fi
  restore_run runs/acc_photo photo_partial.ckpt
  restore_run runs/acc_imagenet_r4 imagenet_partial_final.ckpt
  touch "$M/prep.done"
fi

# 1. BENCH_r05 evidence (VERDICT-r4 #1). The JSON line goes to stdout ->
#    captured, appended to the live results log, snapshotted into docs/,
#    committed. bench.py already health-checks; 1 attempt is enough here
#    since wait_tpu just succeeded.
if [ ! -f "$M/bench_r5.done" ] && ! past_deadline; then
  wait_tpu && {
    log "start bench_r5"
    OUT=$(timeout 3600 env FRCNN_BENCH_HEALTH_ATTEMPTS=1 python bench.py 2>>"$LOG")
    echo "$OUT" >> "$LOG"
    JSON=$(echo "$OUT" | grep '^{"metric"' | tail -1)
    if [ -n "$JSON" ] && ! echo "$JSON" | grep -q '"error"'; then
      echo "$JSON" >> scripts/tpu_results.log
      echo "$JSON" >> docs/tpu_results_r05.log
      git add docs/tpu_results_r05.log >>"$LOG" 2>&1
      git commit -q -m "Record round-5 bench measurement" \
        -m "No-Verification-Needed: measurement log only, no code change" \
        >>"$LOG" 2>&1 || true
      touch "$M/bench_r5.done"; log "done bench_r5: $JSON"
    else
      log "bench_r5 produced no clean measurement: $JSON"
    fi
  }
fi

# 2. photo -> 50k (VERDICT-r4 #2), resuming the ~19.8k partial.
train_stage photo50k "$PHOTO_WINDOW" 3600 photo_partial.ckpt runs/acc_photo \
  python scripts/train_synthetic_eval.py --scale photo --steps 50000 \
  --images 960 --chunk 16 --out runs/acc_photo \
  --named-snapshot-every 12500 --eval-count 240

# 2b. Finalize at whatever step was reached — re-finalize whenever the
#     checkpoint is newer than result.json (ADVICE-r4 gating fix).
if [ -f runs/acc_photo/partial.ckpt ] || [ -f runs/acc_photo/final.ckpt ]; then
  if [ ! -f runs/acc_photo/result.json ] \
     || [ runs/acc_photo/partial.ckpt -nt runs/acc_photo/result.json ] \
     || [ runs/acc_photo/final.ckpt -nt runs/acc_photo/result.json ]; then
    rm -f "$M/photo_finalize.done"
    stage photo_finalize 7200 python scripts/train_synthetic_eval.py \
      --scale photo --steps 1 --images 960 --chunk 16 --out runs/acc_photo \
      --eval-count 240
  fi
fi

# 3. Evidence package at the best photo checkpoint (VERDICT-r4 #2/#3:
#    quant parity incl. the s2d residual adjudication, gate sweep, recall
#    attribution).
PCK=$(best_ckpt runs/acc_photo)
if [ -n "${PCK:-}" ]; then
  # final-session mode set: int8_dynamic dropped (adjudicated in r4),
  # serving-default s8-pooled chain added (what bench best/serving ship)
  stage parity_r5 14400 python scripts/eval_quant_parity.py \
    --run runs/acc_photo --scale photo --eval-count 240 \
    --modes bf16,int8_static,int8_static_s2d,int8_static_s2d_s8p \
    --ckpt "$PCK" --out quant_parity_r5.json
fi
publish

# 5. vgg_large imagenet-envelope fwd breakdown (VERDICT-r4 #5) — promoted
#    above gate sweep / recall attribution for the final short session.
stage large_fwdparts 7200 env FRCNN_PROFILE_HW=480x1000 \
  python scripts/profile_detect.py 16 40 fwdparts mode=int8s+large

if [ -n "${PCK:-}" ]; then
  stage gate_sweep_r5 7200 python scripts/sweep_conf_gate.py \
    --run runs/acc_photo --scale photo --eval-count 240 --ckpt "$PCK"
  stage recall_attr_r5 14400 python scripts/recall_attribution.py \
    --run runs/acc_photo --scale photo --eval-count 240 --ckpt "$PCK"
fi

publish(){
  local changed=0
  cp_if(){ [ -f "$1" ] && { cp -f "$1" "$2"; changed=1; }; }
  cp_if runs/acc_photo/result.json docs/accuracy/photo_r5_result.json
  cp_if runs/acc_photo/quant_parity_r5.json docs/accuracy/photo_r5_quant_parity.json
  cp_if runs/acc_photo/gate_sweep.json docs/accuracy/photo_r5_gate_sweep.json
  cp_if runs/acc_photo/recall_attribution.json docs/accuracy/photo_r5_recall_attribution.json
  for i in 1 2 3 4; do
    cp_if "runs/acc_photo/demo$i.jpg" "docs/accuracy/photo_r5_demo$i.jpg"
  done
  cp_if runs/acc_imagenet_r4/result.json docs/accuracy/imagenet_r5_result.json
  for i in 1 2 3 4; do
    cp_if "runs/acc_imagenet_r4/demo$i.jpg" "docs/accuracy/imagenet_r5_demo$i.jpg"
  done
  if [ "$changed" -eq 1 ]; then
    git add docs/accuracy >>"$LOG" 2>&1
    git commit -q -m "Accuracy artifacts: round-5 runs" \
      -m "No-Verification-Needed: artifact copies only, no code change" \
      >>"$LOG" 2>&1 && log "published docs/accuracy artifacts" \
      || log "publish commit FAILED (maybe nothing staged)"
  fi
}
publish

# 4. imagenet continuation 3000 -> 12500 (VERDICT-r4 #3). Window check:
#    only START if we're still inside the imagenet window (it trains until
#    the session deadline otherwise closes it).
if ! past "$(window_end "$IMAGENET_WINDOW")"; then
  train_stage imagenet125 "$IMAGENET_WINDOW" 3600 imagenet_partial.ckpt \
    runs/acc_imagenet_r4 \
    python scripts/train_synthetic_eval.py --scale imagenet --steps 12500 \
    --images 240 --chunk 8 --out runs/acc_imagenet_r4 \
    --named-snapshot-every 2500 --eval-count 60
else
  log "imagenet window already closed; skipping imagenet125"
fi

if [ -f runs/acc_imagenet_r4/partial.ckpt ] || [ -f runs/acc_imagenet_r4/final.ckpt ]; then
  if [ ! -f runs/acc_imagenet_r4/result.json ] \
     || [ runs/acc_imagenet_r4/partial.ckpt -nt runs/acc_imagenet_r4/result.json ] \
     || [ runs/acc_imagenet_r4/final.ckpt -nt runs/acc_imagenet_r4/result.json ]; then
    rm -f "$M/imagenet_finalize.done"
    stage imagenet_finalize 7200 python scripts/train_synthetic_eval.py \
      --scale imagenet --steps 1 --images 240 --chunk 8 \
      --out runs/acc_imagenet_r4 --eval-count 60
  fi
fi
publish

publish
log "=== round5 queue COMPLETE ==="
touch "$M/QUEUE_DONE"
