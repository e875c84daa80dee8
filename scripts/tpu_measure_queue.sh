#!/bin/bash
# Sequential TPU measurement queue — run when the tunnel is healthy.
# Each step has its own timeout; results append to scripts/tpu_results.log.
cd "$(dirname "$0")/.."
LOG=scripts/tpu_results.log
run() {
  echo "=== $(date +%H:%M:%S) $*" | tee -a $LOG
  timeout 560 "$@" 2>&1 | grep -vE "WARNING|WARN |INFO " | tail -8 | tee -a $LOG
}
# health
timeout 90 python -c "import jax, jax.numpy as j; print('tunnel ok', float(j.arange(8.).sum()))" \
  || timeout 90 python -c "import jax, jax.numpy as j; print('tunnel ok', float(j.arange(8.).sum()))" \
  || { echo "tunnel down"; exit 1; }

# headline candidate: split-layout s2d frontend (Pallas block0 + planar norm)
run python bench.py 16 40 int8s+pallas+s2d
run python bench.py 16 40 int8s+pallas+s2d
run python scripts/profile_detect.py 16 60 s2dstages
run python scripts/bench_block0.py normparts 16 40
run python bench.py 32 40 int8s+pallas+s2d
run python scripts/profile_train.py 8 12 loss grad step
run python scripts/profile_detect.py 16 60 fwdparts mode=int8s
