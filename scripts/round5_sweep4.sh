#!/bin/bash
# Round-5 TPU queue, part 4: flagship batch-knee re-check under the NEW
# default compiler options (svmem64 + bundle-aware fusion cost model) —
# the fusion-decision change could have moved the round-4 knee (12).
# ONE TPU process at a time with settle sleeps (CLAUDE.md tunnel rules).
set -u
cd "$(dirname "$0")/.."
LOGS=artifacts/r5_sweep_logs
mkdir -p "$LOGS"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $(date -u +%H:%M:%S) START $name" | tee -a "$LOGS/queue.log"
  timeout "$t" "$@" > "$LOGS/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) DONE  $name rc=$rc" | tee -a "$LOGS/queue.log"
  sleep 45
}

run flagship_batch_10 2400 env RGIE_BENCH_BATCH=10 python bench.py
run flagship_batch_14 2400 env RGIE_BENCH_BATCH=14 python bench.py
run flagship_batch_16 2400 env RGIE_BENCH_BATCH=16 python bench.py

echo "=== $(date -u +%H:%M:%S) SWEEP4 ALL DONE" | tee -a "$LOGS/queue.log"
