#!/bin/bash
# Round-5 TPU queue, part 3 (runs after round5_sweep2.sh):
#   A/B the flagship sweep's one riser (bundle-aware fusion cost model) on
#   the OTHER two bench families, driven through the generic RGIE_XLA_OPTS
#   env lever (utils/compileopts.py) — which this run also validates
#   end-to-end on-chip: the bench rows must record the injected dict.
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

BUNDLE="xla_tpu_use_bundle_aware_cost_model_for_fusions=true"

run gan_bundle 2400 env RGIE_XLA_OPTS="$BUNDLE" \
    python scripts/bench_gan.py --size 256 --batch 4

run diff_bundle 3600 env RGIE_XLA_OPTS="$BUNDLE" \
    python scripts/bench_diffusion.py --scale sd --batch 2 --remat-mode block --runs 2

echo "=== $(date -u +%H:%M:%S) SWEEP3 ALL DONE" | tee -a "$LOGS/queue.log"
