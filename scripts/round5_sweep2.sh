#!/bin/bash
# Round-5 TPU queue, part 2 (runs after round5_sweep.sh):
#   GAN batch-knee probe at 256px (the bench row is batch 4 — the reference's
#   own edit granularity — but the flagship knee was 12; measure whether the
#   GAN path has unclaimed per-chip throughput at larger batches).
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

# -1. Retry the part-1 run that died to a transient tunnel error
#     ("response body closed before all bytes were read").
run gan_svmem_65536_retry 2400 \
    env RGIE_SCOPED_VMEM_KIB=65536 python scripts/bench_gan.py --size 256 --batch 4

# 0. Confirm the flagship sweep's one riser before adopting it as default:
#    bundle-aware fusion cost model measured 1.0821 vs svmem64's 1.0744
#    (+0.7%) on --runs 2; re-A/B both at --runs 4.
run copt_confirm 7200 python scripts/sweep_compiler_options.py --runs 4 \
    --only "svmem64,svmem64+bundle_cost_model"

for b in 8 12 16; do
  run "gan_batch_$b" 2400 python scripts/bench_gan.py --size 256 --batch "$b"
done

echo "=== $(date -u +%H:%M:%S) SWEEP2 ALL DONE" | tee -a "$LOGS/queue.log"
