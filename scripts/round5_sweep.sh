#!/bin/bash
# Round-5 serialized TPU measurement queue (VERDICT r4 #1 + #4):
#   1. GAN trace at the bench config (256px batch 4)
#   2. scoped-VMEM sweep on bench_gan   (default/48/64/96/128 MiB)
#   3. scoped-VMEM sweep on bench_diffusion (same values, SD-512 monolith)
#   4. flagship compiler-option A/B sweep (sweep_compiler_options.py)
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

# 1. GAN trace (bench config: 256px, batch 4)
run gan_trace 3000 python scripts/profile_param_edit.py --workload gan \
    --size 256 --batch 4 --steps 10 --logdir /tmp/rgie_trace_gan

# 2. Flagship compiler-option sweep EARLY: its outcome can change the
#    round-5 default in compileopts.py, so measure it before the
#    longer scoped-VMEM sweeps.
run flagship_copt_sweep 14400 python scripts/sweep_compiler_options.py --runs 2

# 3. GAN scoped-VMEM sweep
unset RGIE_SCOPED_VMEM_KIB
run gan_svmem_default 2400 python scripts/bench_gan.py --size 256 --batch 4
for kib in 49152 65536 98304 131072; do
  run "gan_svmem_$kib" 2400 \
      env RGIE_SCOPED_VMEM_KIB=$kib python scripts/bench_gan.py --size 256 --batch 4
done

# 4. Diffusion scoped-VMEM sweep (SD-512 monolith batch 2, block remat)
run diff_svmem_default 3600 python scripts/bench_diffusion.py \
    --scale sd --batch 2 --remat-mode block --runs 2
for kib in 49152 65536 98304 131072; do
  run "diff_svmem_$kib" 3600 \
      env RGIE_SCOPED_VMEM_KIB=$kib python scripts/bench_diffusion.py \
      --scale sd --batch 2 --remat-mode block --runs 2
done

echo "=== $(date -u +%H:%M:%S) ALL DONE" | tee -a "$LOGS/queue.log"
