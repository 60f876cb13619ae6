#!/bin/bash
# Round-5 measurement queue (runs unattended on the chip, AFTER the
# ablation decision wave releases it).
#
# Prereq: the operating-point decision is settled (config/train_*_tpu.yaml
# matches the wave outcome) — cells 2-4 read/mirror that artifact.
# Launch detached:
#   setsid nohup bash scripts/exp_r5_chip_queue.sh > /tmp/chip_queue_r5.log 2>&1 &
#
# Cells, in value order:
#   1. prep_bench_scene          — build the realistic-geometry artifacts
#      OUTSIDE the bench window (bench.py no longer builds in-window) and
#      copy the read-path assets into the repo for the driver run.
#   2. bench.py full default     — the driver-contract headline with the
#      shipped operating point MEASURED (BD6 was estimate-only through
#      round 4); record kept under docs/ for BENCHMARKS.md.
#   3. render bench              — serving surface: chunk sweep x
#      {op, reference} budgets + whole-frame scan cell -> docs/.
#   4. profile at the op point   — 10-step trace for the steady
#      step-time decomposition at the measured operating point.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_compcache
# keep in sync with config/train_*_tpu.yaml (the profiler cell takes the
# operating point via NW_BENCH_CFG, not the YAML)
NW_OP_CFG="${NW_OP_CFG:-TPU.BG_SAMPLES=8;TPU.BOUNDARY_SAMPLES=6}"

echo "== [1/4] prep bench scene (build outside the bench window) =="
timeout 3600 python scripts/prep_bench_scene.py --copy_assets 2>&1 | tail -5
echo "== [2/4] bench.py full default =="
timeout 1800 python bench.py 2>&1 | tee /tmp/bench_r5_raw.log | tail -8
grep '^{' /tmp/bench_r5_raw.log | tail -1 > docs/bench_r5_measured.json || true
echo "== [3/4] render bench (serving: chunk sweep + frame scan) =="
timeout 5400 python scripts/exp_render_bench.py \
  --chunks 512,4096,16384,65536 2>&1 | tee /tmp/render_bench_r5_raw.log | tail -40
grep '^{' /tmp/render_bench_r5_raw.log > docs/render_bench_r5.jsonl || true
echo "== [4/4] profile at the operating point =="
NW_PROFILE_PHASE=steady NW_BENCH_CFG="$NW_OP_CFG" \
  timeout 1800 python scripts/exp_profile_step.py /tmp/nw_profile_r5 10 \
  2>&1 | tail -40
echo "== queue done =="
