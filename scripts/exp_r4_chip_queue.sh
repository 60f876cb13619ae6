#!/bin/bash
# Round-4 post-ablation measurement queue (runs unattended on the chip).
#
# Prereq: the operating-point decision is committed (config/train_*_tpu.yaml
# holds the ablation-validated budgets) — cell 1 reads that artifact, and
# NW_OP_CFG below must mirror it for the profiler cell.
# Launch detached:
#   setsid nohup bash scripts/exp_r4_chip_queue.sh > /tmp/chip_queue_r4.log 2>&1 &
#
# Cells, in value order (later ones are optional probes):
#   1. bench.py full default       — the driver-contract headline incl. the
#      realistic-geometry scene phase on the real chip (first time) and the
#      bf16 feat head (efade77), both previously CPU-only.
#   2. render bench (ours, TPU)    — serving surface: chunk sweep x
#      {op, reference} budgets, warmup + steady phases, plus the
#      whole-frame single-dispatch scan cell (JSON lines -> docs/).
#   3. profile at the op point     — 10-step jax.profiler trace for the
#      BENCHMARKS.md steady decomposition at the final operating point.
#   4. XLA device-flag sweep       — relative probes (exp_r4_flag_sweep.sh).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_compcache
# keep in sync with config/train_*_tpu.yaml (the profiler cell takes the
# operating point via NW_BENCH_CFG, not the YAML)
NW_OP_CFG="${NW_OP_CFG:-TPU.BG_SAMPLES=4;TPU.BOUNDARY_SAMPLES=6}"

echo "== [1/4] bench.py full default =="
# first run pays the scene-phase setup (300-step training + extraction,
# cached under /root/nw_bench_scene for repeats) — give it headroom
timeout 5400 python bench.py 2>&1 | tail -20
echo "== [2/4] render bench (ours: chunk sweep + frame scan) =="
timeout 5400 python scripts/exp_render_bench.py \
  --chunks 512,4096,16384,65536 2>&1 | tee /tmp/render_bench_r4_raw.log | tail -40
grep '^{' /tmp/render_bench_r4_raw.log > docs/render_bench_r4.jsonl || true
echo "== [3/4] profile at the operating point =="
NW_PROFILE_PHASE=steady NW_BENCH_CFG="$NW_OP_CFG" \
  timeout 1800 python scripts/exp_profile_step.py /tmp/nw_profile_r4 10 \
  2>&1 | tail -40
echo "== [4/4] XLA flag sweep =="
bash scripts/exp_r4_flag_sweep.sh 2>&1 | tail -40
echo "== queue done =="
