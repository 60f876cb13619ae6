#!/bin/bash
# Round-3 perf session 2: BG_SAMPLES sweep + the two round-2 abandoned
# cells (fused field kernel t256+vmem64M, batch 16384 + remat), with the
# persistent compilation cache so >15-min Mosaic compiles are paid once.
# Waits for the session-1 script (exp_r3_baseline.sh) to release the chip.
set -u
# pin the published round-3 protocol: these cells were measured at
# the parity budget BEFORE the TPU operating point became the bench
# default; without this a rerun at HEAD would measure (and mislabel)
# the operating point. The scene-geometry phase postdates them too.
export NW_BENCH_OPERATING_POINT=parity
export NW_BENCH_DISPATCH=single  # round-3 cells were measured pre-scan-default
export NW_BENCH_SCENE=0
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_compcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
OUT=${1:-/tmp/r3_sweep1.jsonl}
PREV=${2:-/tmp/r3_baseline.jsonl}
: > "$OUT"

while [ -f "$PREV" ] && ! grep -q DONE "$PREV"; do sleep 20; done

run() {
  local tag="$1" tmo="$2"; shift 2
  echo "=== $tag ===" >&2
  local t0=$SECONDS
  local line
  line=$(env "$@" timeout "$tmo" python bench.py 2>/tmp/r3_bench_err_$tag.log | tail -1)
  echo "{\"tag\": \"$tag\", \"wall_s\": $((SECONDS-t0)), \"result\": ${line:-null}}" >> "$OUT"
  echo "$tag -> $line" >&2
}

for k in 4 8 16; do
  run bg_samples_$k 3000 NW_BENCH_PHASE=steady NW_BENCH_CFG="TPU.BG_SAMPLES=$k"
done

# abandoned cell 1: batch 16384 + remat (steady). Long first compile OK.
run b16384_remat 3600 NW_BENCH_PHASE=steady NW_BENCH_BATCH=16384 \
  NW_BENCH_CFG="TPU.REMAT_FIELD=dots_saveable"

# abandoned cell 2: fused field kernel tile 256 + 64M scoped VMEM (steady)
run field_kernel_t256 3600 NW_BENCH_PHASE=steady \
  NW_BENCH_CFG="TPU.SDF_GRAD_MODE=pallas_field;TPU.KERNEL_TILE=256" \
  NW_BENCH_COMPILER_OPTS="xla_tpu_scoped_vmem_limit_kib=65536"

echo DONE >> "$OUT"
