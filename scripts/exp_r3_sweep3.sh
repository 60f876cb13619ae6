#!/bin/bash
# Round-3 perf session 4: cheap remaining cells around the BG_SAMPLES=4
# operating point — intermediate batch sizes (8192 fits, 16384 OOMs
# without remat; does 10-12k amortize the ~16 ms of fixed work?) and
# the production scan dispatch.
set -u
# pin the published round-3 protocol: these cells were measured at
# the parity budget BEFORE the TPU operating point became the bench
# default; without this a rerun at HEAD would measure (and mislabel)
# the operating point. The scene-geometry phase postdates them too.
export NW_BENCH_OPERATING_POINT=parity
export NW_BENCH_SCENE=0
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_compcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
OUT=${1:-/tmp/r3_sweep3.jsonl}
: > "$OUT"

run() {
  local tag="$1" tmo="$2"; shift 2
  echo "=== $tag ===" >&2
  local t0=$SECONDS
  local line
  line=$(env "$@" timeout "$tmo" python bench.py 2>/tmp/r3_bench_err_$tag.log | tail -1)
  echo "{\"tag\": \"$tag\", \"wall_s\": $((SECONDS-t0)), \"result\": ${line:-null}}" >> "$OUT"
  echo "$tag -> $line" >&2
}

run bg4_b10240 3000 NW_BENCH_PHASE=steady NW_BENCH_BATCH=10240 \
  NW_BENCH_CFG="TPU.BG_SAMPLES=4"
run bg4_b12288 3000 NW_BENCH_PHASE=steady NW_BENCH_BATCH=12288 \
  NW_BENCH_CFG="TPU.BG_SAMPLES=4"
run bg4_scan 3000 NW_BENCH_PHASE=steady NW_BENCH_DISPATCH=scan \
  NW_BENCH_CFG="TPU.BG_SAMPLES=4"
run bg4_b12288_dots 3000 NW_BENCH_PHASE=steady NW_BENCH_BATCH=12288 \
  NW_BENCH_CFG="TPU.BG_SAMPLES=4;TPU.REMAT_FIELD=dots_saveable"

echo DONE >> "$OUT"
