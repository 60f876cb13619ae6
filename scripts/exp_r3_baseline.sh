#!/bin/bash
# Round-3 perf session 1: steady baseline + RENDER_BG-off bound.
# Serializes chip jobs (the tunneled TPU is single-claim).
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
OUT=${1:-/tmp/r3_baseline.jsonl}
: > "$OUT"

run() {
  local tag="$1"; shift
  echo "=== $tag ===" >&2
  local t0=$SECONDS
  local line
  line=$(env "$@" timeout 3000 python bench.py 2>/tmp/r3_bench_err.log | tail -1)
  echo "{\"tag\": \"$tag\", \"wall_s\": $((SECONDS-t0)), \"result\": ${line:-null}}" >> "$OUT"
  echo "$tag -> $line" >&2
}

# 1. baseline, both phases (confirm round-2 numbers)
run baseline_both NW_BENCH_PHASE=both

# 2. steady with background pass off: upper bound of the bg lever
run steady_bg_off NW_BENCH_PHASE=steady NW_BENCH_CFG="NEUCONW.RENDER_BG=false"

echo DONE >> "$OUT"
