#!/bin/bash
# Round-3 perf session 5: the boundary-samples lever. steady_bg_off
# measured the fg-only steady step at 92.9 ms (88.1k rays/s), above the
# 81.9 ms needed for 100k — so BG_SAMPLES alone cannot reach the target;
# the 10 boundary samples (reference renderer.py:549-567, added outside
# the surface band "to ensure boundary doesn't have noisy surface") are
# the remaining fg lever. Quality gating runs separately
# (exp_bg_samples_ablation.py --boundary_samples).
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
OUT=${1:-/tmp/r3_sweep4.jsonl}
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

run bg4_bd4 3000 NW_BENCH_PHASE=steady \
  NW_BENCH_CFG="TPU.BG_SAMPLES=4;NEUCONW.BOUNDARY_SAMPLES=4"
run bg4_bd2 3000 NW_BENCH_PHASE=steady \
  NW_BENCH_CFG="TPU.BG_SAMPLES=4;NEUCONW.BOUNDARY_SAMPLES=2"
# boundary lever alone (no bg reduction), to decompose the two
run bd4_only 3000 NW_BENCH_PHASE=steady \
  NW_BENCH_CFG="NEUCONW.BOUNDARY_SAMPLES=4"
# the candidate production point through the scan-dispatch loop
run bg4_bd4_scan 3000 NW_BENCH_PHASE=steady NW_BENCH_DISPATCH=scan \
  NW_BENCH_CFG="TPU.BG_SAMPLES=4;NEUCONW.BOUNDARY_SAMPLES=4"

echo DONE >> "$OUT"
