#!/bin/bash
# Round-3 perf session 3: batch-16384 retry with FULL remat (the
# dots_saveable policy OOM'd: 510 MB bf16 jvp temps at 557k pts), and
# the BG_SAMPLES=4 combinations. Persistent compile cache as before.
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
OUT=${1:-/tmp/r3_sweep2.jsonl}
PREV=${2:-}
: > "$OUT"

if [ -n "$PREV" ]; then
  while [ -f "$PREV" ] && ! grep -q DONE "$PREV"; do sleep 20; done
fi

run() {
  local tag="$1" tmo="$2"; shift 2
  echo "=== $tag ===" >&2
  local t0=$SECONDS
  local line
  line=$(env "$@" timeout "$tmo" python bench.py 2>/tmp/r3_bench_err_$tag.log | tail -1)
  echo "{\"tag\": \"$tag\", \"wall_s\": $((SECONDS-t0)), \"result\": ${line:-null}}" >> "$OUT"
  echo "$tag -> $line" >&2
}

# batch 16384, full remat (store nothing across the field boundary)
run b16384_fullremat 3600 NW_BENCH_PHASE=steady NW_BENCH_BATCH=16384 \
  NW_BENCH_CFG="TPU.REMAT_FIELD=true"

# the combination candidate for the new default operating point
run b16384_fullremat_bg4 3600 NW_BENCH_PHASE=steady NW_BENCH_BATCH=16384 \
  NW_BENCH_CFG="TPU.REMAT_FIELD=true;TPU.BG_SAMPLES=4"

# batch 8192 full remat: does recompute pay for itself at the current point?
run b8192_fullremat 3000 NW_BENCH_PHASE=steady \
  NW_BENCH_CFG="TPU.REMAT_FIELD=true"

# forward-mode per-sample gradients at the BG4 operating point
run bg4_fwdgrad 3000 NW_BENCH_PHASE=steady \
  NW_BENCH_CFG="TPU.BG_SAMPLES=4;TPU.SDF_GRAD_MODE=fwd"

echo DONE >> "$OUT"
