#!/bin/bash
# Remat-policy sweep on the chip: both bench phases per config, serial
# (the pool is single-claim — never run two chip jobs concurrently).
# Usage: bash scripts/exp_remat_sweep.sh [outfile]
set -u
# pin the published round-3 protocol: these cells were measured at
# the parity budget BEFORE the TPU operating point became the bench
# default; without this a rerun at HEAD would measure (and mislabel)
# the operating point. The scene-geometry phase postdates them too.
export NW_BENCH_OPERATING_POINT=parity
export NW_BENCH_DISPATCH=single  # round-3 cells were measured pre-scan-default
export NW_BENCH_SCENE=0
OUT=${1:-/tmp/remat_sweep.jsonl}
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}

run() {
  local tag=$1; shift
  echo "== $tag $(date -u +%H:%M:%S)" >&2
  local line
  line=$(env "$@" timeout 1800 python bench.py 2>/tmp/remat_sweep_err.log | tail -1)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", \"bench\": $line}" >> "$OUT"
    echo "$line" >&2
  else  # failed/timed-out bench: record the failure as valid JSON
    echo "{\"tag\": \"$tag\", \"bench\": null}" >> "$OUT"
    echo "(bench failed; see /tmp/remat_sweep_err.log)" >&2
  fi
}

run baseline             NW_BENCH_PHASE=both
run dots_saveable        NW_BENCH_PHASE=both NW_BENCH_CFG="TPU.REMAT_FIELD=dots_saveable"
run remat_true           NW_BENCH_PHASE=both NW_BENCH_CFG="TPU.REMAT_FIELD=true"
run dots_saveable_16384  NW_BENCH_PHASE=both NW_BENCH_BATCH=16384 NW_BENCH_CFG="TPU.REMAT_FIELD=dots_saveable"
echo "DONE" >&2
