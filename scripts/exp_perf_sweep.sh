#!/usr/bin/env bash
# Perf sweep over bench.py env knobs (one serial chip job per variant).
# Usage: scripts/exp_perf_sweep.sh [out.jsonl]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/perf_sweep.jsonl}
: > "$OUT"

run() { # name extra_env...
  local name=$1; shift
  echo "=== $name" >&2
  local line
  line=$(env "$@" timeout 900 python bench.py 2>/dev/null | tail -1)
  echo "{\"variant\": \"$name\", \"result\": ${line:-null}}" | tee -a "$OUT"
}

run base_8192
run batch_16384        NW_BENCH_BATCH=16384
run batch_16384_remat  NW_BENCH_BATCH=16384 NW_BENCH_CFG="TPU.REMAT_FIELD=true"
run batch_12288        NW_BENCH_BATCH=12288
run vmem_32m_8192      XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=32768"
run vmem_64m_8192      XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536"
run pallas_grad_16384  NW_BENCH_BATCH=16384 NW_BENCH_CFG="TPU.SDF_GRAD_MODE=pallas"
run pallas_t256_vmem64 XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
                       NW_BENCH_CFG="TPU.SDF_GRAD_MODE=pallas;TPU.KERNEL_TILE=256"
run pfield_t256_vmem64 XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
                       NW_BENCH_CFG="TPU.SDF_GRAD_MODE=pallas_field;TPU.KERNEL_TILE=256"
