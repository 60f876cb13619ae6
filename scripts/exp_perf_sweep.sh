#!/usr/bin/env bash
# Perf sweep over bench.py env knobs (one serial chip job per variant).
# Usage: scripts/exp_perf_sweep.sh [out.jsonl]
set -u
# pin the published round-3 protocol: these cells were measured at
# the parity budget BEFORE the TPU operating point became the bench
# default; without this a rerun at HEAD would measure (and mislabel)
# the operating point. The scene-geometry phase postdates them too.
export NW_BENCH_OPERATING_POINT=parity
export NW_BENCH_DISPATCH=single  # round-3 cells were measured pre-scan-default
export NW_BENCH_SCENE=0
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/perf_sweep.jsonl}
: > "$OUT"

run() { # name extra_env...
  local name=$1; shift
  echo "=== $name" >&2
  local line
  line=$(env "$@" timeout 900 python bench.py 2>"/tmp/sweep_$name.err" | tail -1)
  [ -z "$line" ] && tail -3 "/tmp/sweep_$name.err" >&2
  echo "{\"variant\": \"$name\", \"result\": ${line:-null}}" | tee -a "$OUT"
}

# NOTE: --xla_tpu_* flags are DEVICE-compiler options; the host
# XLA_FLAGS parser aborts on them under the axon tunnel. They must go
# through jit compiler_options (NW_BENCH_COMPILER_OPTS).
run base_8192
run batch_16384        NW_BENCH_BATCH=16384
run batch_16384_remat  NW_BENCH_BATCH=16384 NW_BENCH_CFG="TPU.REMAT_FIELD=true"
run batch_12288        NW_BENCH_BATCH=12288
run vmem_64m_8192      NW_BENCH_COMPILER_OPTS="xla_tpu_scoped_vmem_limit_kib=65536"
run pallas_grad_8192   NW_BENCH_CFG="TPU.SDF_GRAD_MODE=pallas"
run pallas_t256_vmem64 NW_BENCH_COMPILER_OPTS="xla_tpu_scoped_vmem_limit_kib=65536" \
                       NW_BENCH_CFG="TPU.SDF_GRAD_MODE=pallas;TPU.KERNEL_TILE=256"
run pfield_t256_vmem64 NW_BENCH_COMPILER_OPTS="xla_tpu_scoped_vmem_limit_kib=65536" \
                       NW_BENCH_CFG="TPU.SDF_GRAD_MODE=pallas_field;TPU.KERNEL_TILE=256"
