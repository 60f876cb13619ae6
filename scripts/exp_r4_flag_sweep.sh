#!/bin/bash
# Round-4 XLA device-compiler flag sweep around the steady headline.
#
# Every scheduling-level lever measured in rounds 1-3 sat at or below
# baseline (BENCHMARKS.md); this sweeps the remaining documented
# xla_tpu_* toggles through bench.py's NW_BENCH_COMPILER_OPTS plumbing
# (jit(compiler_options=...) — host XLA_FLAGS aborts on device flags
# under the tunnel). Unknown flag names fail that cell's compile and
# are recorded as invalid rather than killing the sweep.
#
# Each cell: steady phase only, single dispatch, no scene phase, short
# iters — a relative probe, not a headline measurement.
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_compcache
export NW_BENCH_PHASE=steady NW_BENCH_SCENE=0 NW_BENCH_DISPATCH=single
export NW_BENCH_ITERS=${NW_BENCH_ITERS:-20}

cells=(
  "baseline:"
  "latency_hiding:xla_tpu_enable_latency_hiding_scheduler=true"
  "fusion_cost_model:xla_tpu_enable_experimental_fusion_cost_model=true"
  "nested_loop_fusion:xla_tpu_enable_multi_level_nested_loop_fusion=true"
  "no_rwb_fusion:xla_tpu_rwb_fusion=false"
  "vmem64:xla_tpu_scoped_vmem_limit_kib=65536"
)

for cell in "${cells[@]}"; do
  name="${cell%%:*}"; opts="${cell#*:}"
  echo "== cell $name (${opts:-none}) =="
  if [ -n "$opts" ]; then export NW_BENCH_COMPILER_OPTS="$opts"; else unset NW_BENCH_COMPILER_OPTS; fi
  timeout 1200 python bench.py 2>&1 | tail -1
done
