"""Test harness: force an 8-virtual-device CPU JAX platform so sharding
and collective paths run without TPU hardware.

The sandbox's sitecustomize imports jax and pins JAX_PLATFORMS=axon (a
remote TPU tunnel) before any test code runs, so plain env vars are too
late — switch the platform through jax.config instead. XLA_FLAGS still
works because the CPU client is only created on first use."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: tests re-jit fresh closures around the
# SAME graphs (every render_cli invocation, every jit_train_step build),
# so even a cold `pytest -q` run deduplicates repeat compiles via the
# disk cache. Harmless if the dir is wiped between runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/nw_tpu_test_compcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
