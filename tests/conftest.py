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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
