#!/usr/bin/env bash
# Gate for end-of-round snapshots (VERDICT r04 weak-1): the fast tier
# must be green at HEAD before committing a snapshot. Run this before
# any milestone/snapshot commit; it exits non-zero on a red tier.
set -euo pipefail
cd "$(dirname "$0")/.."
echo "pre_snapshot: running fast tier (pytest -q, slow excluded)..."
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m pytest tests/ -q
echo "pre_snapshot: fast tier green."
