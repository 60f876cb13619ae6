"""Contract test for scripts/exp_reproj_filter_bench.py: the measured
eval-filter comparison (packed multi-view DDA vs per-view dispatch,
threaded vs serial mesh raster) must run end-to-end and agree between
paths at tiny scale."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_filter_bench_contract():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never claim the chip
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/exp_reproj_filter_bench.py"),
         "8", "48"],
        env=env, capture_output=True, text=True, timeout=600, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(x) for x in r.stdout.strip().splitlines()
             if x.startswith("{")]
    modes = {rec["mode"] for rec in lines}
    assert modes == {"point_cloud_dda", "mesh_raster"}, lines
    for rec in lines:
        assert rec["n_views"] == 8
        assert rec["speedup"] > 0
        # the real correctness signal: both paths produced identical
        # hit/visibility sets (the script raises otherwise and the JSON
        # records it, surviving python -O)
        assert rec["paths_agree"] is True
