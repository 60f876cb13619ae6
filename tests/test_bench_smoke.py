"""bench.py is the driver's one recorded artifact per round — these
smoke tests run it end-to-end as a subprocess (tiny knobs, CPU) so a
refactor can't silently break the headline benchmark at round end."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env, timeout=900):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never claim the chip
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env.update(NW_BENCH_BATCH="128", NW_BENCH_ITERS="2",
               NW_BENCH_FINE_LEVEL="8", NW_BENCH_WAIT_S="1",
               NW_BENCH_N_INNER="2", NW_BENCH_SCAN_POOL_ROWS="1024",
               NW_BENCH_SCENE="0")  # scene phase has its own smoke below
    env.update(extra_env)
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       env=env, capture_output=True, text=True,
                       timeout=timeout, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    return json.loads(line)


@pytest.mark.parametrize("env,expect", [
    ({}, {"dispatch": "scan", "surf_mode": "cache",
          "headline_phase": "steady"}),
    ({"NW_BENCH_DISPATCH": "single"}, {"dispatch": "single"}),
    ({"NW_BENCH_SURF": "query"}, {"surf_mode": "query"}),
    ({"NW_BENCH_PHASE": "warmup"}, {"fine_level": None}),
    ({"NW_BENCH_OPERATING_POINT": "parity", "NW_BENCH_DISPATCH": "single"},
     {"dispatch": "single"}),
])
def test_bench_contract(env, expect):
    out = _run_bench(env)
    assert out["metric"] == "train_rays_per_sec_per_chip"
    assert out["unit"] == "rays/s"
    assert out["value"] > 0 and out["vs_baseline"] > 0
    assert set(out["phases"]) >= (
        {"warmup"} if env.get("NW_BENCH_PHASE") == "warmup"
        else {"warmup", "steady"})
    op_active = (env.get("NW_BENCH_OPERATING_POINT", "tpu") == "tpu"
                 and env.get("NW_BENCH_PHASE") != "warmup")
    if op_active:
        # the deviating operating point must carry the reference-budget
        # steady number alongside, and describe itself in the JSON
        assert "steady_reference_budget" in out["phases"], out
        assert out["phases"]["steady_reference_budget"] > 0
        assert "vs_baseline_reference_budget" in out, out
        # the self-description must match the shipped config artifact
        # (read it rather than hardcode, so an operating-point revision
        # cannot desync this test from the artifact)
        import yaml

        with open(os.path.join(REPO, "config",
                               "train_brandenburg_gate_tpu.yaml")) as fh:
            op = yaml.safe_load(fh)["TPU"]
        assert out["operating_point"].get("BG_SAMPLES") == op["BG_SAMPLES"]
        assert (out["operating_point"].get("BOUNDARY_SAMPLES")
                == op["BOUNDARY_SAMPLES"])
        # the benched config is the shipped train config artifact
        assert out["operating_point"]["config_artifact"] == os.path.join(
            "config", "train_brandenburg_gate_tpu.yaml")
    if env.get("NW_BENCH_PHASE") == "warmup":
        # self-description follows the measured rcfg: warmup runs the
        # parity budget, never the operating-point constants
        assert out["operating_point"]["BOUNDARY_SAMPLES"] == 10
        assert out["operating_point"]["BG_SAMPLES"] == -1
    if env.get("NW_BENCH_OPERATING_POINT") == "parity":
        assert out["operating_point"]["BOUNDARY_SAMPLES"] == 10
        assert "steady_reference_budget" not in out["phases"]
    for k, v in expect.items():
        assert out.get(k) == v, out


def test_bench_scene_geometry_phase(tmp_path):
    """The realistic-geometry steady phase (synthetic workspace rays +
    trained-SDF octree_update grid) runs end to end and self-describes:
    its grid stats must expose heterogeneous near/far and the grid
    provenance, and the phase must never displace the shell headline."""
    out = _run_bench({
        "NW_BENCH_SCENE": "1",
        "NW_BENCH_SCENE_BUILD": "1",  # benches never build; tests may
        "NW_BENCH_SCENE_DIR": str(tmp_path / "ws"),
        "NW_BENCH_SCENE_STEPS": "4",
        "NW_BENCH_SCENE_TINY": "1",  # 1-core CPU budget: tiny setup nets
        "NW_BENCH_SCENE_LEVEL": "7",  # octree sweeps cost ~8x per level
        "NW_BENCH_PHASE": "steady",
        "NW_BENCH_DISPATCH": "single",
        "NW_BENCH_OPERATING_POINT": "parity",
        "NW_BENCH_BUDGET_S": "100000",  # CPU smoke must not trip gates
    }, timeout=1500)
    assert out["headline_phase"] == "steady"
    assert out["phases"].get("steady_scene", 0) > 0, out
    gs = out["grid_stats_scene"]
    assert gs["grid_level"] == 7 and gs["occupied_voxels"] > 0
    assert 0.0 < gs["band_hit_rate"] <= 1.0
    # real camera geometry: per-ray near/far actually spread
    assert gs["far_mean_std"][1] > 0.0
    assert "scene_vs_shell_pct" in out


def test_bench_scene_skipped_without_artifacts(tmp_path):
    """The driver-facing default NEVER builds scene artifacts inside
    the bench window (round-4 timeout cause): with an empty scene dir
    and no committed assets fallback hit, the phase is skipped with a
    self-describing record and the run still succeeds."""
    out = _run_bench({
        "NW_BENCH_SCENE": "1",
        "NW_BENCH_SCENE_DIR": str(tmp_path / "empty_ws"),
        # point the assets fallback somewhere empty too (subprocess cwd
        # is the repo, which may have real assets committed)
        "NW_BENCH_SCENE_LEVEL": "3",  # no committed grid at this level
        "NW_BENCH_PHASE": "steady",
        "NW_BENCH_DISPATCH": "single",
        "NW_BENCH_OPERATING_POINT": "parity",
    })
    assert "steady_scene" not in out["phases"], out
    assert out["phases"]["steady"] > 0
    reasons = {s["phase"]: s["reason"] for s in out["skipped_phases"]}
    assert reasons.get("steady_scene") == "artifacts_missing", out


def test_bench_budget_skips_optional_phases():
    """An exhausted time budget must skip the optional phases (the
    reference-budget variant and steady_scene) but still measure and
    emit the mandatory headline phases."""
    out = _run_bench({"NW_BENCH_BUDGET_S": "1",
                      "NW_BENCH_DISPATCH": "single",
                      "NW_BENCH_SCENE": "1"})  # budget gate fires first
    assert out["phases"]["steady"] > 0 and out["phases"]["warmup"] > 0
    assert "steady_reference_budget" not in out["phases"], out
    assert "steady_scene" not in out["phases"], out
    reasons = {s["phase"]: s["reason"] for s in out["skipped_phases"]}
    assert reasons.get("steady_reference_budget") == "budget", out
    assert reasons.get("steady_scene") == "budget", out


def test_bench_emits_record_per_phase():
    """Every completed phase leaves a parseable best-so-far JSON line on
    stdout, so a mid-run kill still records a headline (the round-4
    failure recorded nothing)."""
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env.update(NW_BENCH_BATCH="128", NW_BENCH_ITERS="2",
               NW_BENCH_FINE_LEVEL="8", NW_BENCH_WAIT_S="1",
               NW_BENCH_N_INNER="2", NW_BENCH_SCAN_POOL_ROWS="1024",
               NW_BENCH_SCENE="0", NW_BENCH_BUDGET_S="100000")
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       env=env, capture_output=True, text=True,
                       timeout=900, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    records = [json.loads(ln) for ln in r.stdout.splitlines()
               if ln.startswith("{")]
    # warmup emit + steady emit + ref-budget emit + final
    assert len(records) >= 3, r.stdout
    assert records[0]["headline_phase"] == "warmup"
    assert all(rec["metric"] == "train_rays_per_sec_per_chip"
               for rec in records)
    # monotone accumulation: later records carry every earlier phase
    for a, b in zip(records, records[1:]):
        assert set(a["phases"]) <= set(b["phases"]), (a, b)


def test_bench_cfg_conflict_disables_operating_point():
    """NW_BENCH_CFG sweeping an operating-point knob must measure the
    swept value, not get clobbered by the operating-point override
    (advisor r3 medium): the override falls back to parity."""
    out = _run_bench({"NW_BENCH_CFG": "TPU.BOUNDARY_SAMPLES=2",
                      "NW_BENCH_DISPATCH": "single"})
    assert out["operating_point"]["BOUNDARY_SAMPLES"] == 2, out
    assert "steady_reference_budget" not in out["phases"], out
