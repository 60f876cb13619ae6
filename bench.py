"""Headline benchmark: training-step throughput (rays/sec/chip).

Runs the full jitted NeuS-W training step (production architecture:
SDF 8x512 with per-sample gradients, color 4x256, background NeRF,
Adam) on whatever chip jax defaults to, and prints ONE JSON line.

The default headline measures the shipped TPU operating point
(``config/train_brandenburg_gate_tpu.yaml``: 8 uniform + 16 importance
over 2 up-sample rounds + 4 boundary samples, background NeRF at 4
coarse positions + the exact n_outside tail, bfloat16 activations) —
the same config ``scripts/train.sh`` selects on a TPU backend. Because
BOUNDARY_SAMPLES is also a knob the reference's YAMLs expose
(reference config/train_brandenburg_gate.yaml:13 sets 10), the same
run ALSO measures ``phases.steady_reference_budget``: this framework
at the reference's exact sampling budget (10 boundary + background
everywhere). Both numbers print side by side;
``vs_baseline_reference_budget`` is the like-for-like ratio and
``vs_baseline`` the shipped-operating-point ratio.

Baseline: the reference repo publishes no throughput numbers.
``vs_baseline`` divides by 20,000 rays/s for the PyTorch reference on
one A100 — an estimate bounded by measurement + roofline scaling, see
BASELINE.md "A100 baseline derivation". The north-star target is
vs_baseline >= 5.
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

A100_REFERENCE_RAYS_PER_SEC = 20_000.0

# 8192 amortizes dispatch and fills the chip; 16384 exceeds HBM without
# rematerialization (see BENCHMARKS.md). The global batch is sharded
# across chips; the LR linear-scaling rule covers optimization dynamics.
# NW_BENCH_* env knobs exist for perf sweeps (scripts/exp_perf_sweep.sh)
# and leave the driver-facing default contract unchanged.
BATCH = int(os.environ.get("NW_BENCH_BATCH", 8192))
WARMUP = 3
ITERS = int(os.environ.get("NW_BENCH_ITERS", 30))
# Steady-state phase: after the first octree_update (step 5000) the
# reference samples through the online SDF-surface grid for ~99% of
# training (reference rendering/renderer.py:415-456). Level 10 over the
# scene cube matches the brandenburg_gate production setup
# (TRAIN_VOXEL_SIZE 0.08, scale ~20 -> level ceil(log2(2*20/0.08))=9;
# we bench one level harder).
FINE_LEVEL = int(os.environ.get("NW_BENCH_FINE_LEVEL", 10))
PHASE = os.environ.get("NW_BENCH_PHASE", "both")  # warmup | steady | both
# The production TPU operating point for the steady (headline) phase is
# read from the SHIPPED config artifact (the same file scripts/train.sh
# selects on TPU), so the benched config and the trained config cannot
# drift apart. Quality ablation: BENCHMARKS.md BG4+BD4 holds PSNR and
# F-score on clean AND jittered scenes; BD2 collapses geometry and is
# rejected. When active, bench.py ALSO measures the steady phase at the
# reference budget and reports it as phases.steady_reference_budget so
# both numbers stay auditable. NW_BENCH_OPERATING_POINT=parity restores
# the reference budget as the headline. If NW_BENCH_CFG touches any
# operating-point knob, the override is skipped (parity fallback) so
# sweep cells measure exactly what their label says — the operating
# point would otherwise silently clobber the swept value.
OP_CONFIG_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "config", "train_brandenburg_gate_tpu.yaml")
_OP_KEYS = {"TPU.BG_SAMPLES", "TPU.BOUNDARY_SAMPLES", "TPU.FIELD_DTYPE",
            "NEUCONW.BOUNDARY_SAMPLES"}
_cfg_touches_op = any(
    kv.split("=", 1)[0] in _OP_KEYS
    for kv in os.environ.get("NW_BENCH_CFG", "").split(";") if kv)
_want_op = os.environ.get("NW_BENCH_OPERATING_POINT", "tpu") == "tpu"
if _want_op and _cfg_touches_op:
    print("# NW_BENCH_CFG sets an operating-point knob; disabling the "
          "operating-point override (NW_BENCH_OPERATING_POINT=parity "
          "fallback) so the swept value is what gets measured", flush=True)
if _want_op and not _cfg_touches_op:
    import yaml as _yaml

    with open(OP_CONFIG_PATH) as _f:
        _op_tpu = _yaml.safe_load(_f).get("TPU", {})
    OPERATING_POINT = {k: _op_tpu[k] for k in ("BG_SAMPLES", "BOUNDARY_SAMPLES")}
    OP_FIELD_DTYPE = _op_tpu.get("FIELD_DTYPE", "bfloat16")
else:
    OPERATING_POINT = {}
    OP_FIELD_DTYPE = None
# 'cache' = production path (pool-wide band precompute amortized over
# UPDATE_FREQ steps); 'query' = per-step in-step grid query (what
# validation renders and host-pool training pay)
SURF_MODE = os.environ.get("NW_BENCH_SURF", "cache")
# 'scan' = the production scan-dispatch loop (training/step.py
# make_scan_train_fn: N_INNER steps per device dispatch over an
# HBM-resident pool — what the Trainer actually runs on TPU, amortizing
# host->device dispatch latency); 'single' = one jitted step per
# dispatch. The default measures the code path production runs.
DISPATCH = os.environ.get("NW_BENCH_DISPATCH", "scan")
N_INNER = int(os.environ.get("NW_BENCH_N_INNER", 10))
SCAN_POOL_ROWS = int(os.environ.get("NW_BENCH_SCAN_POOL_ROWS", 262_144))
POOL_ROWS = int(os.environ.get("NW_BENCH_POOL_ROWS", 2_097_152))
UPDATE_FREQ = int(os.environ.get("NW_BENCH_UPDATE_FREQ", 5000))


def wait_for_device(max_wait_s: int | None = None):
    """Gate on a healthy default device before claiming it for real.

    The tunneled TPU pool occasionally wedges (device grant hangs or
    the backend reports UNAVAILABLE) and recovers by itself; a bench
    that starts during such a window would hang in backend init or die
    on the first op. Probe with a tiny matmul in a SUBPROCESS (backend
    init is once-per-process and every process claims the pool chip,
    so the probe must not be this process) under a timeout, and retry
    until the deadline. Proceed regardless at the deadline — the real
    failure mode then reports itself.
    """
    import subprocess
    import sys

    if max_wait_s is None:
        # outages of 60-90 min have been observed on the tunneled pool;
        # the bench is the round's one recorded artifact, so wait long
        max_wait_s = int(os.environ.get("NW_BENCH_WAIT_S", "5400"))
    probe = ("import jax, jax.numpy as jnp; "
             "x = jnp.ones((8, 8)); print('OK', float((x @ x).sum()))")
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", probe], timeout=240,
                               capture_output=True, text=True)
            if r.returncode == 0 and "OK" in r.stdout:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            print(f"# device probe still failing after {attempt} attempts; "
                  "proceeding anyway", flush=True)
            return
        time.sleep(60)


def make_fine_grid(level: int):
    """Synthetic online surface grid: the voxel shell of the unit sphere
    (the scene surface in _make_batch's geometry), built through the
    production octree_update machinery (27-dilated, morton-sorted,
    packed bitfield)."""
    from neuralrecon_w_tpu.ops.ray_voxel import make_device_grid
    from neuralrecon_w_tpu.ops.voxel_grid import grid_from_points

    rs = np.random.RandomState(7)
    pts = rs.randn(2_000_000, 3)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    scale = 2.0
    voxel = 2.0 * scale / (1 << level)
    host = grid_from_points(
        pts, np.full(3, -scale), np.full(3, scale), voxel, expand=1
    )
    assert host.level == level, (host.level, level)
    kind = os.environ.get("NW_BENCH_GRID", "auto")
    hier = None if kind == "auto" else (kind == "hier")
    return host, make_device_grid(host, hierarchical=hier)


def main():
    from __graft_entry__ import _make_batch, _scene_cfg, _scene_info
    from neuralrecon_w_tpu.config import get_cfg_defaults
    from neuralrecon_w_tpu.models import field_config_from_cfg
    from neuralrecon_w_tpu.rendering import render_config_from_cfg
    from neuralrecon_w_tpu.training import (
        init_state, loss_config_from_cfg, make_optimizer, make_train_step,
    )

    cfg = _scene_cfg(get_cfg_defaults(), flagship=True)
    # framework dtype choice: bfloat16 activations (weights stay f32).
    # The step is HBM-bound on stored activations; bf16 cuts it 38%.
    # Convergence verified equal to f32 on the synthetic scene
    # (BENCHMARKS.md). Applied in BOTH steady variants — the
    # reference-budget phase is "this framework at the reference's
    # sampling budget", not an f32 parity run. NW_BENCH_CFG can
    # override (which also disables the operating point, above).
    cfg.TPU.FIELD_DTYPE = OP_FIELD_DTYPE or "bfloat16"
    for kv in os.environ.get("NW_BENCH_CFG", "").split(";"):
        if kv:
            k, v = kv.split("=", 1)
            import yaml

            node = cfg
            *path, leaf = k.split(".")
            for p in path:
                node = getattr(node, p)
            setattr(node, leaf, yaml.safe_load(v))
    fc = field_config_from_cfg(cfg)
    rcfg = render_config_from_cfg(cfg)
    lcfg = loss_config_from_cfg(cfg)
    opt, _ = make_optimizer(cfg, BATCH)

    copts = dict(kv.split("=", 1)
                 for kv in os.environ.get("NW_BENCH_COMPILER_OPTS", "").split(";")
                 if kv) or None
    state = init_state(jax.random.PRNGKey(0), fc, opt)
    scene = _scene_info()
    batch = _make_batch(BATCH, fc.n_vocab)
    rng = jax.random.PRNGKey(1)

    def timed(step, state, *extra, batch_arrays=None, extra_s_per_step=0.0):
        b = batch if batch_arrays is None else batch_arrays
        for _ in range(WARMUP):
            state, aux = step(state, scene, b, rng, *extra)
        # value fetch, not block_until_ready: remote-device transports may
        # resolve readiness before execution completes; pulling the scalar
        # guarantees the whole dependent chain actually ran
        float(aux["loss"])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, aux = step(state, scene, b, rng, *extra)
        loss = float(aux["loss"])
        dt = time.perf_counter() - t0
        assert loss == loss, "NaN loss in benchmark"
        return state, BATCH * ITERS / (dt + ITERS * extra_s_per_step)

    def timed_scan(rcfg_p, pool, *grids):
        """Time the production scan-dispatch loop: N_INNER steps per
        device dispatch, batches gathered on-device from the pool."""
        from neuralrecon_w_tpu.training.step import make_scan_train_fn

        nonlocal_state = init_state(jax.random.PRNGKey(0), fc, opt)
        run = make_scan_train_fn(fc, rcfg_p, lcfg, opt, 50000, (),
                                 BATCH, N_INNER)
        data_rng = jax.random.PRNGKey(2)
        st = nonlocal_state
        for _ in range(WARMUP):
            st, aux = run(st, scene, pool, data_rng, rng, *grids)
        float(aux["loss"])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            st, aux = run(st, scene, pool, data_rng, rng, *grids)
        loss = float(aux["loss"])
        dt = time.perf_counter() - t0
        assert loss == loss, "NaN loss in benchmark"
        return dt, BATCH * N_INNER * ITERS

    def make_pool(n_rows):
        return _make_batch(n_rows, fc.n_vocab)

    phases = {}
    rcfg_headline = rcfg  # overwritten by the steady branch when it runs
    if PHASE in ("warmup", "both"):
        if DISPATCH == "scan":
            dt, n_rays = timed_scan(rcfg, make_pool(SCAN_POOL_ROWS), None, None)
            phases["warmup"] = n_rays / dt
        else:
            step = jax.jit(
                make_train_step(fc, rcfg, lcfg, opt, anneal_end=50000),
                donate_argnums=(0,), compiler_options=copts)
            state, phases["warmup"] = timed(step, state)
    grid_stats = None
    if PHASE in ("steady", "both"):
        rcfg_fine = render_config_from_cfg(cfg, fine_level=FINE_LEVEL)
        host_grid, fine_grid = make_fine_grid(FINE_LEVEL)
        # Self-description: band hit-rate + band-vs-interval width, so
        # steady numbers are comparable across rounds and the synthetic
        # grid geometry is auditable from the JSON alone.
        from neuralrecon_w_tpu.ops.ray_voxel import grid_near_far as _gnf

        @jax.jit
        def _stats_query(rays):
            surf, _, hit = _gnf(fine_grid, FINE_LEVEL, rays[:, 0:3],
                                rays[:, 3:6], first_only=True)
            return surf, hit

        _surf, _hit = map(np.asarray, _stats_query(batch["rays"]))
        _rays = np.asarray(batch["rays"])
        _interval = float((_rays[:, 7] - _rays[:, 6]).mean())
        _band_w = 2.0 * rcfg_fine.sample_range * host_grid.voxel_size
        grid_stats = {
            "band_hit_rate": round(float(_hit.mean()), 4),
            "band_width_sfm": round(_band_w, 4),
            "band_frac_of_cached_interval": round(_band_w / _interval, 4),
            "occupied_voxels": int(host_grid.coords.shape[0]),
            "grid_level": FINE_LEVEL,
        }
        # Steady variants: the production operating point is the
        # headline; when it deviates from the reference budget, the
        # reference-budget step is measured in the same run so the two
        # stay auditable side by side.
        if OPERATING_POINT:
            cfg_op = cfg.clone()
            for k, v in OPERATING_POINT.items():
                setattr(cfg_op.TPU, k, v)
            rcfg_op = render_config_from_cfg(cfg_op, fine_level=FINE_LEVEL)
            variants = [("steady", rcfg_op),
                        ("steady_reference_budget", rcfg_fine)]
            rcfg_headline = rcfg_op
        else:
            variants = [("steady", rcfg_fine)]
            rcfg_headline = rcfg_fine
        if DISPATCH == "scan":
            pool = make_pool(SCAN_POOL_ROWS)
            if SURF_MODE == "cache":
                # production steady path: pool carries the precomputed
                # surface band (DeviceRayPool.attach_surface); the
                # refresh sweep amortizes per step as in SURF_MODE=cache
                from neuralrecon_w_tpu.ops.ray_voxel import grid_near_far

                @jax.jit
                def pquery(rays):
                    surf, _, hit = grid_near_far(
                        fine_grid, FINE_LEVEL, rays[:, 0:3], rays[:, 3:6],
                        first_only=True)
                    return surf, hit

                surf, hit = pquery(pool["rays"])
                float(surf[0])
                t0 = time.perf_counter()
                surf, hit = pquery(pool["rays"])
                float(surf[0])
                t_query = time.perf_counter() - t0
                amortized = (t_query * (POOL_ROWS / SCAN_POOL_ROWS)
                             / UPDATE_FREQ)
                pool = dict(pool, surf_t=surf, surf_hit=hit)
            else:  # in-step grid query inside every scanned step
                amortized = 0.0
            n_steps = ITERS * N_INNER
            for name, rc in variants:
                dt, n_rays = timed_scan(rc, pool, fine_grid, None)
                phases[name] = n_rays / (dt + n_steps * amortized)
            if SURF_MODE == "cache":
                phases["steady_refresh_ms_per_step"] = amortized * 1e3
        else:
            if SURF_MODE == "cache":
                # production steady-state path: the trainer precomputes
                # the surface band for the whole HBM-resident pool once
                # per octree_update (DeviceRayPool.attach_surface) and
                # the step reads it; we time the cached step and add the
                # amortized per-step share of the refresh sweep
                # (POOL_ROWS rays every UPDATE_FREQ steps).
                from neuralrecon_w_tpu.ops.ray_voxel import grid_near_far

                @jax.jit
                def query(rays):
                    surf, _, hit = grid_near_far(
                        fine_grid, FINE_LEVEL, rays[:, 0:3], rays[:, 3:6],
                        first_only=True)
                    return surf, hit

                surf, hit = query(batch["rays"])
                float(surf[0])  # compile + sync
                t0 = time.perf_counter()
                for _ in range(5):
                    surf, hit = query(batch["rays"])
                float(surf[0])
                t_query = (time.perf_counter() - t0) / 5
                amortized = t_query * (POOL_ROWS / BATCH) / UPDATE_FREQ
                cbatch = dict(batch, surf_t=surf, surf_hit=hit)
                for name, rc in variants:
                    step = jax.jit(
                        make_train_step(fc, rc, lcfg, opt, anneal_end=50000),
                        donate_argnums=(0,), compiler_options=copts)
                    state, phases[name] = timed(
                        step, state, fine_grid, None, batch_arrays=cbatch,
                        extra_s_per_step=amortized)
                phases["steady_refresh_ms_per_step"] = amortized * 1e3
            else:  # in-step query (validation / host-pool fallback path)
                for name, rc in variants:
                    step = jax.jit(
                        make_train_step(fc, rc, lcfg, opt, anneal_end=50000),
                        donate_argnums=(0,), compiler_options=copts)
                    state, phases[name] = timed(step, state, fine_grid, None)

    # headline = the phase the reference spends ~99% of training in
    headline_phase = "steady" if "steady" in phases else "warmup"
    headline = phases[headline_phase]
    ref_budget = phases.get("steady_reference_budget")
    out = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(headline, 1),
        "unit": "rays/s",
        "vs_baseline": round(headline / A100_REFERENCE_RAYS_PER_SEC, 3),
        "headline_phase": headline_phase,
        "phases": {k: round(v, 1) for k, v in phases.items()},
        "fine_level": FINE_LEVEL if "steady" in phases else None,
        "dispatch": DISPATCH,
        "surf_mode": SURF_MODE if "steady" in phases else None,
        # self-description derived from the rcfg the headline phase
        # actually ran (not the requested constants): NW_BENCH_CFG or
        # PHASE=warmup change what is measured, and this must follow.
        "operating_point": {
            "BG_SAMPLES": rcfg_headline.bg_samples,
            "BOUNDARY_SAMPLES": rcfg_headline.boundary_samples,
            "FIELD_DTYPE": cfg.TPU.FIELD_DTYPE,
            "config_artifact": (os.path.relpath(OP_CONFIG_PATH,
                                                os.path.dirname(os.path.abspath(__file__)))
                                if OPERATING_POINT else None),
        },
        "baseline": {
            "a100_rays_per_sec": A100_REFERENCE_RAYS_PER_SEC,
            "kind": "bounded estimate (BASELINE.md 'A100 baseline derivation')",
        },
        "grid_stats": grid_stats,
    }
    if ref_budget is not None:
        # like-for-like: our framework at the reference's exact sampling
        # budget (BOUNDARY_SAMPLES is a knob the reference's YAMLs also
        # expose, so the headline's budget cut is not TPU-exclusive)
        out["vs_baseline_reference_budget"] = round(
            ref_budget / A100_REFERENCE_RAYS_PER_SEC, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    wait_for_device()
    main()
