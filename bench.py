"""Headline benchmark: training-step throughput (rays/sec/chip).

Runs the full jitted NeuS-W training step (production architecture:
SDF 8x512 with per-sample gradients, color 4x256, background NeRF,
Adam) on whatever chip jax defaults to, and prints ONE JSON line.

The default headline measures the shipped TPU operating point
(``config/train_brandenburg_gate_tpu.yaml``: 8 uniform + 16 importance
over 2 up-sample rounds + 6 boundary samples, background NeRF at 8
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

# ---- total time budget (VERDICT r04 item 1) ----
# The driver runs bench.py in a bounded window; round 4's run timed out
# (rc=124) and recorded NOTHING because the worst-case sum of phases
# (90-min device wait + first-run scene setup training) exceeded any
# plausible window. The bench now tracks a global deadline, emits the
# JSON record after EVERY completed phase (so a kill still leaves the
# headline parseable on the last stdout line), and skips optional
# phases that no longer fit. Defaults leave ample margin for the
# mandatory warmup+steady phases on a healthy chip (~6-8 min incl.
# compiles); raise NW_BENCH_BUDGET_S for exploratory runs.
BUDGET_S = float(os.environ.get("NW_BENCH_BUDGET_S", 1500))
_T0 = time.time()


def _remaining() -> float:
    return BUDGET_S - (time.time() - _T0)


# minimum remaining seconds to even start an optional phase (each needs
# a fresh XLA compile of the scan step — ~1-2 min on TPU — plus timing)
REF_BUDGET_MIN_S = float(os.environ.get("NW_BENCH_REF_MIN_S", 240))
SCENE_MIN_S = float(os.environ.get("NW_BENCH_SCENE_MIN_S", 300))

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
# drift apart. Quality ablation (round-5 pre-registered decision wave,
# BENCHMARKS.md + docs/bg_boundary_ablation_r5.json): BG8+BD6 passed
# every clean draw; BG4 (any boundary budget), BD4 and BD2 are
# rejected for stochastic clean-scene geometry collapse. When active, bench.py ALSO measures the steady phase at the
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
        # outages of 60-90 min have been observed on the tunneled pool,
        # but a bench that spends its whole window waiting records
        # NOTHING (round-4 failure mode). Cap the wait at a fraction of
        # the remaining budget so the mandatory phases always get their
        # time; a wedged pool then fails fast and visibly instead of
        # silently eating the record.
        max_wait_s = int(os.environ.get("NW_BENCH_WAIT_S", "480"))
    max_wait_s = min(max_wait_s, max(60, int(_remaining() * 0.5)))
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


class SceneArtifactsMissing(RuntimeError):
    """Raised when the realistic-scene phase's cached artifacts are
    absent and building them was not allowed (the bench itself never
    builds — round 4 died mid-setup; scripts/prep_bench_scene.py or
    the committed assets/bench_scene provide them)."""


def scene_geometry(level_target: int, train_batch: int,
                   allow_build: bool = False):
    """Realistic steady-state geometry (VERDICT r03 item 8): synthetic
    workspace -> ray cache -> short flagship training through the
    production Trainer -> octree_update fine grid from the trained SDF.

    Unlike make_fine_grid's ideal unit-sphere shell (band_hit_rate 1.0,
    uniform near/far), this yields the regime real scenes run in: image
    rays that miss the surface shell (sky/background pixels), ragged
    per-ray [near, far] from real camera geometry, and a grid whose
    occupancy comes from a trained SDF zero set, not an analytic
    surface. The workspace and the built grid are cached on disk
    (NW_BENCH_SCENE_DIR) so repeat benches skip the setup.

    Returns (scene_config, host_grid, device_grid, RayPool).
    """
    import yaml

    from neuralrecon_w_tpu.datasets.cache import RayPool, read_ray_cache
    from neuralrecon_w_tpu.ops.ray_voxel import make_device_grid
    from neuralrecon_w_tpu.ops.voxel_grid import VoxelGrid

    # NOT a dotdir: make_synthetic_scene names the split tsv after the
    # workspace basename, and read_tsv's *.tsv glob skips hidden files
    ws = os.environ.get("NW_BENCH_SCENE_DIR", "/root/nw_bench_scene")
    steps = int(os.environ.get("NW_BENCH_SCENE_STEPS", "300"))
    tiny = os.environ.get("NW_BENCH_SCENE_TINY", "0") == "1"
    grid_name = f"fine_grid_l{level_target}_s{steps}{'_tiny' if tiny else ''}.npz"
    split_root = os.path.join(ws, "cache_sgs", "splits")
    if not allow_build and not (
            os.path.exists(os.path.join(split_root, "rays1_meta_info.json"))
            and os.path.exists(os.path.join(ws, grid_name))):
        # fall back to the repo-committed pre-built assets (small fixed
        # synthetic workspace + a trained-SDF fine grid) so the driver
        # run measures the realistic-geometry phase without any setup
        assets = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "assets", "bench_scene")
        if (os.path.exists(os.path.join(assets, "cache_sgs", "splits",
                                        "rays1_meta_info.json"))
                and os.path.exists(os.path.join(assets, grid_name))):
            ws = assets
            split_root = os.path.join(ws, "cache_sgs", "splits")
        else:
            raise SceneArtifactsMissing(
                f"no cached scene artifacts at {ws} or {assets} "
                f"(need cache_sgs/splits + {grid_name}); run "
                "scripts/prep_bench_scene.py first")
    if not os.path.exists(os.path.join(split_root, "rays1_meta_info.json")):
        from neuralrecon_w_tpu.testing import make_synthetic_scene
        from neuralrecon_w_tpu.tools.prepare_data.prepare_data_cache import (
            main as cache_main,
        )

        os.makedirs(ws, exist_ok=True)
        make_synthetic_scene(ws, n_images=26, n_test=2, img_wh=(64, 48),
                             n_points=600, seed=0)
        cache_main(["--root_dir", ws, "--split_to_chunks", "8"])
    with open(os.path.join(ws, "config.yaml")) as f:
        sc = yaml.safe_load(f)
    # voxel size placing the rebuilt grid at level_target over the
    # scene cube: invert training/surface.surface_level's ceil rule on
    # the same bbx half-extent it uses (1.001 makes log2 land just
    # BELOW the integer so ceil resolves to level_target, not +1)
    from neuralrecon_w_tpu.ops.voxel_grid import scene_bbx_sfm

    bbx_min, bbx_max = scene_bbx_sfm(sc, in_sfm=True)
    scene_scale = float(np.max(bbx_max - bbx_min) / 2.0)
    train_voxel = 2.0 * scene_scale * 1.001 / (1 << level_target)
    # The training-time refresh runs at a coarser level: a level-10
    # surface_selection densifies the whole SFM grid (tens of millions
    # of candidates) on the single host core — 30+ min per refresh.
    # The final level_target grid is built hierarchically below
    # (coarse shell -> upsample kept voxels only), which is ~8^3
    # cheaper per stage.
    coarse_level = min(level_target, 7)
    coarse_voxel = 2.0 * scene_scale * 1.001 / (1 << coarse_level)

    # NW_BENCH_SCENE_TINY=1: run the scene-SETUP training with small
    # nets (the CPU smoke test's 1-core budget can't afford a flagship
    # train_cli compile+train). Only the grid-building side shrinks —
    # the timed bench phase still runs the flagship model; the grid is
    # still a trained-SDF octree_update product, just from a smaller
    # field. Real-chip runs keep the flagship default.
    grid_npz = os.path.join(ws, grid_name)
    if not os.path.exists(grid_npz) and not allow_build:
        raise SceneArtifactsMissing(f"missing {grid_npz}")
    if not os.path.exists(grid_npz):
        from neuralrecon_w_tpu.tools.train_cli import main as train_main

        cfg_y = {
            "NEUCONW": {
                "ANNEAL_END": max(steps, 1), "UPDATE_FREQ": max(steps // 2, 1),
                "TRAIN_VOXEL_SIZE": coarse_voxel, "SDF_THRESHOLD": 0.0,
                "NEAR_FAR_OVERRIDE": True, "N_VOCAB": 32,
                "DEPTH_LOSS": True,
                # the brandenburg TRAINING budget. Without these the
                # yacs DEFAULTS apply — the reference's dense path
                # (512 uniform + 512 importance over 4 up-sample
                # rounds + 32 outside), whose flagship-width XLA
                # program wedges the remote compiler for 25+ minutes.
                # This is what actually killed the round-4 driver
                # bench inside scene setup.
                "N_SAMPLES": 8, "N_IMPORTANCE": 16, "UP_SAMPLE_STEP": 2,
                "N_OUTSIDE": 4, "BOUNDARY_SAMPLES": 10, "S_VAL_BASE": 3,
                "SAMPLE_RANGE": 16,
                "LOSS": {"depth_weight": 1.0, "igr_weight": 0.001},
            },
            "DATASET": {"ROOT_DIR": ws, "DATASET_NAME": "phototourism",
                        "PHOTOTOURISM": {"IMG_DOWNSCALE": 1}},
            "TRAINER": {"SAVE_FREQ": 10 ** 9, "VAL_FREQ": 1e9,
                        "CANONICAL_LR": 5e-4, "CANONICAL_BS": 2048},
            # production scan dispatch (what the ablation runs use);
            # the host-loop fallback pays per-step tunnel latency
            "TPU": {"FIELD_DTYPE": cfg_field_dtype_for_scene(),
                    "DEVICE_POOL": True, "SCAN_INNER": 20},
        }
        if tiny:
            cfg_y["NEUCONW"]["SDF_CONFIG"] = {
                "d_hidden": 64, "d_out": 65, "n_layers": 4, "skip_in": [2]}
            cfg_y["NEUCONW"]["COLOR_CONFIG"] = {
                "d_feature": 64, "d_hidden": 32, "n_layers": 2,
                "head_channels": 16}
            cfg_y["NEUCONW"].update(N_SAMPLES=8, N_IMPORTANCE=8,
                                    UP_SAMPLE_STEP=2, N_OUTSIDE=2,
                                    BOUNDARY_SAMPLES=2, S_VAL_BASE=1,
                                    SAMPLE_RANGE=4)
        cfg_path = os.path.join(ws, "bench_scene_cfg.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg_y, f)
        trainer = train_main([
            "--cfg_path", cfg_path, "--batch_size", str(train_batch),
            "--test_batch_size", "512", "--num_epochs", "1000",
            "--max_steps", str(steps), "--exp_name", "bench_scene",
            "--save_dir", os.path.join(ws, "runs"),
        ])
        trainer.refine_surface()  # coarse shell from the FINAL params
        host = trainer.fine_grid_host
        if host is None:
            raise RuntimeError("octree_update kept no voxels")
        if host.level < level_target:
            # hierarchical refinement: one level per stage (8 children
            # per kept voxel), re-sweeping the trained SDF each time —
            # candidates stay shell-bounded instead of the dense 8^dL
            # blow-up of a single jump
            from neuralrecon_w_tpu.training.surface import octree_update

            params_host = jax.device_get(trainer.state.params)
            for lvl in range(host.level + 1, level_target + 1):
                lvl_voxel = 2.0 * scene_scale * 1.001 / (1 << lvl)
                host, _ = octree_update(
                    params_host, trainer.fc, host, sc,
                    np.asarray(sc["origin"], np.float64),
                    float(sc["radius"]), train_voxel_size=lvl_voxel,
                    sdf_threshold=0.0)
                if host is None:
                    raise RuntimeError(
                        f"octree_update kept no voxels at level {lvl}")
                print(f"# staged refine: level {lvl} -> "
                      f"{host.coords.shape[0]} voxels", flush=True)
        np.savez(grid_npz, level=host.level, origin=host.origin,
                 scale=host.scale, coords=host.coords)
    z = np.load(grid_npz)
    host = VoxelGrid(int(z["level"]), z["origin"], float(z["scale"]),
                     z["coords"])
    rays, rgbs = read_ray_cache(split_root)
    return sc, host, make_device_grid(host), RayPool(rays, rgbs)


def cfg_field_dtype_for_scene():
    """The scene-setup training uses the same activation dtype as the
    headline so the built grid reflects the benched configuration."""
    return OP_FIELD_DTYPE or "bfloat16"


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

    def timed(step, state, *extra, batch_arrays=None, extra_s_per_step=0.0,
              scene_info=None):
        b = batch if batch_arrays is None else batch_arrays
        n_rays = int(b["rays"].shape[0])  # may be < BATCH (scene pool cap)
        sc_ = scene if scene_info is None else scene_info
        for _ in range(WARMUP):
            state, aux = step(state, sc_, b, rng, *extra)
        # value fetch, not block_until_ready: remote-device transports may
        # resolve readiness before execution completes; pulling the scalar
        # guarantees the whole dependent chain actually ran
        float(aux["loss"])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, aux = step(state, sc_, b, rng, *extra)
        loss = float(aux["loss"])
        dt = time.perf_counter() - t0
        assert loss == loss, "NaN loss in benchmark"
        return state, n_rays * ITERS / (dt + ITERS * extra_s_per_step)

    def timed_scan(rcfg_p, pool, *grids, scene_info=None):
        """Time the production scan-dispatch loop: N_INNER steps per
        device dispatch, batches gathered on-device from the pool."""
        from neuralrecon_w_tpu.training.step import make_scan_train_fn

        sc_ = scene if scene_info is None else scene_info
        nonlocal_state = init_state(jax.random.PRNGKey(0), fc, opt)
        run = make_scan_train_fn(fc, rcfg_p, lcfg, opt, 50000, (),
                                 BATCH, N_INNER)
        data_rng = jax.random.PRNGKey(2)
        st = nonlocal_state
        for _ in range(WARMUP):
            st, aux = run(st, sc_, pool, data_rng, rng, *grids)
        float(aux["loss"])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            st, aux = run(st, sc_, pool, data_rng, rng, *grids)
        loss = float(aux["loss"])
        dt = time.perf_counter() - t0
        assert loss == loss, "NaN loss in benchmark"
        return dt, BATCH * N_INNER * ITERS

    def make_pool(n_rows):
        return _make_batch(n_rows, fc.n_vocab)

    phases = {}
    rcfg_headline = rcfg  # overwritten by the steady branch when it runs
    grid_stats = None
    grid_stats_scene = None
    skipped = []

    def emit():
        """Print the full JSON record from whatever has completed so
        far. Called after every phase: a timeout/kill mid-run still
        leaves the best-so-far headline as the last parseable stdout
        line (round 4 recorded nothing because the record was only
        printed at the very end)."""
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
                # only claim the shipped artifact when the HEADLINE phase
                # actually ran it (warmup-only runs measure the parity
                # budget even with an operating point loaded)
                "config_artifact": (
                    os.path.relpath(
                        OP_CONFIG_PATH,
                        os.path.dirname(os.path.abspath(__file__)))
                    if OPERATING_POINT and headline_phase == "steady"
                    else None),
            },
            "baseline": {
                "a100_rays_per_sec": A100_REFERENCE_RAYS_PER_SEC,
                "kind": ("bounded estimate "
                         "(BASELINE.md 'A100 baseline derivation')"),
            },
            "grid_stats": grid_stats,
            "grid_stats_scene": grid_stats_scene,
            "elapsed_s": round(time.time() - _T0, 1),
            "budget_s": BUDGET_S,
            "skipped_phases": skipped,
        }
        if "steady_scene" in phases and "steady" in phases:
            # realistic-geometry steady vs ideal-shell steady, percent
            out["scene_vs_shell_pct"] = round(
                100.0 * (phases["steady_scene"] / phases["steady"] - 1.0), 1)
        if ref_budget is not None:
            # like-for-like: our framework at the reference's exact
            # sampling budget (BOUNDARY_SAMPLES is a knob the
            # reference's YAMLs also expose, so the headline's budget
            # cut is not TPU-exclusive)
            out["vs_baseline_reference_budget"] = round(
                ref_budget / A100_REFERENCE_RAYS_PER_SEC, 3)
        print(json.dumps(out), flush=True)

    if PHASE in ("warmup", "both"):
        if DISPATCH == "scan":
            dt, n_rays = timed_scan(rcfg, make_pool(SCAN_POOL_ROWS), None, None)
            phases["warmup"] = n_rays / dt
        else:
            step = jax.jit(
                make_train_step(fc, rcfg, lcfg, opt, anneal_end=50000),
                donate_argnums=(0,), compiler_options=copts)
            state, phases["warmup"] = timed(step, state)
        emit()
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
            if SURF_MODE == "cache":
                phases["steady_refresh_ms_per_step"] = amortized * 1e3
            for name, rc in variants:
                if (name == "steady_reference_budget"
                        and _remaining() < REF_BUDGET_MIN_S):
                    skipped.append({"phase": name, "reason": "budget",
                                    "remaining_s": round(_remaining(), 1)})
                    print(f"# skipping {name}: {_remaining():.0f}s "
                          f"remaining < {REF_BUDGET_MIN_S:.0f}s", flush=True)
                    continue
                dt, n_rays = timed_scan(rc, pool, fine_grid, None)
                phases[name] = n_rays / (dt + n_steps * amortized)
                emit()
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
                phases["steady_refresh_ms_per_step"] = amortized * 1e3
                for name, rc in variants:
                    if (name == "steady_reference_budget"
                            and _remaining() < REF_BUDGET_MIN_S):
                        skipped.append({"phase": name, "reason": "budget",
                                        "remaining_s": round(_remaining(), 1)})
                        continue
                    step = jax.jit(
                        make_train_step(fc, rc, lcfg, opt, anneal_end=50000),
                        donate_argnums=(0,), compiler_options=copts)
                    state, phases[name] = timed(
                        step, state, fine_grid, None, batch_arrays=cbatch,
                        extra_s_per_step=amortized)
                    emit()
            else:  # in-step query (validation / host-pool fallback path)
                for name, rc in variants:
                    if (name == "steady_reference_budget"
                            and _remaining() < REF_BUDGET_MIN_S):
                        skipped.append({"phase": name, "reason": "budget",
                                        "remaining_s": round(_remaining(), 1)})
                        continue
                    step = jax.jit(
                        make_train_step(fc, rc, lcfg, opt, anneal_end=50000),
                        donate_argnums=(0,), compiler_options=copts)
                    state, phases[name] = timed(step, state, fine_grid, None)
                    emit()

    # ---- realistic scene geometry (alongside the ideal-shell number) ----
    scene_wanted = (PHASE in ("steady", "both")
                    and os.environ.get("NW_BENCH_SCENE", "1") == "1")
    if scene_wanted and _remaining() < SCENE_MIN_S:
        skipped.append({"phase": "steady_scene", "reason": "budget",
                        "remaining_s": round(_remaining(), 1)})
        print(f"# skipping steady_scene: {_remaining():.0f}s remaining "
              f"< {SCENE_MIN_S:.0f}s", flush=True)
        scene_wanted = False
    if scene_wanted:
        try:
            import jax.numpy as jnp

            from neuralrecon_w_tpu.ops.ray_voxel import grid_near_far as _gnf2
            from neuralrecon_w_tpu.rendering.renderer import SceneInfo

            # scene grid level defaults to the shell's; separately
            # tunable because the setup training's octree sweeps cost
            # ~8x per level (the CPU smoke runs a level the 1-core
            # host can afford)
            ssc, s_host, s_dgrid, s_pool = scene_geometry(
                int(os.environ.get("NW_BENCH_SCENE_LEVEL", FINE_LEVEL)),
                min(BATCH, 2048),
                allow_build=os.environ.get("NW_BENCH_SCENE_BUILD",
                                           "0") == "1")
            s_scene = SceneInfo(
                origin=jnp.asarray(ssc["origin"], jnp.float32),
                radius=jnp.asarray(float(ssc["radius"]), jnp.float32),
                sfm2gt=jnp.asarray(ssc["sfm2gt"], jnp.float32))
            cfg_s = cfg.clone()
            for k, v in OPERATING_POINT.items():
                setattr(cfg_s.TPU, k, v)
            rcfg_s = render_config_from_cfg(cfg_s, fine_level=s_host.level)

            @jax.jit
            def squery(r):
                surf, _, hit = _gnf2(s_dgrid, s_host.level, r[:, 0:3],
                                     r[:, 3:6], first_only=True)
                return surf, hit

            rs_sc = np.random.RandomState(5)
            sb = s_pool.gather(rs_sc.choice(len(s_pool), min(BATCH,
                                                             len(s_pool)),
                                            replace=False))
            _ss, _sh = map(np.asarray, squery(jnp.asarray(sb["rays"])))
            _nf = sb["rays"][:, 6:8]
            grid_stats_scene = {
                "band_hit_rate": round(float(_sh.mean()), 4),
                "near_mean_std": [round(float(_nf[:, 0].mean()), 3),
                                  round(float(_nf[:, 0].std()), 3)],
                "far_mean_std": [round(float(_nf[:, 1].mean()), 3),
                                 round(float(_nf[:, 1].std()), 3)],
                "occupied_voxels": int(s_host.coords.shape[0]),
                "grid_level": int(s_host.level),
                "source": "synthetic workspace rays + trained-SDF "
                          "octree_update grid (scene_geometry)",
            }
            if DISPATCH == "scan":
                reps = -(-SCAN_POOL_ROWS // len(s_pool))
                idx = np.concatenate(
                    [rs_sc.permutation(len(s_pool)) for _ in range(reps)]
                )[:SCAN_POOL_ROWS]
                spool = {k: jnp.asarray(v) for k, v in
                         s_pool.gather(idx).items()}
                ssurf, shit = squery(spool["rays"])
                float(ssurf[0])
                t0 = time.perf_counter()
                ssurf, shit = squery(spool["rays"])
                float(ssurf[0])
                s_amort = ((time.perf_counter() - t0)
                           * (POOL_ROWS / SCAN_POOL_ROWS) / UPDATE_FREQ)
                spool = dict(spool, surf_t=ssurf, surf_hit=shit)
                dt, n_rays = timed_scan(rcfg_s, spool, s_dgrid, None,
                                        scene_info=s_scene)
                phases["steady_scene"] = n_rays / (
                    dt + ITERS * N_INNER * s_amort)
            else:
                sfull = {k: jnp.asarray(v) for k, v in sb.items()}
                ssurf, shit = squery(sfull["rays"])
                float(ssurf[0])
                t0 = time.perf_counter()
                for _ in range(5):
                    ssurf, shit = squery(sfull["rays"])
                float(ssurf[0])
                s_amort = ((time.perf_counter() - t0) / 5
                           * (POOL_ROWS / BATCH) / UPDATE_FREQ)
                sfull = dict(sfull, surf_t=ssurf, surf_hit=shit)
                step_s = jax.jit(
                    make_train_step(fc, rcfg_s, lcfg, opt, anneal_end=50000),
                    donate_argnums=(0,), compiler_options=copts)
                st_s = init_state(jax.random.PRNGKey(0), fc, opt)
                _, phases["steady_scene"] = timed(
                    step_s, st_s, s_dgrid, None, batch_arrays=sfull,
                    extra_s_per_step=s_amort, scene_info=s_scene)
        except SceneArtifactsMissing as e:
            skipped.append({"phase": "steady_scene",
                            "reason": "artifacts_missing", "detail": str(e)})
            print(f"# steady_scene skipped (no cached artifacts): {e}",
                  flush=True)
        except Exception as e:  # the extra phase must never kill the bench
            import traceback

            traceback.print_exc()
            skipped.append({"phase": "steady_scene", "reason": "error",
                            "detail": repr(e)})
            print(f"# steady_scene phase skipped: {e!r}", flush=True)

    # final record (also the only one when PHASE ran a single variant)
    emit()


if __name__ == "__main__":
    wait_for_device()
    main()
