"""Inference (serving) throughput: deterministic render-path rays/sec.

The training bench (bench.py) times the full gradient step; this times
the forward-only render used for validation, novel-view synthesis
(tools/render_cli.py) and any serving deployment — the reference's
chunked eval path (reference lightning_modules/neuconw_system.py:404-430)
with perturb=0. Reports warm-up (SFM near/far) and steady-state
(surface-grid) phases, honest value-fetch timing, one JSON line.

Usage:  python scripts/bench_render.py          # both phases
        NW_BENCH_BATCH=16384 python scripts/bench_render.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

BATCH = int(os.environ.get("NW_BENCH_BATCH", 8192))
WARMUP = 3
ITERS = int(os.environ.get("NW_BENCH_ITERS", 30))
FINE_LEVEL = int(os.environ.get("NW_BENCH_FINE_LEVEL", 10))
PHASE = os.environ.get("NW_BENCH_PHASE", "both")


def main():
    from __graft_entry__ import _make_batch, _scene_cfg, _scene_info
    from bench import make_fine_grid, wait_for_device
    from neuralrecon_w_tpu.config import get_cfg_defaults
    from neuralrecon_w_tpu.models import field_config_from_cfg
    from neuralrecon_w_tpu.rendering import render_config_from_cfg
    from neuralrecon_w_tpu.training import init_state, make_optimizer
    from neuralrecon_w_tpu.training.step import make_render_fn

    wait_for_device()
    cfg = _scene_cfg(get_cfg_defaults(), flagship=True)
    cfg.TPU.FIELD_DTYPE = os.environ.get("NW_BENCH_DTYPE", "bfloat16")
    fc = field_config_from_cfg(cfg)
    opt, _ = make_optimizer(cfg, BATCH)
    state = init_state(jax.random.PRNGKey(0), fc, opt)
    params = state.params
    scene = _scene_info()
    batch = _make_batch(BATCH, fc.n_vocab)
    rays = batch["rays"]
    ts = batch["ts"]
    labels = batch["labels"]
    rng = jax.random.PRNGKey(1)

    def timed(render, *grids):
        for _ in range(WARMUP):
            out = render(params, scene, rays, ts, labels, rng, *grids)
        float(out["color"][0, 0])  # value fetch, not block_until_ready
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = render(params, scene, rays, ts, labels, rng, *grids)
        float(out["color"][0, 0])
        return BATCH * ITERS / (time.perf_counter() - t0)

    phases = {}
    if PHASE in ("warmup", "both"):
        rcfg = render_config_from_cfg(cfg)
        phases["warmup"] = timed(make_render_fn(fc, rcfg), None, None)
    if PHASE in ("steady", "both"):
        rcfg = render_config_from_cfg(cfg, fine_level=FINE_LEVEL)
        _, fine_grid = make_fine_grid(FINE_LEVEL)
        phases["steady"] = timed(make_render_fn(fc, rcfg), fine_grid, None)

    headline = phases.get("steady", phases.get("warmup"))
    print(json.dumps({
        "metric": "render_rays_per_sec_per_chip",
        "value": round(headline, 1),
        "unit": "rays/s",
        "phases": {k: round(v, 1) for k, v in phases.items()},
        "batch": BATCH,
    }))


if __name__ == "__main__":
    main()
