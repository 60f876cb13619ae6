"""Capture a device profile of the training step and print the top ops.

Runs the bench.py training step (same config surface, NW_BENCH_* env
knobs honored), records a jax.profiler trace around a few steps, then
parses the raw .xplane.pb with TensorFlow's protobuf (the
tensorboard-plugin converter is broken in this image) and aggregates
per-HLO-op device time so the hot fusions are visible.

Usage: python scripts/exp_profile_step.py [trace_dir] [n_steps]
"""

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(trace_dir: str, n_steps: int):
    import jax

    from __graft_entry__ import _make_batch, _scene_cfg, _scene_info
    from bench import BATCH
    from neuralrecon_w_tpu.config import get_cfg_defaults
    from neuralrecon_w_tpu.models import field_config_from_cfg
    from neuralrecon_w_tpu.rendering import render_config_from_cfg
    from neuralrecon_w_tpu.training import (
        init_state, loss_config_from_cfg, make_optimizer, make_train_step,
    )

    cfg = _scene_cfg(get_cfg_defaults(), flagship=True)
    cfg.TPU.FIELD_DTYPE = "bfloat16"
    for kv in os.environ.get("NW_BENCH_CFG", "").split(";"):
        if kv:
            import yaml

            k, v = kv.split("=", 1)
            node = cfg
            *path, leaf = k.split(".")
            for p in path:
                node = getattr(node, p)
            setattr(node, leaf, yaml.safe_load(v))
    fc = field_config_from_cfg(cfg)
    # NW_PROFILE_PHASE=steady profiles the surface-guided step (online
    # fine grid attached, boundary samples active) instead of warm-up
    phase = os.environ.get("NW_PROFILE_PHASE", "warmup")
    extra = ()
    if phase == "steady":
        from bench import FINE_LEVEL, make_fine_grid

        _, fine_grid = make_fine_grid(FINE_LEVEL)
        rcfg = render_config_from_cfg(cfg, fine_level=FINE_LEVEL)
        extra = (fine_grid, None)
    else:
        rcfg = render_config_from_cfg(cfg)
    surf_mode = os.environ.get("NW_BENCH_SURF", "cache")
    lcfg = loss_config_from_cfg(cfg)
    opt, _ = make_optimizer(cfg, BATCH)
    step = jax.jit(make_train_step(fc, rcfg, lcfg, opt, anneal_end=50000),
                   donate_argnums=(0,))
    state = init_state(jax.random.PRNGKey(0), fc, opt)
    scene = _scene_info()
    batch = _make_batch(BATCH, fc.n_vocab)
    rng = jax.random.PRNGKey(1)

    if phase == "steady" and surf_mode == "cache":
        # production path: precomputed surface band (bench.py contract)
        from neuralrecon_w_tpu.ops.ray_voxel import grid_near_far

        surf, _, hit = grid_near_far(
            extra[0], rcfg.fine_level, batch["rays"][:, 0:3],
            batch["rays"][:, 3:6], first_only=True)
        batch = dict(batch, surf_t=surf, surf_hit=hit)

    for _ in range(3):
        state, aux = step(state, scene, batch, rng, *extra)
    float(aux["loss"])

    with jax.profiler.trace(trace_dir):
        for _ in range(n_steps):
            state, aux = step(state, scene, batch, rng, *extra)
        float(aux["loss"])


def summarize(trace_dir: str, top: int = 30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane.pb found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    import re

    per_op = defaultdict(float)
    per_kind = defaultdict(float)
    per_line = defaultdict(float)
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        emeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                dur_ms = ev.duration_ps / 1e9
                name = emeta.get(ev.metadata_id, str(ev.metadata_id))
                per_line[f"{plane.name}::{line.name}"] += dur_ms
                if line.name != "XLA Ops":
                    continue
                per_op[name] += dur_ms
                # '%foo.12 = TYPE[shape] op-kind(...)' -> 'op-kind TYPE[shape]'
                m = re.match(r"%[\w.\-]+ = (\S+) ([\w\-]+)\(", name)
                if m:
                    per_kind[f"{m.group(2)} {m.group(1)[:48]}"] += dur_ms
                else:
                    per_kind[name[:60]] += dur_ms

    print(f"== trace {os.path.basename(path)}")
    print("-- per line (plane::line, total ms):")
    for k, v in sorted(per_line.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {v:10.3f} ms  {k}")
    print(f"-- top {top} op groups (kind + shape, XLA Ops line only):")
    for k, v in sorted(per_kind.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {v:10.3f} ms  {k}")
    print(f"-- top {top} individual ops:")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {v:10.3f} ms  {k[:110]}")


if __name__ == "__main__":
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nw_profile"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    if os.environ.get("NW_PROFILE_PARSE_ONLY") != "1":
        capture(trace_dir, n_steps)
    summarize(trace_dir)
