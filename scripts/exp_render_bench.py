"""Inference / serving bench: novel-view RENDER throughput (no grads).

Training throughput is bench.py's headline; this measures the other
production surface — forward-only rendering, the path validation,
``tools/render_cli.py`` image synthesis, and any serving deployment
run (reference analog: the chunked eval render at
reference lightning_modules/neuconw_system.py:404-430, the reference's
only image-synthesis path).

Modes:

``--mode ours`` (default device — TPU here, CPU via JAX_PLATFORMS=cpu):
    the production ``make_render_fn`` chunk (training/step.py:224) at
    flagship dims, swept over chunk sizes, in both phases:
      warmup  = SFM-grid sampling (no fine octree), and
      steady  = fine-octree surface-guided sampling with the IN-STEP
                sampled first-hit query — fresh rays have no cached
                band, so this is the real inference path.
    Budgets: the shipped TPU operating point (bf16 + BG4/BD4,
    config/train_*_tpu.yaml) and the reference YAML budget, side by
    side, exactly like bench.py's training phases.

``--mode reference`` (torch CPU, flagship dims): the reference's own
    ``NeuconWRenderer.render`` under ``torch.no_grad()`` via the
    tests/_reference_system.py harness (same modules the parity suites
    pin), with ``--profile_flops`` counting forward matmul FLOPs — the
    measured inputs for an A100 render bound derived the same way as
    BASELINE.md's training derivation.

Run (ours, real chip):
    JAX_COMPILATION_CACHE_DIR=/root/.jax_compcache \
        python scripts/exp_render_bench.py --chunks 512,4096,16384,65536
Run (reference, never claims the TPU):
    env -u PALLAS_AXON_POOL_IPS python scripts/exp_render_bench.py \
        --mode reference --chunks 512,2048 --profile_flops
Run (ours, same-silicon CPU check at the reference's f32 budget):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/exp_render_bench.py --chunks 512,2048 \
        --budgets reference --dtype float32
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, os.pardir))
sys.path.insert(0, os.path.join(_HERE, os.pardir, "tests"))

# one 800x600 frame at the reference's eval downscale=1 (rays/frame);
# s/frame = FRAME_RAYS / rays_per_sec
FRAME_RAYS = 800 * 600


def run_ours(args):
    import jax

    from __graft_entry__ import _make_batch, _scene_cfg, _scene_info
    from bench import make_fine_grid
    from neuralrecon_w_tpu.config import get_cfg_defaults
    from neuralrecon_w_tpu.models import field_config_from_cfg, init_field
    from neuralrecon_w_tpu.rendering import render_config_from_cfg
    from neuralrecon_w_tpu.training.step import (
        make_render_fn, make_scan_render_fn,
    )

    level = args.fine_level
    budgets = {}
    if "op" in args.budgets:
        budgets["operating_point"] = {"BG_SAMPLES": 4, "BOUNDARY_SAMPLES": 4}
    if "reference" in args.budgets:
        budgets["reference_budget"] = {}

    base = _scene_cfg(get_cfg_defaults(), flagship=True)
    base.TPU.FIELD_DTYPE = args.dtype
    scene = _scene_info()
    rng = jax.random.PRNGKey(0)
    fc0 = field_config_from_cfg(base)
    params = init_field(jax.random.PRNGKey(1), fc0)

    host_grid = dev_grid = None
    if args.phase in ("steady", "both"):
        host_grid, dev_grid = make_fine_grid(level)

    results = []
    for bname, tpu_kw in budgets.items():
        cfg = base.clone()
        for k, v in tpu_kw.items():
            setattr(cfg.TPU, k, v)
        fc = field_config_from_cfg(cfg)
        phases = (["warmup", "steady"] if args.phase == "both"
                  else [args.phase])
        for phase in phases:
            if phase == "steady":
                rcfg = render_config_from_cfg(cfg, fine_level=level)
                grid = dev_grid
            else:
                rcfg = render_config_from_cfg(cfg)
                grid = None
            render_chunk = make_render_fn(fc, rcfg)
            for chunk in args.chunks:
                b = _make_batch(chunk, fc.n_vocab, seed=3)
                cargs = (params, scene, b["rays"], b["ts"], b["labels"],
                         rng, grid, None)
                out = render_chunk(*cargs)           # compile
                float(out["color"][0, 0])            # value-fetch sync
                iters = max(args.iters,
                            int(np.ceil(args.min_rays / chunk)))
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = render_chunk(*cargs)
                float(out["color"][0, 0])
                dt = (time.perf_counter() - t0) / iters
                rec = {
                    "mode": "ours", "budget": bname, "phase": phase,
                    "chunk": chunk, "dtype": args.dtype,
                    "ms_per_chunk": round(dt * 1e3, 2),
                    "rays_per_sec": round(chunk / dt, 1),
                    "s_per_frame_800x600": round(FRAME_RAYS / (chunk / dt),
                                                 3),
                }
                print(json.dumps(rec), flush=True)
                results.append(rec)
            # whole-frame single-dispatch scan (render_cli --dispatch
            # scan): one 800x600 frame per device call — measures the
            # true s/frame including transport, not an extrapolation
            if args.frame_chunk > 0:
                if (jax.default_backend() == "cpu"
                        and args.frame_rays > 50_000):
                    print(json.dumps({"note": "frame cell skipped on CPU "
                                              "(too slow); set "
                                              "--frame_rays <= 50000"}),
                          flush=True)
                else:
                    n_pad = -(-args.frame_rays // args.frame_chunk)
                    n_rays = n_pad * args.frame_chunk
                    b = _make_batch(n_rays, fc.n_vocab, seed=3)
                    scan_render = make_scan_render_fn(fc, rcfg,
                                                      args.frame_chunk)
                    cargs = (params, scene, b["rays"], b["ts"],
                             b["labels"], rng, grid, None)
                    out = scan_render(*cargs)
                    float(out["color"][0, 0])
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        out = scan_render(*cargs)
                    float(out["color"][0, 0])
                    dt = (time.perf_counter() - t0) / args.iters
                    rec = {
                        "mode": "ours", "budget": bname, "phase": phase,
                        "dispatch": "scan_frame",
                        "chunk": args.frame_chunk, "n_rays": n_rays,
                        "dtype": args.dtype,
                        "rays_per_sec": round(n_rays / dt, 1),
                        "s_per_frame_800x600": round(
                            dt * FRAME_RAYS / n_rays, 3),
                    }
                    print(json.dumps(rec), flush=True)
                    results.append(rec)
    best = max(results, key=lambda r: r["rays_per_sec"])
    summary = {
        "summary": "ours", "backend": jax.default_backend(),
        "fine_level": level if args.phase != "warmup" else None,
        "best": best,
    }
    print(json.dumps(summary), flush=True)
    return results


def run_reference(args):
    import torch

    from _reference_system import (ReferenceSystem, brandenburg_neuconw_cfg,
                                   load_reference, sphere_get_near_far)
    from exp_reference_cpu_step import make_batch

    mapping = {"sky": 2, "person": 3, "car": 4, "bicycle": 5, "minibike": 6,
               "road": 7}
    ref = load_reference(
        label_id_mapping=mapping,
        get_near_far_impl=sphere_get_near_far([0.0, 0.0, 0.0], 1.0))
    cfg = brandenburg_neuconw_cfg(BOUNDARY_SAMPLES=args.boundary)
    scene = {"origin": [0.0, 0.0, 0.0], "radius": 2.5, "voxel_size": 0.08}
    system = ReferenceSystem(ref, scene_config=scene, neuconw_cfg=cfg,
                             lr=5e-4)
    phases = ["warmup", "steady"] if args.phase == "both" else [args.phase]
    results = []
    for phase in phases:
        if phase == "steady":
            system.attach_fine_octree(0.08)
        else:
            system.renderer.fine_octree_data = None
        for chunk in args.chunks:
            b = make_batch(chunk, cfg["N_VOCAB"], seed=3)
            bg = torch.zeros([1, 3])
            # NO torch.no_grad(): the reference's forward intrinsically
            # runs torch.autograd.grad for the SDF normals (reference
            # models/neuconw.py:285-293), which needs grad mode on even
            # at eval — its validation render pays this too. No
            # backward() is called; we just drop the graph per iter.
            out = system.renderer.render(b["rays"], b["ts"], b["semantics"],
                                         background_rgb=bg,
                                         cos_anneal_ratio=1.0,
                                         perturb_overwrite=0)  # warm caches
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = system.renderer.render(b["rays"], b["ts"],
                                             b["semantics"],
                                             background_rgb=bg,
                                             cos_anneal_ratio=1.0,
                                             perturb_overwrite=0)
            dt = (time.perf_counter() - t0) / args.iters
            del out
            rec = {
                "mode": "reference", "phase": phase, "chunk": chunk,
                "boundary_samples": args.boundary, "dtype": "float32",
                "torch_threads": torch.get_num_threads(),
                "ms_per_chunk": round(dt * 1e3, 2),
                "rays_per_sec": round(chunk / dt, 1),
                "s_per_frame_800x600": round(FRAME_RAYS / (chunk / dt), 3),
            }
            if args.profile_flops:
                from torch.profiler import ProfilerActivity, profile

                with profile(
                        activities=[ProfilerActivity.CPU],
                        with_flops=True) as prof:
                    system.renderer.render(b["rays"], b["ts"],
                                           b["semantics"],
                                           background_rgb=bg,
                                           cos_anneal_ratio=1.0,
                                           perturb_overwrite=0)
                flops = sum(e.flops for e in prof.key_averages() if e.flops)
                rec["flops_per_ray_mflop"] = round(flops / chunk / 1e6, 2)
                rec["achieved_gflops"] = round(flops / dt / 1e9, 1)
            print(json.dumps(rec), flush=True)
            results.append(rec)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["ours", "reference"], default="ours")
    ap.add_argument("--chunks", type=str, default="512,4096,16384,65536")
    ap.add_argument("--phase", choices=["warmup", "steady", "both"],
                    default="both")
    ap.add_argument("--budgets", type=str, default="op,reference",
                    help="ours mode: comma subset of {op,reference}")
    ap.add_argument("--dtype", type=str, default="bfloat16",
                    help="ours mode: TPU.FIELD_DTYPE for the render")
    ap.add_argument("--fine_level", type=int, default=10)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--min_rays", type=int, default=200_000,
                    help="ours mode: raise iters so each timed cell "
                         "covers at least this many rays")
    ap.add_argument("--frame_chunk", type=int, default=16384,
                    help="ours mode: scan tile for the whole-frame "
                         "single-dispatch cell (0 disables)")
    ap.add_argument("--frame_rays", type=int, default=FRAME_RAYS,
                    help="ours mode: rays per frame for the scan cell")
    ap.add_argument("--boundary", type=int, default=10,
                    help="reference mode: BOUNDARY_SAMPLES")
    ap.add_argument("--profile_flops", action="store_true")
    args = ap.parse_args(argv)
    args.chunks = [int(c) for c in args.chunks.split(",")]
    args.budgets = args.budgets.split(",")

    if args.mode == "reference":
        return run_reference(args)
    return run_ours(args)


if __name__ == "__main__":
    main()
