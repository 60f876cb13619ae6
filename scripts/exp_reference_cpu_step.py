"""Measure the REFERENCE's torch training step on this host's CPU.

Drives the reference's real models + renderer + loss + Adam through the
exact training_step composition (tests/_reference_system.py) at the
flagship brandenburg_gate architecture and sampling budget, on CPU, and
reports measured step time, rays/s, and the profiler-counted FLOPs of
one full step (forward + double-backprop + optimizer). These are the
measured inputs for the A100 baseline derivation in BASELINE.md.

Run (never claims the TPU):
    env -u PALLAS_AXON_POOL_IPS python scripts/exp_reference_cpu_step.py \
        --batch 2048 --iters 3

For the same-silicon comparison, run our framework on the same host at
the same budget:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        NW_BENCH_CFG="TPU.FIELD_DTYPE=float32" NW_BENCH_BATCH=2048 \
        NW_BENCH_ITERS=3 NW_BENCH_DISPATCH=single python bench.py
(NW_BENCH_CFG touching FIELD_DTYPE forces the parity budget, so both
runs use 8+16 importance + 10 boundary + bg-everywhere, f32.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, "tests"))


def make_batch(n, n_vocab, seed=0):
    import torch

    rs = np.random.RandomState(seed)
    o = (rs.randn(n, 3) * 0.1 + [0, 0, 2.0]).astype(np.float32)
    d = -o + rs.randn(n, 3).astype(np.float32) * 0.05
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    near = np.full((n, 1), 0.5, np.float32)
    far = np.full((n, 1), 4.0, np.float32)
    depth = np.full((n, 1), 2.0, np.float32)
    w = (rs.rand(n, 1) > 0.5).astype(np.float32)
    rays = torch.from_numpy(np.concatenate([o, d, near, far, depth, w], 1))
    return {
        "rays": rays,
        "rgbs": torch.from_numpy(rs.rand(n, 3).astype(np.float32)),
        "ts": torch.from_numpy(rs.randint(0, n_vocab, n).astype(np.int64)),
        "semantics": torch.from_numpy(rs.randint(0, 2, n).astype(np.int64)),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--boundary", type=int, default=10,
                    help="BOUNDARY_SAMPLES (reference YAML knob)")
    ap.add_argument("--phase", choices=["warmup", "steady"], default="steady")
    ap.add_argument("--profile_flops", action="store_true",
                    help="profiler-count matmul FLOPs of one step")
    args = ap.parse_args(argv)

    import torch

    from _reference_system import (ReferenceSystem, brandenburg_neuconw_cfg,
                                   load_reference, sphere_get_near_far)

    mapping = {"sky": 2, "person": 3, "car": 4, "bicycle": 5, "minibike": 6,
               "road": 7}
    ref = load_reference(label_id_mapping=mapping,
                         get_near_far_impl=sphere_get_near_far([0., 0., 0.], 1.0))
    cfg = brandenburg_neuconw_cfg(BOUNDARY_SAMPLES=args.boundary)
    scene = {"origin": [0.0, 0.0, 0.0], "radius": 2.5, "voxel_size": 0.08}
    system = ReferenceSystem(ref, scene_config=scene, neuconw_cfg=cfg,
                             lr=5e-4)
    if args.phase == "steady":
        system.attach_fine_octree(0.08)
    batch = make_batch(args.batch, cfg["N_VOCAB"])

    # warm-up (allocator, thread pools)
    system.train_step(batch)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        system.train_step(batch)
    dt = (time.perf_counter() - t0) / args.iters

    out = {
        "what": "reference torch training step, CPU, this host",
        "phase": args.phase,
        "batch": args.batch,
        "boundary_samples": args.boundary,
        "step_s": round(dt, 3),
        "rays_per_sec": round(args.batch / dt, 1),
        "torch_threads": torch.get_num_threads(),
    }

    if args.profile_flops:
        from torch.profiler import ProfilerActivity, profile

        with profile(activities=[ProfilerActivity.CPU],
                     with_flops=True) as prof:
            system.train_step(batch)
        flops = sum(e.flops for e in prof.key_averages() if e.flops)
        out["flops_per_step"] = int(flops)
        out["flops_per_ray"] = round(flops / args.batch / 1e6, 2)
        out["flops_per_ray_unit"] = "MFLOP"
        out["achieved_gflops"] = round(flops / dt / 1e9, 1)

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
