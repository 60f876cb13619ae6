"""BD10 vs BD4 in the REFERENCE's own training dynamics (torch CPU).

The shipped TPU operating point cuts BOUNDARY_SAMPLES from the
reference YAML's 10 to 4 — a knob the reference also exposes
(reference config/defaults.py:15, config/train_brandenburg_gate.yaml:13).
Round 3 validated the cut in OUR dynamics only; this experiment trains
the reference's real composition (tests/_reference_system.py: real
NeuconW + NeRF + NeuconWRenderer + NeuconWLoss + Adam + clip) on the
synthetic fixture's actual ray cache at BD10 and BD4, then extracts
and scores the SDF, answering two questions for BENCHMARKS.md:

  1. is the knob quality-neutral in the reference's own dynamics?
  2. how much step time does the reference itself recover from it
     (i.e. how much of our headline uplift the reference could copy
     with a one-line YAML edit)?

The kaolin octree first-hit is stubbed with the exact analytic sphere
(the fixture's surface), as tests/test_reference_render_parity.py
already does for the parity suites. CPU-feasible architecture: tiny
SDF/color nets + a small bg NeRF — both cells share it, so the
BD10-vs-BD4 delta is the measured subject.

Run (never claims the TPU; JAX_PLATFORMS=cpu because sitecustomize
pins the axon platform, which env -u alone leaves dangling):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/exp_reference_budget_twin.py \
        --out_dir /root/ref_twin --warmup 200 --steady 600
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tiny_cfg(boundary):
    from _reference_system import brandenburg_neuconw_cfg

    return brandenburg_neuconw_cfg(
        N_SAMPLES=8, N_IMPORTANCE=16, UP_SAMPLE_STEP=2, N_OUTSIDE=4,
        S_VAL_BASE=3, BOUNDARY_SAMPLES=boundary, SAMPLE_RANGE=8,
        N_VOCAB=32, N_A=8, ANNEAL_END=400,
        MESH_MASK_LIST=["sky"], RAY_MASK_LIST=None, FLOOR_NORMAL=False,
        DEPTH_LOSS=True,
        SDF_CONFIG=dict(d_in=3, d_out=65, d_hidden=64, n_layers=4,
                        skip_in=(2,), multires=6, bias=0.5, scale=1.0,
                        geometric_init=True, weight_norm=True,
                        inside_outside=False),
        COLOR_CONFIG=dict(d_in=9, d_feature=64, mode="idr", d_out=3,
                          d_hidden=64, n_layers=2, head_channels=16,
                          static_head_layers=2, weight_norm=True,
                          multires_view=4),
        S_CONFIG=dict(init_val=0.3),
        # the fixture's proven anchored weighting (exp_wild_ablation)
        LOSS=dict(coef=1.0, igr_weight=1e-3, mask_weight=0.1,
                  depth_weight=1.0, floor_weight=0.01),
    )


def extract_and_score(system, scene_config, out_dir, tag):
    """Dense-grid SDF -> marching tetrahedra -> F vs analytic GT."""
    import torch

    from neuralrecon_w_tpu.evaluation import eval_mesh
    from neuralrecon_w_tpu.extraction.mesh import box_eval_grid
    from neuralrecon_w_tpu.ops.isosurface import (marching_tetrahedra,
                                                  vertex_normals)
    from neuralrecon_w_tpu.ops.native import marching_tetrahedra_native
    from neuralrecon_w_tpu.testing.synthetic import sample_surface
    from neuralrecon_w_tpu.utils.ply import write_ply

    origin = np.asarray(scene_config["origin"], np.float64)
    radius = float(scene_config["radius"])
    grid = box_eval_grid(np.asarray([[-1.3, -1.3, -1.3], [1.3, 1.3, 1.3]]),
                         dim=128)
    pts_unit = ((grid.points_sfm - origin) / radius).astype(np.float32)
    sdfs = []
    with torch.no_grad():
        for i in range(0, len(pts_unit), 65536):
            sdfs.append(system.neuconw.sdf(
                torch.from_numpy(pts_unit[i:i + 65536])).numpy().ravel())
    field = np.concatenate(sdfs).reshape(grid.dim, grid.dim, grid.dim)
    native = marching_tetrahedra_native(field, level=0.0)
    verts_grid, faces = (native if native is not None
                         else marching_tetrahedra(field, level=0.0))
    mesh_path = os.path.join(out_dir, f"{tag}.ply")
    if len(verts_grid) == 0:
        return {"degenerate": True, "f05": 0.0, "f10": 0.0, "f20": 0.0}
    verts = verts_grid * grid.voxel_size + grid.vol_origin
    write_ply(mesh_path, verts, faces=faces,
              normals=vertex_normals(verts, faces))
    gt_path = os.path.join(out_dir, "gt.ply")
    if not os.path.exists(gt_path):
        write_ply(gt_path, sample_surface("sphere", 4000, 1.0))
    res = eval_mesh(mesh_path, gt_path, scene_config, is_mesh=True,
                    threshold=[0.05, 0.1, 0.2], save_name=tag,
                    write_visualizations=False)
    return {"f05": round(res["fscores"][0], 3),
            "f10": round(res["fscores"][1], 3),
            "f20": round(res["fscores"][2], 3)}


def run_cell(root, scene_config, boundary, warmup, steady, batch, out_dir,
             seed=66):
    import torch

    from _reference_system import (ReferenceSystem, load_reference,
                                   sphere_get_near_far)
    from neuralrecon_w_tpu.datasets.cache import RayPool, read_ray_cache
    from neuralrecon_w_tpu.datasets.mask_utils import get_label_id_mapping

    res_path = os.path.join(out_dir, f"bd{boundary}.json")
    if os.path.exists(res_path):
        rec = json.load(open(res_path))
        print(json.dumps(rec), flush=True)
        return rec

    m = get_label_id_mapping()
    ref = load_reference(
        label_id_mapping={k: m[k] for k in ("sky", "person", "road")},
        get_near_far_impl=sphere_get_near_far(
            np.zeros(3, np.float32), 1.0))
    cfg = tiny_cfg(boundary)
    system = ReferenceSystem(
        ref, scene_config=scene_config, neuconw_cfg=cfg, lr=5e-4,
        seed=seed, nerf_config={"D": 2, "W": 64, "skips": []})

    rays, rgbs = read_ray_cache(
        os.path.join(root, "cache_sgs", "splits"))
    pool = RayPool(rays, rgbs, seed=seed)

    def batches(n):
        for _ in range(n):
            b = pool.next_batch(batch)
            yield {
                "rays": torch.from_numpy(b["rays"]),
                "rgbs": torch.from_numpy(b["rgbs"]),
                "ts": torch.from_numpy(b["ts"].astype(np.int64)),
                "semantics": torch.from_numpy(b["labels"].astype(np.int64)),
            }

    psnrs = []
    for tb in batches(warmup):
        _, _, p = system.train_step(tb)
        psnrs.append(p)
    system.attach_fine_octree(scene_config.get("voxel_size", 0.08))
    t0 = time.perf_counter()
    for tb in batches(steady):
        _, _, p = system.train_step(tb)
        psnrs.append(p)
    steady_s = (time.perf_counter() - t0) / max(steady, 1)

    rec = {
        "boundary_samples": boundary,
        "warmup_steps": warmup, "steady_steps": steady, "batch": batch,
        "psnr_tail": round(float(np.mean(psnrs[-max(len(psnrs) // 4, 1):])),
                           2),
        "steady_step_s": round(steady_s, 3),
        "steady_rays_per_sec": round(batch / steady_s, 1),
    }
    rec.update(extract_and_score(system, scene_config, out_dir,
                                 f"bd{boundary}"))
    json.dump(rec, open(res_path, "w"))
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", type=str, required=True)
    ap.add_argument("--warmup", type=int, default=200)
    ap.add_argument("--steady", type=int, default=600)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--boundaries", type=str, default="10,4")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    root = os.path.join(args.out_dir, "scene")
    from exp_wild_ablation import build_scene

    build_scene(root, seed=0)
    import yaml

    with open(os.path.join(root, "config.yaml")) as fh:
        scene_config = yaml.safe_load(fh)
    scene_config.setdefault("voxel_size", 0.08)

    rows = []
    for bd in (int(x) for x in args.boundaries.split(",")):
        rows.append(run_cell(root, scene_config, bd, args.warmup,
                             args.steady, args.batch, args.out_dir))
    print("\n| BOUNDARY | psnr | F@0.05 | F@0.1 | F@0.2 | steady s/step |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['boundary_samples']} | {r['psnr_tail']} | {r['f05']} "
              f"| {r['f10']} | {r['f20']} | {r['steady_step_s']} |")
    json.dump(rows, open(os.path.join(args.out_dir, "summary.json"), "w"),
              indent=1)


if __name__ == "__main__":
    main()
