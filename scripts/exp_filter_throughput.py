"""Multi-view reprojection-filter throughput: per-view DDA dispatches vs
the packed fixed-shape batches of render_hit_codes_multi.

Measures the throughput intent of the reference's ray-actor fan-out
(reference utils/reproj_filter.py:172,277-288) on one chip: N eval
cameras orbiting a synthetic voxelized sphere, identical hit-code sets
required from both paths.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/exp_filter_throughput.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from neuralrecon_w_tpu.evaluation.reproj_filter import (
    render_hit_codes,
    render_hit_codes_multi,
    voxelize_points,
)
from neuralrecon_w_tpu.ops.ray_voxel import make_device_grid


def make_cameras(n_views, wh=(64, 48), radius=2.5):
    w, h = wh
    f = 0.8 * w
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float64)
    cams = []
    for i in range(n_views):
        az = 2 * np.pi * i / n_views
        el = 0.35 * np.sin(3.0 * az)
        eye = radius * np.array(
            [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)]
        )
        fwd = -eye / np.linalg.norm(eye)
        world_up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, world_up)
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        # NeRF camera: looks down -z, y up (datasets/rays.py:14-35)
        c2w = np.stack([right, up, -fwd, eye], axis=1)  # (3, 4)
        cams.append((K, c2w, wh))
    return cams


def main(n_views=100):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(20000, 3))
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    grid = voxelize_points(pts, voxel_size=0.03)
    dgrid = make_device_grid(grid)
    cams = make_cameras(n_views)

    # warm both compiled shapes before timing
    multi = render_hit_codes_multi(dgrid, grid, cams[:2])
    single = render_hit_codes(dgrid, grid, cams[0][0], cams[0][1], cams[0][2])

    t0 = time.perf_counter()
    codes_multi = render_hit_codes_multi(dgrid, grid, cams)
    t_multi = time.perf_counter() - t0

    t0 = time.perf_counter()
    per_view = []
    for K, c2w, wh in cams:
        per_view.append(render_hit_codes(dgrid, grid, K, c2w, wh))
    codes_single = np.unique(np.concatenate([c for c in per_view if len(c)]))
    t_single = time.perf_counter() - t0

    assert np.array_equal(np.sort(codes_multi), codes_single), (
        len(codes_multi), len(codes_single))
    out = {
        "n_views": n_views,
        "rays": int(sum(wh[0] * wh[1] for _, _, wh in cams)),
        "hit_codes": int(len(codes_multi)),
        "per_view_s": round(t_single, 3),
        "packed_s": round(t_multi, 3),
        "speedup": round(t_single / t_multi, 2),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
