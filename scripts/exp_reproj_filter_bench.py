"""Wall-clock comparison of the multi-view eval-filter paths.

The reference fans per-view reprojection rendering out over `ray`
actors (reference utils/reproj_filter.py:172,277-288). Our replacements
are (a) point-cloud mode: packing rays from many views into fixed-shape
device DDA batches (render_hit_codes_multi) instead of one under-filled
traversal dispatch per view, and (b) mesh mode: a GIL-releasing thread
pool over the native rasterizer. This script measures both against
their naive per-view baselines on a 100-view synthetic scene and prints
one JSON line per mode.

Usage: python scripts/exp_reproj_filter_bench.py [n_views] [img_side]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neuralrecon_w_tpu.evaluation.reproj_filter import (  # noqa: E402
    make_device_grid, render_hit_codes, render_hit_codes_multi,
    voxelize_points,
)


def synthetic_cameras(n_views: int, side: int, dist: float = 3.0):
    """Fibonacci-sphere camera ring looking at the origin, NeRF c2w
    (right-up-back) like the eval pipeline's cameras."""
    K = np.array([[side * 0.8, 0, side / 2],
                  [0, side * 0.8, side / 2],
                  [0, 0, 1.0]])
    cameras = []
    golden = np.pi * (3.0 - np.sqrt(5.0))
    for i in range(n_views):
        z = 1.0 - 2.0 * (i + 0.5) / n_views
        r = np.sqrt(max(1.0 - z * z, 0.0))
        th = golden * i
        eye = dist * np.array([r * np.cos(th), r * np.sin(th), z])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 0.0, 1.0])
        if abs(fwd @ up) > 0.99:
            up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        c2w = np.stack([right, -down, -fwd], axis=1)
        c2w = np.concatenate([c2w, eye[:, None]], axis=1)
        cameras.append((K, c2w, (side, side)))
    return cameras


def main():
    n_views = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 96

    rs = np.random.RandomState(0)
    pts = rs.randn(200_000, 3)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    cameras = synthetic_cameras(n_views, side)

    # --- point-cloud mode: per-view DDA dispatch vs packed batches ---
    grid = voxelize_points(pts, 0.02)
    dgrid = make_device_grid(grid)
    # warm both compiled shapes out of the timing
    render_hit_codes(dgrid, grid, *cameras[0])
    render_hit_codes_multi(dgrid, grid, cameras[:2])

    t0 = time.perf_counter()
    per_view = [render_hit_codes(dgrid, grid, K, c2w, wh)
                for K, c2w, wh in cameras]
    t_loop = time.perf_counter() - t0
    codes_loop = np.unique(np.concatenate(per_view))

    t0 = time.perf_counter()
    codes_multi = render_hit_codes_multi(dgrid, grid, cameras)
    t_multi = time.perf_counter() - t0
    # RuntimeError, not assert: the agreement check IS the result (and
    # must survive python -O); the JSON field is what the contract test
    # pins
    if not np.array_equal(codes_loop, codes_multi):
        raise RuntimeError("packed path diverged from per-view dispatch")

    print(json.dumps({
        "mode": "point_cloud_dda", "n_views": n_views, "img_side": side,
        "per_view_s": round(t_loop, 2), "packed_s": round(t_multi, 2),
        "speedup": round(t_loop / t_multi, 2), "paths_agree": True,
    }))

    # --- mesh mode: serial loop vs thread pool over the rasterizer ---
    from scipy.spatial import ConvexHull

    from neuralrecon_w_tpu.evaluation.reproj_filter import (
        reprojection_filter,
    )

    tri_pts = pts[:3000]
    hull = ConvexHull(tri_pts)
    verts, hull_faces = tri_pts, hull.simplices

    # warm one-time costs (native rasterizer load, first cKDTree build)
    # out of the serial-vs-pool comparison
    reprojection_filter(verts, hull_faces, cameras[:1],
                        voxel_size=0.02, workers=0)

    t0 = time.perf_counter()
    _, _, m0 = reprojection_filter(verts, hull_faces, cameras,
                                   voxel_size=0.02, workers=0)
    t_serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    _, _, m8 = reprojection_filter(verts, hull_faces, cameras,
                                   voxel_size=0.02, workers=8)
    t_pool = time.perf_counter() - t0
    if not np.array_equal(m0, m8):
        raise RuntimeError("threaded mesh filter diverged from serial")
    print(json.dumps({
        "mode": "mesh_raster", "n_views": n_views, "img_side": side,
        "serial_s": round(t_serial, 2), "pool8_s": round(t_pool, 2),
        "speedup": round(t_serial / t_pool, 2), "paths_agree": True,
    }))


if __name__ == "__main__":
    main()
