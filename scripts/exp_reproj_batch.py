"""Wall-clock comparison: per-view vs packed multi-view DDA hit-code
rendering for the point-cloud reprojection filter (VERDICT r01 #10).

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/exp_reproj_batch.py --views 100
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=100)
    ap.add_argument("--img", type=int, nargs=2, default=(96, 72))
    args = ap.parse_args()

    from neuralrecon_w_tpu.evaluation.reproj_filter import (
        render_hit_codes, render_hit_codes_multi, voxelize_points,
    )
    from neuralrecon_w_tpu.ops.ray_voxel import make_device_grid

    rs = np.random.RandomState(0)
    surf = rs.randn(4000, 3)
    surf /= np.linalg.norm(surf, axis=-1, keepdims=True)
    grid = voxelize_points(surf, 0.05)
    dgrid = make_device_grid(grid)

    w, h = args.img
    K = np.array([[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1.0]])
    cameras = []
    for i in range(args.views):
        ang = 2 * np.pi * i / args.views
        eye = np.array([np.cos(ang) * 4, np.sin(ang) * 4,
                        1.5 * np.sin(5 * ang)])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        c2w = np.stack([right, -down, -fwd], axis=1)
        cameras.append((K, np.concatenate([c2w, eye[:, None]], 1), (w, h)))

    # warm both compiled paths
    render_hit_codes(dgrid, grid, *cameras[0])
    render_hit_codes_multi(dgrid, grid, cameras[:2])

    t0 = time.perf_counter()
    per_view = np.zeros(0, np.int64)
    for Kc, c2w, wh in cameras:
        per_view = np.union1d(per_view,
                              render_hit_codes(dgrid, grid, Kc, c2w, wh))
    t_per = time.perf_counter() - t0

    t0 = time.perf_counter()
    multi = render_hit_codes_multi(dgrid, grid, cameras)
    t_multi = time.perf_counter() - t0

    assert np.array_equal(per_view, multi)
    print(f"views={args.views} img={w}x{h} level={grid.level}")
    print(f"per-view : {t_per:.2f} s")
    print(f"packed   : {t_multi:.2f} s   speedup {t_per / t_multi:.1f}x")


if __name__ == "__main__":
    main()
