"""Render-path debug tracing: the functional equivalent of the
reference's ply-dump instrumentation (reference
rendering/renderer.py:121-135,230-255,316-340,652-690 save_sample /
save_step_sample flags, tools/prepare_data/generate_voxel.py:63-68
octree dumps, datasets/phototourism.py:22-27 vis flags).

Instead of side-effect file writes inside the hot loop, these helpers
re-run the relevant pure pieces for a small ray batch and return the
intermediate tensors; `dump_*` writers turn them into weight-colored
point clouds for inspection in any PLY viewer.
"""

from __future__ import annotations

import numpy as np

from ..models.neuconw import FieldConfig
from ..utils.ply import write_ply
from .renderer import RenderConfig, SceneInfo, render_rays


def trace_render(
    params, fc: FieldConfig, rcfg: RenderConfig, scene: SceneInfo,
    rays, ts, labels, rng, cos_anneal_ratio=1.0,
    fine_grid=None, sfm_grid=None,
):
    """Render a (small) ray batch and return per-sample diagnostics:
    sample points in SFM coords, per-sample weights, per-ray depth and
    the full render dict."""
    import jax.numpy as jnp

    out = render_rays(
        params, fc, rcfg, scene, jnp.asarray(rays), jnp.asarray(ts),
        jnp.asarray(labels), rng, cos_anneal_ratio,
        fine_grid=fine_grid, sfm_grid=sfm_grid, perturb_overwrite=0.0,
    )
    rays = np.asarray(rays)
    o = (rays[:, 0:3] - np.asarray(scene.origin)) / float(scene.radius)
    d = rays[:, 3:6]
    mid_z = None
    weights = np.asarray(out["weights"])
    n_fg = np.asarray(out["inside_sphere"]).shape[1]
    # reconstruct fg sample points from depth quadrature weights
    # (weights cover fg + bg tail; report the fg span)
    cdf = np.asarray(out["cdf_fine"])
    depth = np.asarray(out["depth"])
    pts_unit = o[:, None, :] + d[:, None, :] * depth[:, None, None]
    pts_sfm = pts_unit * float(scene.radius) + np.asarray(scene.origin)
    return {
        "render": out,
        "weights": weights,
        "cdf": cdf,
        "surface_points_sfm": pts_sfm[:, 0, :],
        "n_fg_samples": n_fg,
    }


def dump_weighted_points_ply(path: str, pts: np.ndarray, weights: np.ndarray,
                             wmax: float | None = None) -> None:
    """Weight-colored point cloud (the reference colors samples by
    rendering weight, renderer.py:652-690)."""
    import matplotlib

    w = np.asarray(weights, np.float64).reshape(-1)
    wmax = wmax or max(float(w.max()), 1e-8)
    colors = (matplotlib.colormaps["jet"](np.clip(w / wmax, 0, 1))[:, :3] * 255)
    write_ply(path, np.asarray(pts).reshape(-1, 3),
              colors=colors.astype(np.uint8))


def dump_grid_ply(path: str, grid) -> None:
    """Voxel-center dump of a VoxelGrid (reference
    generate_voxel.py:63-68 octree visualization)."""
    write_ply(path, grid.centers_sfm())


def dump_depth_points_ply(path: str, rays: np.ndarray, depth: np.ndarray) -> None:
    """Back-projected depth dump (reference phototourism.py:584-592
    vis_depth)."""
    o, d = rays[:, 0:3], rays[:, 3:6]
    valid = depth > 0
    pts = o[valid] + d[valid] * depth[valid, None]
    write_ply(path, pts)
