"""Validation: whole-image rendering + inline mesh F-score.

Reference behavior (reference lightning_modules/neuconw_system.py:404-546):
chunked render of one held-out image with the SFM-octree near/far
override enabled, PSNR on the result, depth/normal visualizations, an
inline mesh extraction at dim 128 (plus a detail box at 256), and an
F-score against gt.ply when present.
"""

from __future__ import annotations

import os

import numpy as np

from ..datasets.phototourism import SceneMeta, build_image_rays
from ..rendering.renderer import SceneInfo


def visualize_depth(depth: np.ndarray, near_p: float = 1.0, far_p: float = 99.0):
    """Percentile-normalized jet colormap of a depth image, uint8
    (reference utils/visualization.py:13-25)."""
    import matplotlib

    d = np.asarray(depth, np.float64)
    finite = d[np.isfinite(d) & (d > 0)]
    lo, hi = (np.percentile(finite, [near_p, far_p]) if finite.size else (0.0, 1.0))
    x = np.clip((d - lo) / max(hi - lo, 1e-8), 0, 1)
    rgba = matplotlib.colormaps["jet"](x)
    return (rgba[..., :3] * 255).astype(np.uint8)


def render_image(
    render_chunk,
    params,
    scene: SceneInfo,
    rays: np.ndarray,
    ts: np.ndarray,
    labels: np.ndarray,
    img_wh: tuple,
    chunk: int = 512,
    fine_grid=None,
    sfm_grid=None,
    rng=None,
    mesh=None,
    scan_render=None,
):
    """Chunked full-image render. render_chunk is make_render_fn's jitted
    function; chunk matches --test_batch_size (reference
    scripts/train.sh:19). With a multi-device ``mesh``, each chunk's
    rays are sharded over the data axis (params/scene/grids replicated)
    and XLA's SPMD partitioner splits the per-ray pipeline — the
    multi-chip replacement for the reference's single-GPU validation
    render (reference neuconw_system.py:404-430). With ``scan_render``
    (make_scan_render_fn's jitted function) the whole frame renders in
    ONE device dispatch instead of a host chunk loop — the serving
    path; the mesh path keeps the per-chunk loop. Returns dict of
    (H, W, ...) images."""
    import jax
    import jax.numpy as jnp

    if rng is None:
        rng = jax.random.PRNGKey(0)
    w, h = img_wh
    n = len(rays)
    pad = (-n) % chunk
    if pad:
        rays = np.concatenate([rays, np.repeat(rays[-1:], pad, 0)], 0)
        ts = np.concatenate([ts, np.repeat(ts[-1:], pad, 0)])
        labels = np.concatenate([labels, np.repeat(labels[-1:], pad, 0)])

    put = jnp.asarray
    from ..parallel.mesh import DATA_AXIS

    if mesh is not None and int(mesh.shape.get(DATA_AXIS, 1)) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_shards = int(mesh.shape[DATA_AXIS])
        if chunk % n_shards:
            raise ValueError(f"chunk {chunk} must divide over {n_shards} devices")
        rep = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P(DATA_AXIS))
        params, scene, fine_grid, sfm_grid, rng = jax.device_put(
            (params, scene, fine_grid, sfm_grid, rng), rep)
        put = lambda a: jax.device_put(jnp.asarray(a), shard)  # noqa: E731

    if scan_render is not None and (
            mesh is None or int(mesh.shape.get(DATA_AXIS, 1)) == 1):
        out = scan_render(params, scene, jnp.asarray(rays),
                          jnp.asarray(ts), jnp.asarray(labels), rng,
                          fine_grid, sfm_grid)
        return {
            "color": np.asarray(out["color"])[:n].reshape(h, w, 3),
            "depth": np.asarray(out["depth"])[:n].reshape(h, w),
            "normal": np.asarray(out["normal"])[:n].reshape(h, w, 3),
        }

    colors, depths, normals = [], [], []
    for i in range(0, len(rays), chunk):
        out = render_chunk(
            params, scene, put(rays[i : i + chunk]),
            put(ts[i : i + chunk]), put(labels[i : i + chunk]),
            rng, fine_grid, sfm_grid,
        )
        colors.append(np.asarray(out["color"]))
        depths.append(np.asarray(out["depth"]))
        g = np.asarray(out["gradients"])
        wgt = np.asarray(out["weights"])[:, : g.shape[1], None]
        normals.append((g * wgt).sum(axis=1))
    color = np.concatenate(colors)[:n].reshape(h, w, 3)
    depth = np.concatenate(depths)[:n].reshape(h, w)
    normal = np.concatenate(normals)[:n].reshape(h, w, 3)
    return {"color": color, "depth": depth, "normal": normal}


def validation_report(
    render_chunk, params, scene: SceneInfo, meta: SceneMeta, id_: int,
    chunk: int = 512, fine_grid=None, sfm_grid=None, out_dir: str | None = None,
    step: int = 0, mesh=None,
) -> dict:
    """Render the val image, compute PSNR, optionally write a
    GT/pred/depth/normal grid PNG. Returns scalar metrics."""
    from ..datasets.phototourism import load_image
    from .metrics import psnr as psnr_fn

    img = load_image(meta, id_)
    h, w = img.shape[:2]
    rays, rgbs = build_image_rays(meta, id_, with_semantics=False)
    ts = rays[:, 8].astype(np.int32)
    labels = np.zeros((len(rays),), np.int32)
    rays10 = np.concatenate([rays[:, :8], rays[:, 9:11]], axis=1)

    out = render_image(render_chunk, params, scene, rays10, ts, labels,
                       (w, h), chunk, fine_grid, sfm_grid, mesh=mesh)
    import jax.numpy as jnp

    val_psnr = float(psnr_fn(jnp.asarray(out["color"]), jnp.asarray(img)))

    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        from PIL import Image as PILImage

        depth_vis = visualize_depth(out["depth"])
        nrm = out["normal"]
        nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-6)
        nrm_vis = ((nrm * 0.5 + 0.5) * 255).astype(np.uint8)
        pred_vis = (np.clip(out["color"], 0, 1) * 255).astype(np.uint8)
        gt_vis = (img * 255).astype(np.uint8)
        grid = np.concatenate(
            [np.concatenate([gt_vis, pred_vis], axis=1),
             np.concatenate([depth_vis, nrm_vis], axis=1)], axis=0,
        )
        PILImage.fromarray(grid).save(os.path.join(out_dir, f"val_{step}.png"))
    return {"val/psnr": val_psnr}
