"""Reprojection visibility filtering of reconstructed geometry.

Reference behavior (reference utils/reproj_filter.py:101-300): render the
predicted mesh (pyrender/EGL) or point cloud (kaolin SPC ray-marcher)
from every training camera, back-project valid depths, and keep target
vertices observed from at least one view — removing hallucinated
geometry never seen by any camera before scoring.

TPU-native redesign, both reference modes:

* **mesh mode** (faces present, like the reference's trimesh/pyrender
  branch, reproj_filter.py:101-110): a native z-buffer triangle
  rasterizer (csrc/geometry.cpp nw_rasterize_depth; numpy fallback)
  renders per-view depth, valid pixels are back-projected to world
  points (reproject(), reproj_filter.py:133-152), and target vertices
  within 2*sqrt(2)*voxel_size of any back-projected point survive
  (the KD-tree match at reproj_filter.py:236-241, scipy cKDTree).
* **point-cloud mode** (no faces): vertices are voxelized into the
  sparse occupancy grid and every camera's pixel rays are marched with
  the DDA traversal kernel (ops/ray_voxel.py) in one batched device
  call per view; a hit pixel contributes the morton code of its first
  intersected voxel. A vertex survives if its voxel code was hit from
  any view — the voxel-id index-set match of the reference's kaolin
  path (reference utils/kaolin_renderer.py:110-141,
  reproj_filter.py:202-243).

View-level parallelism is the device batch / vectorized raster, not
`ray` actors.
"""

from __future__ import annotations

import numpy as np

from ..datasets.rays import get_ray_directions, get_rays
from ..ops.morton import points_to_morton
from ..ops.native import rasterize_depth_native
from ..ops.ray_voxel import DeviceGrid, make_device_grid, traverse
from ..ops.voxel_grid import VoxelGrid, _sort_coords, level_for_voxel_size


def voxelize_points(verts: np.ndarray, voxel_size: float) -> VoxelGrid:
    """Bounding-cube grid over the vertex set at the requested voxel
    size (reference kaolin_renderer.vertex_table builds the same SPC,
    utils/kaolin_renderer.py:60-108)."""
    vmin = verts.min(axis=0)
    vmax = verts.max(axis=0)
    origin = (vmin + vmax) / 2
    scale = float(np.max(vmax - vmin) / 2 * 1.01 + 1e-6)
    level = max(level_for_voxel_size(scale, voxel_size, "floor"), 1)
    # two-level occupancy (ops/ray_voxel.HierGrid) keeps deep grids
    # small; 12 bounds the worst-case DDA trip count, not memory
    level = min(level, 12)
    res = 1 << level
    cells = np.clip(
        np.floor(((verts - origin) / scale + 1.0) / 2.0 * res), 0, res - 1
    ).astype(np.int64)
    return VoxelGrid(level, origin, scale, _sort_coords(cells, level))


def vertex_voxel_codes(grid: VoxelGrid, verts: np.ndarray) -> np.ndarray:
    res = grid.res
    cells = np.clip(
        np.floor(((verts - grid.origin) / grid.scale + 1.0) / 2.0 * res),
        0, res - 1,
    ).astype(np.int64)
    return points_to_morton(cells)


def render_hit_codes(
    dgrid: DeviceGrid,
    grid: VoxelGrid,
    K: np.ndarray,
    c2w: np.ndarray,
    img_wh: tuple,
    chunk: int = 262144,
) -> np.ndarray:
    """Morton codes of the first voxel hit by each pixel ray of one view.

    Returns the unique hit-code set for the view (device DDA, host
    quantization of the entry points)."""
    import jax.numpy as jnp

    w, h = img_wh
    dirs = get_ray_directions(h, w, K)
    rays_o, rays_d = get_rays(dirs, c2w)

    res = grid.res
    cell_w = 2.0 / res
    codes = []
    for i in range(0, len(rays_o), chunk):
        o = (rays_o[i : i + chunk] - grid.origin) / grid.scale
        d = rays_d[i : i + chunk]
        t_first, _, hit = traverse(
            dgrid, grid.level, jnp.asarray(o, jnp.float32),
            jnp.asarray(d, jnp.float32), first_only=True,
        )
        t_first = np.asarray(t_first)
        hit = np.asarray(hit)
        if not hit.any():
            continue
        pos = o[hit] + d[hit] * (t_first[hit, None] + 1e-5)
        cells = np.clip(np.floor((pos + 1.0) / cell_w), 0, res - 1).astype(np.int64)
        codes.append(points_to_morton(cells))
    if not codes:
        return np.zeros(0, np.int64)
    return np.unique(np.concatenate(codes))


def render_hit_codes_multi(
    dgrid,
    grid: VoxelGrid,
    cameras: list,
    chunk: int = 262144,
) -> np.ndarray:
    """Unique first-hit voxel codes over MANY views in fixed-shape
    device batches.

    The per-view path dispatches one DDA call per view; with hundreds of
    eval cameras (and small images) the lockstep while_loop runs mostly
    empty. Packing rays from as many views as fit into each
    ``chunk``-sized call keeps every lane busy and pads the final batch
    to the same shape, so XLA compiles exactly one traversal — the
    throughput role of the reference's `ray` actor fan-out
    (reference utils/reproj_filter.py:172,277-288)."""
    import jax.numpy as jnp

    res = grid.res
    cell_w = 2.0 / res
    codes = []
    buf_o, buf_d, n_buf = [], [], 0

    def flush():
        nonlocal buf_o, buf_d, n_buf
        if n_buf == 0:
            return
        o = (np.concatenate(buf_o) - grid.origin) / grid.scale
        d = np.concatenate(buf_d)
        n = len(o)
        pad = (-n) % chunk
        if pad:  # pad the TAIL to the compiled shape with guaranteed
            # misses — every slice below must be exactly chunk-sized or
            # the while_loop recompiles per odd remainder
            o = np.concatenate([o, np.full((pad, 3), 4.0)])
            d = np.concatenate([d, np.tile([[0.0, 0.0, 1.0]], (pad, 1))])
        for i in range(0, len(o), chunk):
            t_first, _, hit = traverse(
                dgrid, grid.level, jnp.asarray(o[i:i + chunk], jnp.float32),
                jnp.asarray(d[i:i + chunk], jnp.float32), first_only=True,
            )
            t_first = np.asarray(t_first)[: max(min(n - i, chunk), 0)]
            hit = np.asarray(hit)[: max(min(n - i, chunk), 0)]
            if not hit.any():
                continue
            oo, dd = o[i:i + chunk][: len(hit)], d[i:i + chunk][: len(hit)]
            pos = oo[hit] + dd[hit] * (t_first[hit, None] + 1e-5)
            cells = np.clip(
                np.floor((pos + 1.0) / cell_w), 0, res - 1
            ).astype(np.int64)
            codes.append(points_to_morton(cells))
        buf_o, buf_d, n_buf = [], [], 0

    for K, c2w, wh in cameras:
        w, h = wh
        dirs = get_ray_directions(h, w, K)
        rays_o, rays_d = get_rays(dirs, c2w)
        buf_o.append(rays_o)
        buf_d.append(rays_d)
        n_buf += len(rays_o)
        if n_buf >= chunk:
            flush()
    flush()
    if not codes:
        return np.zeros(0, np.int64)
    return np.unique(np.concatenate(codes))


def voxel_depth_map(
    dgrid: DeviceGrid,
    grid: VoxelGrid,
    K: np.ndarray,
    c2w: np.ndarray,
    img_wh: tuple,
    chunk: int = 262144,
) -> np.ndarray:
    """Per-pixel first-hit depth (SFM units; 0 = miss) for one view —
    the depth-raster product of the reference's kaolin/pyrender
    renderers (reference utils/kaolin_renderer.py:110-141,
    utils/pyrender_renderer.py:4-39)."""
    import jax.numpy as jnp

    w, h = img_wh
    dirs = get_ray_directions(h, w, K)
    rays_o, rays_d = get_rays(dirs, c2w)
    depth = np.zeros(len(rays_o), np.float32)
    for i in range(0, len(rays_o), chunk):
        o = (rays_o[i : i + chunk] - grid.origin) / grid.scale
        d = rays_d[i : i + chunk]
        t_first, _, hit = traverse(
            dgrid, grid.level, jnp.asarray(o, jnp.float32),
            jnp.asarray(d, jnp.float32), first_only=True,
        )
        depth[i : i + chunk] = np.where(
            np.asarray(hit), np.asarray(t_first) * grid.scale, 0.0
        )
    return depth.reshape(h, w)


def _rasterize_depth_numpy(verts, faces, c2w, K, width, height,
                           znear=1e-4):
    """Per-face-loop z-buffer rasterizer — fallback when the native
    library (csrc/geometry.cpp nw_rasterize_depth) is absent. Same
    conventions: NeRF c2w in, CV z-depth out (0 = miss)."""
    R = np.asarray(c2w, np.float64)[:3, :3]
    t = np.asarray(c2w, np.float64)[:3, 3]
    cam = (verts - t) @ R  # R^T (X - t), rows
    cam = cam * np.array([1.0, -1.0, -1.0])  # CV: z forward
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    zbuf = np.full((height, width), np.inf, np.float32)
    tri = cam[np.asarray(faces, np.int64)]  # (F, 3, 3)
    # conservative near-plane handling: drop faces with any vertex
    # behind znear (the native path clips properly)
    ok = (tri[:, :, 2] > znear).all(axis=1)
    for a, b, c in tri[ok]:
        pa = np.array([fx * a[0] / a[2] + cx, fy * a[1] / a[2] + cy])
        pb = np.array([fx * b[0] / b[2] + cx, fy * b[1] / b[2] + cy])
        pc = np.array([fx * c[0] / c[2] + cx, fy * c[1] / c[2] + cy])
        area = (pb[0] - pa[0]) * (pc[1] - pa[1]) - (pb[1] - pa[1]) * (pc[0] - pa[0])
        if abs(area) < 1e-12:
            continue
        x0 = max(int(np.floor(min(pa[0], pb[0], pc[0]))), 0)
        x1 = min(int(np.ceil(max(pa[0], pb[0], pc[0]))), width - 1)
        y0 = max(int(np.floor(min(pa[1], pb[1], pc[1]))), 0)
        y1 = min(int(np.ceil(max(pa[1], pb[1], pc[1]))), height - 1)
        if x1 < x0 or y1 < y0:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
        w0 = ((pb[0] - xs) * (pc[1] - ys) - (pb[1] - ys) * (pc[0] - xs)) / area
        w1 = ((pc[0] - xs) * (pa[1] - ys) - (pc[1] - ys) * (pa[0] - xs)) / area
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        iz = w0 / a[2] + w1 / b[2] + w2 / c[2]
        z = np.where(inside, 1.0 / np.maximum(iz, 1e-12), np.inf).astype(np.float32)
        patch = zbuf[y0:y1 + 1, x0:x1 + 1]
        np.minimum(patch, z, out=patch)
    return np.where(np.isinf(zbuf), 0.0, zbuf)


def mesh_depth_map(verts, faces, K, c2w, img_wh, znear=1e-4):
    """(h, w) z-buffer depth of the mesh from one training camera —
    the reference's pyrender/EGL offscreen render
    (utils/pyrender_renderer.py:4-39). 0 = miss."""
    w, h = img_wh
    d = rasterize_depth_native(verts, faces, c2w, K, w, h, znear)
    if d is None:
        d = _rasterize_depth_numpy(verts, faces, c2w, K, w, h, znear)
    return d


def backproject_depth(depth, K, c2w):
    """Valid depth pixels -> world points (reference reproject(),
    utils/reproj_filter.py:133-152): pc_cam = K^-1 [u, v, 1]^T * z."""
    h, w = depth.shape
    v, u = np.nonzero(depth > 0)
    if len(u) == 0:
        return np.zeros((0, 3), np.float64)
    z = depth[v, u].astype(np.float64)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    x = (u - cx) / fx * z
    y = (v - cy) / fy * z
    cam = np.stack([x, -y, -z], axis=-1)  # CV -> NeRF camera frame
    R = np.asarray(c2w, np.float64)[:3, :3]
    t = np.asarray(c2w, np.float64)[:3, 3]
    return cam @ R.T + t


def reprojection_filter(
    verts: np.ndarray,
    faces: np.ndarray | None,
    cameras: list,
    voxel_size: float,
    chunk: int = 262144,
    target_verts: np.ndarray | None = None,
    workers: int = 0,
):
    """Keep vertices observed from >= 1 training view.

    Mesh mode (faces present): rasterize the mesh depth per view,
    back-project, KD-tree match target vertices within
    2*sqrt(2)*voxel_size (reference utils/reproj_filter.py:236-241).
    Point-cloud mode (no faces): DDA voxel-hit-code matching.

    Args:
        verts: (V, 3) SFM-frame vertices of the mesh/point cloud — both
            the render source and (by default) the filter target, like
            the reference's src_file == target_file usage.
        faces: optional (F, 3) triangle indices.
        cameras: [(K 3x3, c2w 3x4, (w, h))] for every training image.
        voxel_size: match radius scale in SFM units (the reference
            matches by voxel id / 2*sqrt(2)*voxel_size KD radius).
        target_verts: optional distinct target vertex set to filter
            (reference --target_file); defaults to `verts`.
        workers: >0 parallelizes per-view work with a thread pool (the
            native rasterizer and scipy release the GIL) — the
            host-concurrency replacement for the reference's `ray`
            actors (reference utils/reproj_filter.py:172,277-288).
    Returns (kept_verts, kept_faces, keep_mask) over the target set.
    """
    target = verts if target_verts is None else target_verts

    if faces is not None and len(faces):
        from scipy.spatial import cKDTree

        tree = cKDTree(target)
        radius = 2.0 * np.sqrt(2.0) * voxel_size
        keep = np.zeros(len(target), bool)

        def view_hits(cam):
            K, c2w, wh = cam
            depth = mesh_depth_map(verts, faces, K, c2w, wh)
            pts = backproject_depth(depth, K, c2w)
            if not len(pts):
                return np.zeros(0, np.int64)
            d, idx = tree.query(pts, k=1, distance_upper_bound=radius)
            return idx[np.isfinite(d)]

        if workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=workers) as pool:
                for idx in pool.map(view_hits, cameras):
                    keep[idx] = True
        else:
            for cam in cameras:
                keep[view_hits(cam)] = True
    else:
        grid = voxelize_points(verts, voxel_size)
        dgrid = make_device_grid(grid)
        observed = render_hit_codes_multi(dgrid, grid, cameras, chunk)
        vcodes = vertex_voxel_codes(grid, target)
        keep = np.isin(vcodes, observed)

    kept_verts = target[keep]
    kept_faces = None
    if faces is not None and len(faces) and target_verts is None:
        remap = -np.ones(len(target), np.int64)
        remap[keep] = np.arange(keep.sum())
        f = remap[faces]
        kept_faces = f[(f >= 0).all(axis=1)]
    return kept_verts, kept_faces, keep
