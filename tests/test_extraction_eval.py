"""Mesh extraction + evaluation toolchain tests.

The geometric-init SDF is approximately sphere(0.5) in unit coords, so
extraction against a fresh model must produce a near-spherical mesh —
this exercises the full sweep -> scatter -> marching -> rescale chain
without any training."""

import os

import numpy as np
import jax
import pytest

from neuralrecon_w_tpu.config import get_cfg_defaults
from neuralrecon_w_tpu.evaluation import (
    bbx_crop,
    compute_prf,
    eval_mesh,
    eval_mesh_arrays,
    nn_distances,
    reprojection_filter,
    sample_mesh_surface,
    voxel_point_crop,
)
from neuralrecon_w_tpu.extraction import (
    dense_eval_grid,
    extract_mesh,
    save_mesh_ply,
    sparse_eval_grid,
)
from neuralrecon_w_tpu.models import field_config_from_cfg, init_field
from neuralrecon_w_tpu.utils.ply import read_ply, write_ply


def small_model():
    cfg = get_cfg_defaults()
    n = cfg.NEUCONW
    n.N_VOCAB = 8
    n.SDF_CONFIG.d_hidden = 64
    n.SDF_CONFIG.d_out = 65
    n.SDF_CONFIG.n_layers = 4
    n.SDF_CONFIG.skip_in = (2,)
    n.COLOR_CONFIG.d_feature = 64
    n.COLOR_CONFIG.d_hidden = 32
    n.COLOR_CONFIG.n_layers = 2
    n.COLOR_CONFIG.head_channels = 16
    fc = field_config_from_cfg(cfg)
    return fc, init_field(jax.random.PRNGKey(0), fc)


SCENE_ORIGIN = np.array([1.0, -2.0, 0.5])
SCENE_RADIUS = 2.0


def sphere_samples(n=2000, r=0.5 * SCENE_RADIUS, seed=1):
    rs = np.random.RandomState(seed)
    v = rs.randn(n, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return SCENE_ORIGIN + v * r


@pytest.mark.slow
def test_dense_extraction_lies_on_zero_set():
    """Extracted vertices must sit on the field's zero level set — the
    invariant that tests sweep->scatter->marching->rescale end to end
    regardless of how spherical the toy init happens to be."""
    from neuralrecon_w_tpu.models import field_sdf
    import jax.numpy as jnp

    fc, params = small_model()
    grid = dense_eval_grid(SCENE_ORIGIN, SCENE_RADIUS, dim=48)
    mesh = extract_mesh(params, fc, grid, SCENE_ORIGIN, SCENE_RADIUS, chunk=8192)
    assert mesh is not None and len(mesh.verts) > 100
    verts_unit = (mesh.verts - SCENE_ORIGIN) / SCENE_RADIUS
    sdf = np.asarray(field_sdf(params, fc, jnp.asarray(verts_unit, jnp.float32)))
    voxel_unit = grid.voxel_size / SCENE_RADIUS
    assert float(np.median(np.abs(sdf))) < voxel_unit, (
        np.median(np.abs(sdf)), voxel_unit)
    # blob roughly around the init sphere
    r = np.linalg.norm(verts_unit, axis=-1)
    assert 0.3 < float(np.median(r)) < 0.9
    # and the whole blob-vs-sphere comparison at a generous threshold
    m = eval_mesh_arrays(
        sample_mesh_surface(mesh.verts, mesh.faces, 3000), sphere_samples(),
        threshold=0.6,
    )
    assert m["fscore"] > 0.9, m


def test_sparse_extraction_and_ply_roundtrip(tmp_path):
    fc, params = small_model()
    # SFM points on the init-sphere surface so the sparse grid covers it
    pts = sphere_samples(800, seed=2)
    from neuralrecon_w_tpu.datasets.colmap import Point3D

    pts3d = {
        i + 1: Point3D(i + 1, pts[i], np.zeros(3, np.uint8), 0.5,
                       np.arange(5, dtype=np.int32), np.arange(5, dtype=np.int32))
        for i in range(len(pts))
    }
    scene_config = {
        "eval_bbx": [(SCENE_ORIGIN - 1.5).tolist(), (SCENE_ORIGIN + 1.5).tolist()],
        "sfm2gt": np.eye(4).tolist(),
        "min_track_length": 2,
        "voxel_size": 0.25,
    }
    # level 4 keeps the sparse-grid path + color + roundtrip coverage at
    # an 8x smaller sweep than level 5 (CPU fast-tier budget)
    grid = sparse_eval_grid(scene_config, pts3d, eval_level=4)
    assert grid.indices is not None and len(grid.points_sfm) > 0

    mesh = extract_mesh(params, fc, grid, SCENE_ORIGIN, SCENE_RADIUS,
                        chunk=8192, with_color=True, a_index=1)
    assert mesh is not None and mesh.colors is not None
    assert mesh.colors.shape == (len(mesh.verts), 3)

    path = str(tmp_path / "mesh.ply")
    save_mesh_ply(mesh, path)
    back = read_ply(path)
    assert len(back["verts"]) == len(mesh.verts)
    assert len(back["faces"]) == len(mesh.faces)
    np.testing.assert_allclose(back["verts"], mesh.verts, atol=1e-4)

    # sparse extraction vertices also sit on the zero set
    from neuralrecon_w_tpu.models import field_sdf
    import jax.numpy as jnp

    verts_unit = (mesh.verts - SCENE_ORIGIN) / SCENE_RADIUS
    sdf = np.asarray(field_sdf(params, fc, jnp.asarray(verts_unit, jnp.float32)))
    assert float(np.median(np.abs(sdf))) < grid.voxel_size / SCENE_RADIUS


def test_nn_distances_and_prf():
    a = np.array([[0, 0, 0], [1, 0, 0]], float)
    b = np.array([[0, 0, 0.1], [1, 0, 0], [5, 5, 5]], float)
    idx, d = nn_distances(b, a)
    np.testing.assert_allclose(d[:2], [0.1, 0.0], atol=1e-9)
    m = compute_prf(
        dist_gt_to_pred=np.array([0.01, 0.2]), dist_pred_to_gt=np.array([0.05, 0.5]),
        threshold=0.1,
    )
    assert m["prec"] == pytest.approx(0.5)
    assert m["recal"] == pytest.approx(0.5)
    assert m["fscore"] == pytest.approx(0.5)


def test_prf_empty_side_is_zero_not_nan():
    # prediction entirely cropped away: both distance sets come back
    # empty (nn_distances returns empty when the target set is empty);
    # the score must degrade to the 1e-6 floor, never NaN.
    m = compute_prf(np.zeros(0), np.zeros(0), threshold=0.1)
    assert m["fscore"] == pytest.approx(1e-6)
    assert m["dist1"] == float("inf") and m["dist2"] == float("inf")
    assert not any(np.isnan(v) for v in m.values())


def test_bbx_and_voxel_crop():
    pts = np.array([[0.1, 0.1, 0.1], [0.9, 0.9, 0.9], [5, 5, 5]], float)
    kept = bbx_crop(pts, [[-1, -1, -1], [1, 1, 1]])
    assert len(kept) == 2
    vox = np.array([[0.1, 0.1, 0.1]])
    kept2 = voxel_point_crop(pts[:2], vox, 0.3, [[-1, -1, -1], [1, 1, 1]])
    assert len(kept2) == 1 and np.allclose(kept2[0], pts[0])


def test_eval_mesh_file_flow(tmp_path):
    """Full file-based eval: identical sphere meshes -> F ~ 1."""
    from neuralrecon_w_tpu.ops.isosurface import marching_tetrahedra

    # analytic sphere SDF grid
    dim = 32
    ax = np.linspace(-1, 1, dim)
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1)
    sdf = np.linalg.norm(g, axis=-1) - 0.6
    verts, faces = marching_tetrahedra(sdf)
    verts = verts * (2.0 / (dim - 1)) - 1.0

    pred = str(tmp_path / "pred.ply")
    gt = str(tmp_path / "gt.ply")
    write_ply(pred, verts, faces=faces)
    write_ply(gt, verts + np.random.RandomState(0).randn(*verts.shape) * 0.002)

    scene_config = {
        "eval_bbx": [[-1, -1, -1], [1, 1, 1]],
        "sfm2gt": np.eye(4).tolist(),
    }
    res = eval_mesh(pred, gt, scene_config, is_mesh=True,
                    threshold=[0.05, 0.1], save_name="t",
                    write_visualizations=True)
    assert res["fscores"][0] > 0.99
    assert os.path.exists(tmp_path / "eval_t" / "metrics.json")
    assert os.path.exists(tmp_path / "eval_t" / "visualize" / "0.05" / "metrics.json")


def test_reprojection_filter_removes_hidden_points():
    """Surface points of a sphere seen by a camera ring survive; the
    occluded center voxel is filtered."""
    surf = sphere_samples(600, r=1.0, seed=3) - SCENE_ORIGIN  # sphere at origin
    hidden = np.zeros((5, 3))  # center points, always occluded
    verts = np.concatenate([surf, hidden])

    cameras = []
    K = np.array([[40.0, 0, 24], [0, 40.0, 18], [0, 0, 1]])
    for ang in np.linspace(0, 2 * np.pi, 6, endpoint=False):
        eye = np.array([np.cos(ang) * 4, np.sin(ang) * 4, 0.0])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        down = np.cross(fwd, right)
        # c2w with right-up-back convention (x right, y up, z backward)
        c2w = np.stack([right, -down, -fwd], axis=1)
        c2w = np.concatenate([c2w, eye[:, None]], axis=1)
        cameras.append((K, c2w, (48, 36)))

    kept, _, mask = reprojection_filter(verts, None, cameras, voxel_size=0.15)
    frac_surf = mask[: len(surf)].mean()
    assert frac_surf > 0.6, frac_surf
    assert not mask[len(surf):].any(), "occluded center points must be filtered"


def _ring_cameras(n=6, dist=4.0, K=None, wh=(48, 36)):
    if K is None:
        K = np.array([[40.0, 0, 24], [0, 40.0, 18], [0, 0, 1]])
    cameras = []
    for ang in np.linspace(0, 2 * np.pi, n, endpoint=False):
        eye = np.array([np.cos(ang) * dist, np.sin(ang) * dist, 0.0])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        down = np.cross(fwd, right)
        c2w = np.stack([right, -down, -fwd], axis=1)
        c2w = np.concatenate([c2w, eye[:, None]], axis=1)
        cameras.append((K, c2w, wh))
    return cameras


def _sphere_mesh(dim=24, r=0.6):
    from neuralrecon_w_tpu.ops.isosurface import marching_tetrahedra

    ax = np.linspace(-1, 1, dim)
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1)
    sdf = np.linalg.norm(g, axis=-1) - r
    verts, faces = marching_tetrahedra(sdf)
    return verts * (2.0 / (dim - 1)) - 1.0, faces


def test_mesh_depth_map_matches_analytic_sphere():
    """Rasterized depth of a sphere mesh ~ analytic ray-sphere depth
    (the reference's pyrender z-buffer, utils/pyrender_renderer.py)."""
    from neuralrecon_w_tpu.evaluation.reproj_filter import mesh_depth_map

    verts, faces = _sphere_mesh()
    (K, c2w, wh) = _ring_cameras(1)[0]
    depth = mesh_depth_map(verts, faces, K, c2w, wh)
    h, w = depth.shape
    assert (w, h) == wh

    # center pixel ray passes through the sphere center: z = dist - r
    cx, cy = int(K[0, 2]), int(K[1, 2])
    center = depth[cy, cx]
    assert abs(center - (4.0 - 0.6)) < 0.08, center
    # corners miss the sphere
    assert depth[0, 0] == 0.0 and depth[-1, -1] == 0.0
    # hit fraction ~ projected disk area
    frac = (depth > 0).mean()
    assert 0.02 < frac < 0.5, frac


def test_rasterizer_native_matches_numpy():
    from neuralrecon_w_tpu.evaluation.reproj_filter import (
        _rasterize_depth_numpy,
    )
    from neuralrecon_w_tpu.ops.native import rasterize_depth_native

    verts, faces = _sphere_mesh(dim=16)
    (K, c2w, wh) = _ring_cameras(1)[0]
    d_native = rasterize_depth_native(verts, faces, c2w, K, wh[0], wh[1])
    if d_native is None:
        pytest.skip("native geometry library not built")
    d_numpy = _rasterize_depth_numpy(verts, faces, c2w, K, wh[0], wh[1])
    # pixels exactly on a triangle edge may flip inclusion between the
    # two implementations (FMA rounding under -march=native); depths
    # must agree everywhere else
    disagree = np.abs(d_native - d_numpy) > 1e-4
    assert disagree.sum() <= max(3, int(0.002 * d_native.size)), disagree.sum()
    assert ((d_native > 0) & (d_numpy > 0)).sum() > 20


def test_reprojection_filter_mesh_mode():
    """Mesh mode: surface vertices seen by the camera ring survive;
    interior target points (occluded by the mesh from every view) drop
    (reference mesh branch, utils/reproj_filter.py:101-110,236-241)."""
    verts, faces = _sphere_mesh()
    hidden = np.zeros((5, 3))
    target = np.concatenate([verts, hidden])

    # resolution matters: each back-projected pixel marks one nearest
    # vertex (reference k=1 KD search), so pixels must outnumber verts
    K = np.array([[160.0, 0, 96], [0, 160.0, 72], [0, 0, 1]])
    cameras = _ring_cameras(6, K=K, wh=(192, 144))
    kept, _, mask = reprojection_filter(
        verts, faces, cameras, voxel_size=0.02, target_verts=target
    )
    frac_surf = mask[: len(verts)].mean()
    assert frac_surf > 0.7, frac_surf
    assert not mask[len(verts):].any(), "interior points must be filtered"


def test_reprojection_filter_mesh_mode_workers_match_serial():
    verts, faces = _sphere_mesh(dim=16)
    K = np.array([[160.0, 0, 96], [0, 160.0, 72], [0, 0, 1]])
    cameras = _ring_cameras(4, K=K, wh=(192, 144))
    _, _, m0 = reprojection_filter(verts, faces, cameras, voxel_size=0.02)
    _, _, m4 = reprojection_filter(verts, faces, cameras, voxel_size=0.02,
                                   workers=4)
    np.testing.assert_array_equal(m0, m4)


def test_reprojection_filter_mesh_mode_remaps_faces():
    verts, faces = _sphere_mesh()
    K = np.array([[160.0, 0, 96], [0, 160.0, 72], [0, 0, 1]])
    cameras = _ring_cameras(6, K=K, wh=(192, 144))
    kept, kept_faces, mask = reprojection_filter(
        verts, faces, cameras, voxel_size=0.02
    )
    assert kept_faces is not None
    if len(kept_faces):
        assert kept_faces.max() < len(kept)
    assert mask.mean() > 0.7


def test_render_hit_codes_multi_matches_per_view():
    """The packed multi-view DDA path returns exactly the union of the
    per-view hit-code sets, including with a partial padded last batch."""
    from neuralrecon_w_tpu.evaluation.reproj_filter import (
        render_hit_codes, render_hit_codes_multi, voxelize_points,
    )
    from neuralrecon_w_tpu.ops.ray_voxel import make_device_grid

    surf = sphere_samples(500, r=1.0, seed=7) - SCENE_ORIGIN
    grid = voxelize_points(surf, 0.15)
    dgrid = make_device_grid(grid)

    cameras = []
    K = np.array([[40.0, 0, 24], [0, 40.0, 18], [0, 0, 1]])
    for ang in np.linspace(0, 2 * np.pi, 7, endpoint=False):
        eye = np.array([np.cos(ang) * 4, np.sin(ang) * 4, 0.5])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        down = np.cross(fwd, right)
        c2w = np.stack([right, -down, -fwd], axis=1)
        c2w = np.concatenate([c2w, eye[:, None]], axis=1)
        cameras.append((K, c2w, (48, 36)))

    per_view = np.zeros(0, np.int64)
    for Kc, c2w, wh in cameras:
        per_view = np.union1d(
            per_view, render_hit_codes(dgrid, grid, Kc, c2w, wh)
        )
    # chunk 4000 forces several flushes, incl. overshooting ones
    # (3 views = 5184 rays > 4000): every traversal call must still see
    # exactly chunk-shaped inputs or the DDA while_loop recompiles per
    # odd remainder, defeating the single-compile contract
    import neuralrecon_w_tpu.evaluation.reproj_filter as rf

    seen_shapes = []
    real_traverse = rf.traverse

    def recording_traverse(dg, level, o, d, **kw):
        seen_shapes.append(tuple(o.shape))
        return real_traverse(dg, level, o, d, **kw)

    try:
        rf.traverse = recording_traverse
        multi = render_hit_codes_multi(dgrid, grid, cameras, chunk=4000)
    finally:
        rf.traverse = real_traverse
    np.testing.assert_array_equal(multi, per_view)
    assert set(seen_shapes) == {(4000, 3)}, seen_shapes
