import numpy as np
import pytest

from neuralrecon_w_tpu.ops.morton import morton_to_points, points_to_morton
from neuralrecon_w_tpu.ops.ray_voxel import (
    brute_force_near_far,
    device_grid_from_host,
    grid_near_far,
)
from neuralrecon_w_tpu.ops.voxel_grid import (
    VoxelGrid,
    expand_points,
    grid_from_points,
    level_for_voxel_size,
)


def test_morton_roundtrip():
    rng = np.random.RandomState(0)
    pts = rng.randint(0, 2**20, size=(1000, 3))
    codes = points_to_morton(pts)
    back = morton_to_points(codes)
    np.testing.assert_array_equal(back, pts)
    # z-order: sorted codes == lexicographic interleave order on a small grid
    small = np.array([[0, 0, 0], [0, 0, 1], [0, 1, 0], [1, 0, 0]])
    c = points_to_morton(small)
    assert c[0] == 0 and c[1] == 1 and c[2] == 2 and c[3] == 4


def test_expand_points():
    pts = np.array([[0.0, 0.0, 0.0]])
    out = expand_points(pts, 0.5)
    assert out.shape == (27, 3)
    assert np.abs(out).max() == pytest.approx(0.5)


def test_level_for_voxel_size():
    # 2*scale/voxel = 2*10/0.08 = 250 -> floor log2 = 7, ceil = 8
    assert level_for_voxel_size(10.0, 0.08, "floor") == 7
    assert level_for_voxel_size(10.0, 0.08, "ceil") == 8


def test_grid_from_points_quantization():
    pts = np.array([[0.1, 0.1, 0.1], [-0.9, 0.5, 0.2], [0.1, 0.1, 0.1]])
    grid = grid_from_points(
        pts, np.array([-1.0, -1, -1]), np.array([1.0, 1, 1]), voxel_size=0.25, expand=0
    )
    assert grid.level == 3  # floor(log2(2/0.25)) = 3
    assert grid.res == 8
    # dedup happened
    assert grid.coords.shape[0] == 2
    # each source point lies inside its quantized cell
    cells = np.floor((pts + 1.0) / 2.0 * grid.res).astype(np.int64)
    assert np.all(grid.contains(cells))


def test_upsample_downsample():
    grid = VoxelGrid(2, np.zeros(3), 1.0, np.array([[1, 2, 3]], dtype=np.int32))
    up = grid.upsample(4)
    assert up.coords.shape == (64, 3)
    assert up.voxel_size == pytest.approx(grid.voxel_size / 4)
    down = up.downsample(2)
    np.testing.assert_array_equal(down.coords, grid.coords)


def test_occupancy_words_bits():
    grid = VoxelGrid(2, np.zeros(3), 1.0, np.array([[0, 0, 0], [3, 3, 3]], np.int32))
    words = grid.occupancy_words()
    assert words.shape == (2,)  # 64 cells / 32
    assert words[0] & 1  # linear idx 0
    assert (words[1] >> 31) & 1  # linear idx 63


def test_contains():
    grid = VoxelGrid(3, np.zeros(3), 1.0, np.array([[1, 2, 3], [4, 5, 6]], np.int32))
    res = grid.contains(np.array([[1, 2, 3], [0, 0, 0], [4, 5, 6]]))
    np.testing.assert_array_equal(res, [True, False, True])


def _random_grid_and_rays(seed=0, level=5, n_vox=40, n_rays=64):
    rng = np.random.RandomState(seed)
    coords = np.unique(rng.randint(0, 2**level, size=(n_vox, 3)), axis=0)
    grid = VoxelGrid(level, np.array([1.0, -2.0, 0.5]), 3.0, coords.astype(np.int32))
    # rays from outside the cube, aimed at random voxel centers
    origins = grid.origin + np.array([0.0, 0.0, -2.5 * grid.scale]) + rng.randn(n_rays, 3) * 0.5
    targets = grid.centers_sfm()[rng.randint(0, len(coords), n_rays)]
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return grid, origins.astype(np.float32), dirs.astype(np.float32)


def test_dda_matches_brute_force():
    grid, rays_o, rays_d = _random_grid_and_rays()
    dgrid = device_grid_from_host(grid)
    near, far, valid = grid_near_far(dgrid, grid.level, rays_o, rays_d)
    near_bf, far_bf, valid_bf = brute_force_near_far(grid, rays_o, rays_d)

    near, far, valid = np.asarray(near), np.asarray(far), np.asarray(valid)
    np.testing.assert_array_equal(valid, valid_bf)
    assert valid.sum() > len(valid) * 0.9  # rays were aimed at voxels
    np.testing.assert_allclose(near[valid], near_bf[valid], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(far[valid], far_bf[valid], rtol=1e-3, atol=1e-4)
    assert np.all(far[valid] - near[valid] > -1e-4)


def test_dda_first_only_matches_near():
    grid, rays_o, rays_d = _random_grid_and_rays(seed=3)
    dgrid = device_grid_from_host(grid)
    near_full, _, valid_full = grid_near_far(dgrid, grid.level, rays_o, rays_d)
    near_first, _, valid_first = grid_near_far(
        dgrid, grid.level, rays_o, rays_d, first_only=True
    )
    np.testing.assert_array_equal(np.asarray(valid_full), np.asarray(valid_first))
    np.testing.assert_allclose(
        np.asarray(near_full), np.asarray(near_first), rtol=1e-5, atol=1e-6
    )


def test_dda_miss():
    grid = VoxelGrid(4, np.zeros(3), 1.0, np.array([[8, 8, 8]], np.int32))
    dgrid = device_grid_from_host(grid)
    rays_o = np.array([[0.0, 0.0, -5.0]], np.float32)
    rays_d = np.array([[0.0, 1.0, 0.0]], np.float32)  # parallel, misses cube
    near, far, valid = grid_near_far(dgrid, grid.level, rays_o, rays_d)
    assert not bool(valid[0])
    assert float(near[0]) == 0.0 and float(far[0]) == 0.0


def test_hier_dda_matches_brute_force():
    """Two-level DDA agrees with the numpy oracle at several levels,
    including rays that miss and rays starting inside the cube."""
    from neuralrecon_w_tpu.ops.ray_voxel import hier_grid_from_host

    for seed, level, n_vox in ((0, 5, 40), (1, 7, 300), (2, 9, 800)):
        grid, rays_o, rays_d = _random_grid_and_rays(seed, level, n_vox, 96)
        hg = hier_grid_from_host(grid)
        near, far, valid = grid_near_far(hg, grid.level, rays_o, rays_d)
        near_bf, far_bf, valid_bf = brute_force_near_far(grid, rays_o, rays_d)
        near, far, valid = np.asarray(near), np.asarray(far), np.asarray(valid)
        np.testing.assert_array_equal(valid, valid_bf, err_msg=f"level={level}")
        assert valid.sum() > len(valid) * 0.9
        np.testing.assert_allclose(near[valid], near_bf[valid], rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(far[valid], far_bf[valid], rtol=1e-3, atol=1e-4)


def test_hier_dda_first_only_and_miss():
    from neuralrecon_w_tpu.ops.ray_voxel import hier_grid_from_host

    grid, rays_o, rays_d = _random_grid_and_rays(seed=3, level=6, n_vox=60)
    hg = hier_grid_from_host(grid)
    near_full, _, valid_full = grid_near_far(hg, grid.level, rays_o, rays_d)
    near_first, _, valid_first = grid_near_far(
        hg, grid.level, rays_o, rays_d, first_only=True
    )
    np.testing.assert_array_equal(np.asarray(valid_full), np.asarray(valid_first))
    np.testing.assert_allclose(
        np.asarray(near_full), np.asarray(near_first), rtol=1e-5, atol=1e-6
    )
    # parallel miss
    miss = grid_near_far(
        hg, grid.level,
        np.array([[0.0, 0.0, -50.0]], np.float32) + grid.origin,
        np.array([[0.0, 1.0, 0.0]], np.float32),
    )
    assert not bool(miss[2][0])


def test_hier_level12_memory_and_parity():
    """Level-12 traversal: flat occupancy would be 8.6 GB; the two-level
    structure must stay small and agree with the oracle (VERDICT r01 #4)."""
    from neuralrecon_w_tpu.ops.ray_voxel import hier_grid_from_host

    rng = np.random.RandomState(11)
    # a thin shell of surface voxels, the realistic occupancy pattern
    pts = rng.randn(20000, 3)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    level = 12
    res = 1 << level
    cells = np.clip(
        np.floor((pts * 0.5 + 1.0) / 2.0 * res), 0, res - 1
    ).astype(np.int64)
    cells = np.unique(cells, axis=0)
    grid = VoxelGrid(level, np.zeros(3), 2.0, cells.astype(np.int32))
    hg = hier_grid_from_host(grid)
    nbytes = sum(int(np.asarray(x).nbytes) for x in (hg.meta, hg.fine))
    assert nbytes < 200 * 1024 * 1024, f"{nbytes/1e6:.0f} MB"

    origins = grid.origin + np.array([0.0, 0.0, -2.5 * grid.scale]) + rng.randn(32, 3) * 0.3
    targets = grid.centers_sfm()[rng.randint(0, len(cells), 32)]
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    near, far, valid = grid_near_far(
        hg, level, origins.astype(np.float32), dirs.astype(np.float32),
        first_only=True,
    )
    near_bf, _, valid_bf = brute_force_near_far(
        grid, origins.astype(np.float32), dirs.astype(np.float32)
    )
    valid = np.asarray(valid)
    np.testing.assert_array_equal(valid, valid_bf)
    assert valid.sum() > 28
    np.testing.assert_allclose(
        np.asarray(near)[valid], near_bf[valid], rtol=1e-3, atol=1e-4
    )


def test_sampled_first_hit_near_dda():
    """The loop-free sampled surface query lands within one sampling
    step of the exact DDA first hit on a dilated shell, for both grid
    representations."""
    import jax.numpy as jnp
    from neuralrecon_w_tpu.ops.ray_voxel import (
        hier_grid_from_host, sampled_first_hit,
    )
    from neuralrecon_w_tpu.ops.voxel_grid import grid_from_points

    rs = np.random.RandomState(5)
    pts = rs.randn(20000, 3)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    level_target = 7
    voxel = 4.0 / (1 << level_target)
    grid = grid_from_points(pts, np.full(3, -2.0), np.full(3, 2.0), voxel,
                            expand=1)
    assert grid.level == level_target

    n = 64
    o = rs.randn(n, 3).astype(np.float32) * 0.05 + np.array([0, 0, 1.8], np.float32)
    d = -o + rs.randn(n, 3).astype(np.float32) * 0.1
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o_norm = ((o - grid.origin) / grid.scale).astype(np.float32)

    for dev in (device_grid_from_host(grid), hier_grid_from_host(grid)):
        near, _, valid = grid_near_far(dev, grid.level, o, d, first_only=True)
        t_dda = np.asarray(near) / grid.scale  # normalized units
        t_lo = jnp.zeros((n,)) + 1e-3
        t_hi = jnp.full((n,), 2.5)
        t_s, hit = sampled_first_hit(dev, grid.level, jnp.asarray(o_norm),
                                     jnp.asarray(d), t_lo, t_hi, 1024)
        t_s, hit = np.asarray(t_s), np.asarray(hit)
        valid = np.asarray(valid)
        agree = hit == valid
        assert agree.mean() > 0.95, agree.mean()
        both = hit & valid
        step = float(2.5 - 1e-3) / 1024
        err = np.abs(t_s[both] - t_dda[both])
        assert np.percentile(err, 95) < 2 * step, err.max()
