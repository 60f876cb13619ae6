"""C++ geometry runtime (csrc/libnwgeom.so): exact parity with the
numpy reference implementations. Builds the library on first run when a
compiler is available; all tests skip gracefully without one."""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def native():
    lib = os.path.join(REPO, "csrc", "libnwgeom.so")
    if not os.path.exists(lib):
        try:
            subprocess.check_call(["make", "-C", os.path.join(REPO, "csrc")])
        except Exception:
            pytest.skip("no compiler available for csrc")
    from neuralrecon_w_tpu.ops import native as mod

    if not mod.available():
        pytest.skip("libnwgeom.so not loadable")
    return mod


def test_marching_tets_parity(native):
    from neuralrecon_w_tpu.ops.isosurface import marching_tetrahedra

    dim = 24
    ax = np.linspace(-1, 1, dim)
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1)
    sdf = (np.linalg.norm(g, axis=-1) - 0.55).astype(np.float32)

    v1, f1 = marching_tetrahedra(sdf)
    v2, f2 = native.marching_tetrahedra_native(sdf)
    assert len(v1) == len(v2) and len(f1) == len(f2)
    assert set(map(tuple, np.round(v1, 5))) == set(map(tuple, np.round(v2, 5)))

    mask = np.zeros((dim, dim, dim), bool)
    mask[3:20, 3:20, 3:20] = True
    v1m, f1m = marching_tetrahedra(sdf, mask=mask)
    v2m, f2m = native.marching_tetrahedra_native(sdf, mask=mask)
    assert len(v1m) == len(v2m) and len(f1m) == len(f2m)


def test_expand_quantize_parity(native):
    from neuralrecon_w_tpu.ops.morton import points_to_morton
    from neuralrecon_w_tpu.ops.voxel_grid import (
        VoxelGrid, _sort_coords, expand_points, level_for_voxel_size,
    )

    pts = np.random.RandomState(0).uniform(-0.8, 0.8, (1500, 3))
    origin = np.zeros(3)
    scale, voxel = 1.0, 0.1
    level = level_for_voxel_size(scale, voxel, "floor")

    # numpy reference (the pre-native grid_from_points body)
    p = pts.copy()
    for _ in range(2):
        p = expand_points(p, voxel)
    n = (p - origin) / scale
    keep = np.all(n > -1, -1) & np.all(n < 1, -1)
    res = 1 << level
    cells = np.clip(np.floor((n[keep] + 1) / 2 * res), 0, res - 1).astype(np.int64)
    ref = set(points_to_morton(_sort_coords(cells, level)).tolist())

    codes = native.expand_quantize(pts, origin, scale, voxel, level, 2)
    assert set(codes.tolist()) == ref


def test_grid_from_points_uses_native(native):
    """grid_from_points must give the same cells with/without the lib."""
    from neuralrecon_w_tpu.ops import voxel_grid as vg

    pts = np.random.RandomState(1).uniform(-0.7, 0.7, (800, 3))
    g1 = vg.grid_from_points(pts, [-1, -1, -1], [1, 1, 1], 0.12, expand=1)
    # force the numpy path
    from neuralrecon_w_tpu.ops import native as native_mod

    orig = native_mod._LIB
    native_mod._LIB = None
    try:
        g2 = vg.grid_from_points(pts, [-1, -1, -1], [1, 1, 1], 0.12, expand=1)
    finally:
        native_mod._LIB = orig
    np.testing.assert_array_equal(g1.coords, g2.coords)
