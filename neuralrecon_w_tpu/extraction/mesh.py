"""SDF isosurface mesh extraction: sharded device sweeps + host meshing.

TPU-native redesign of the reference mesh path
(reference utils/visualization.py:37-159, tools/extract_mesh.py:60-168):
  * grid generation — dense dim^3 lattice over the training sphere, or a
    sparse lattice from the SFM voxel grid densified to eval_level
    (gen_grid_spc parity),
  * SDF evaluated on device via the sharded chunked sweep
    (parallel/sweep.py) instead of rank-sharded NCCL all_gather,
  * sparse SDF scattered into a dense field initialized to 1.0 with an
    8-corner validity mask (the reference's rolled-AND trick is the
    cell-validity rule of our marching tetrahedra mask),
  * host marching tetrahedra (ops/isosurface.py) replaces skimage's C
    marching_cubes,
  * optional vertex colors from the color field at a fixed view dir
    (0, 0, 1) and appearance index.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..models.neuconw import FieldConfig
from ..ops.isosurface import marching_tetrahedra, vertex_normals
from ..ops.voxel_grid import grid_from_sfm_points
from ..parallel.sweep import sharded_rgb_sweep, sharded_sdf_sweep
from ..utils.ply import write_ply


class MeshData(NamedTuple):
    verts: np.ndarray  # (V, 3) world/SFM coordinates
    faces: np.ndarray  # (F, 3)
    normals: np.ndarray  # (V, 3)
    colors: Optional[np.ndarray]  # (V, 3) uint8 or None


class EvalGrid(NamedTuple):
    """A lattice of SDF sample points.

    points_sfm are cell min-corners (kaolin point convention,
    reference tools/extract_mesh.py:92-95); indices index into the
    dense (dim, dim, dim) field."""

    points_sfm: np.ndarray  # (N, 3) float64
    indices: Optional[np.ndarray]  # (N, 3) int64, None => dense grid
    dim: int
    vol_origin: np.ndarray  # (3,) SFM coords of grid index (0,0,0)
    voxel_size: float  # SFM units per cell


def dense_eval_grid(scene_origin, radius: float, dim: int) -> EvalGrid:
    """dim^3 lattice spanning the training sphere
    (reference utils/visualization.py:43-50)."""
    o = np.asarray(scene_origin, np.float64)
    axes = [np.linspace(o[i] - radius, o[i] + radius, dim) for i in range(3)]
    pts = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    voxel_size = 2.0 * radius / (dim - 1)
    return EvalGrid(pts, None, dim, o - radius, voxel_size)


def box_eval_grid(bbx, dim: int) -> EvalGrid:
    """Dense cubic lattice covering an axis-aligned box (max-extent cube
    about the box center) — the validation-time detail extraction region
    (reference neuconw_system.py:466-513, eval_bbx_detail at dim 256)."""
    lo = np.asarray(bbx[0], np.float64)
    hi = np.asarray(bbx[1], np.float64)
    center = (lo + hi) / 2
    half = float(np.max(hi - lo) / 2)
    return dense_eval_grid(center, half, dim)


def sparse_eval_grid(scene_config: dict, points3d: dict, eval_level: int) -> EvalGrid:
    """SFM voxel grid densified to eval_level
    (reference gen_grid_spc, tools/extract_mesh.py:60-102)."""
    base = grid_from_sfm_points(
        scene_config, points3d,
        scene_config["min_track_length"], scene_config["voxel_size"],
        expand=0,
    )
    up = base.upsample(eval_level)
    voxel_size = 2.0 / (1 << eval_level) * base.scale
    vol_origin = base.origin - base.scale
    pts = up.coords.astype(np.float64) * voxel_size + vol_origin
    return EvalGrid(pts, up.coords.astype(np.int64), 1 << eval_level,
                    vol_origin, voxel_size)


def extract_mesh(
    params,
    fc: FieldConfig,
    grid: EvalGrid,
    scene_origin,
    scene_radius: float,
    chunk: int = 102144,
    mesh=None,
    with_color: bool = False,
    a_index: int = 1123,
    chunk_rgb: int = 65536,
) -> MeshData | None:
    """Extract the zero isosurface over the grid; verts in SFM coords.

    chunk default matches scripts/sdf_extract.sh:15; a_index matches the
    fixed appearance embedding of tools/extract_mesh.py:157.
    Returns None when the surface is empty.
    """
    scene_origin = np.asarray(scene_origin, np.float64)
    # SFM -> unit training sphere for the field
    pts_unit = (grid.points_sfm - scene_origin) / scene_radius
    sdf = sharded_sdf_sweep(params, fc, pts_unit.astype(np.float32), mesh, chunk)

    if grid.indices is None:
        field = sdf.reshape(grid.dim, grid.dim, grid.dim)
        mask = None
    else:
        field = np.ones((grid.dim, grid.dim, grid.dim), np.float32)
        ind = grid.indices
        field[ind[:, 0], ind[:, 1], ind[:, 2]] = sdf
        mask = np.zeros((grid.dim, grid.dim, grid.dim), bool)
        mask[ind[:, 0], ind[:, 1], ind[:, 2]] = True

    from ..ops.native import marching_tetrahedra_native

    native = marching_tetrahedra_native(field, level=0.0, mask=mask)
    if native is not None:
        verts_grid, faces = native
    else:
        verts_grid, faces = marching_tetrahedra(field, level=0.0, mask=mask)
    if len(verts_grid) == 0:
        return None

    verts_sfm = verts_grid * grid.voxel_size + grid.vol_origin
    norms = vertex_normals(verts_sfm, faces)

    colors = None
    if with_color:
        verts_unit = (verts_sfm - scene_origin) / scene_radius
        rgb = sharded_rgb_sweep(
            params, fc, verts_unit.astype(np.float32),
            view_dir=np.array([0.0, 0.0, 1.0], np.float32),
            a_index=a_index, mesh=mesh, chunk=chunk_rgb,
        )
        colors = np.clip(rgb * 255.0, 0, 255).astype(np.uint8)

    return MeshData(verts_sfm, faces, norms, colors)


def save_mesh_ply(mesh_data: MeshData, path: str) -> None:
    write_ply(
        path, mesh_data.verts, faces=mesh_data.faces,
        colors=mesh_data.colors, normals=mesh_data.normals,
    )
