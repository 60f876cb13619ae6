"""Online surface-grid refinement ("octree_update").

Every UPDATE_FREQ steps the reference densifies the SFM octree to the
training level, SDF-sweeps every voxel center across ranks, keeps voxels
with sdf <= SDF_THRESHOLD and rebuilds a fine octree that re-centers all
subsequent ray sampling around the current zero set (reference
lightning_modules/neuconw_system.py:186-312). TPU version: the sweep is a
sharded jit eval (parallel/sweep.py); the rebuild is a host-side
morton-sorted VoxelGrid shipped back as a packed bitfield — a natural
device/host boundary that leaves the jitted train step untouched (no
recompile: the fine grid enters as a dynamic DeviceGrid operand).
"""

from __future__ import annotations

import numpy as np

from ..models.neuconw import FieldConfig
from ..ops.ray_voxel import DeviceGrid, make_device_grid
from ..ops.voxel_grid import VoxelGrid, level_for_voxel_size, scene_bbx_sfm
from ..parallel.sweep import sharded_sdf_sweep


def surface_level(scene_config: dict, train_voxel_size: float) -> int:
    """Grid level whose cells are <= train_voxel_size over the scene cube
    (reference neuconw_system.py:314-335 picks ceil)."""
    bbx_min, bbx_max = scene_bbx_sfm(scene_config, in_sfm=True)
    scale = float(np.max(bbx_max - bbx_min) / 2.0)
    return level_for_voxel_size(scale, train_voxel_size, mode="ceil")


def surface_selection(
    params,
    fc: FieldConfig,
    sfm_grid: VoxelGrid,
    train_level: int,
    scene_origin: np.ndarray,
    scene_radius: float,
    sdf_threshold: float = 0.0,
    mesh=None,
    chunk: int = 65536,
    stats_out: dict | None = None,
    warn_degenerate: bool = True,
) -> np.ndarray:
    """Voxel centers (unit-sphere coords) whose SDF is <= threshold
    (reference neuconw_system.py:186-266). ``stats_out`` (if given) is
    filled with n_candidates / n_kept / kept_frac so callers that
    EXPECT a near-total keep (an untrained SDF under a generous
    threshold, e.g. the multichip dryrun gate) can assert the fraction
    instead of alarming the log — those callers also pass
    ``warn_degenerate=False``."""
    dense = sfm_grid.upsample(train_level)
    centers_sfm = dense.centers_sfm()
    centers_unit = (centers_sfm - scene_origin) / scene_radius
    sdf = sharded_sdf_sweep(params, fc, centers_unit.astype(np.float32), mesh, chunk)
    keep = sdf <= sdf_threshold
    kept_frac = float(np.count_nonzero(keep)) / max(len(keep), 1)
    if stats_out is not None:
        stats_out.update(n_candidates=int(len(keep)),
                         n_kept=int(np.count_nonzero(keep)),
                         kept_frac=kept_frac)
    if kept_frac > 0.9 and warn_degenerate:
        # a near-total keep means the SDF has no meaningful zero set
        # inside the candidate region (e.g. the level-shifted
        # all-negative basin): installing this grid recenters every ray
        # band on the region boundary. This is the earliest observable
        # signal of a geometry collapse that rendering losses cannot
        # see — warn loudly (observed on the synthetic fixture with
        # weak depth anchoring, see STATUS.md).
        import logging

        logging.getLogger(__name__).warning(
            "surface refresh kept %.0f%% of candidate voxels — the SDF "
            "zero set is degenerate (all-negative level shift?); "
            "check depth/mask supervision strength",
            100.0 * kept_frac,
        )
    return centers_sfm[keep], centers_unit[keep]


def octree_update(
    params,
    fc: FieldConfig,
    sfm_grid: VoxelGrid,
    scene_config: dict,
    scene_origin: np.ndarray,
    scene_radius: float,
    train_voxel_size: float,
    sdf_threshold: float = 0.0,
    mesh=None,
    chunk: int = 65536,
    stats_out: dict | None = None,
    warn_degenerate: bool = True,
) -> tuple[VoxelGrid, DeviceGrid] | tuple[None, None]:
    """Rebuild the fine surface grid from the current SDF
    (reference neuconw_system.py:268-312). Returns (host grid, device
    grid); (None, None) when no voxel survives (keeps the previous grid,
    reference logs and skips in that case). ``stats_out`` /
    ``warn_degenerate`` pass through to :func:`surface_selection`."""
    level = surface_level(scene_config, train_voxel_size)
    centers_sfm, _ = surface_selection(
        params, fc, sfm_grid, level, scene_origin, scene_radius,
        sdf_threshold, mesh, chunk,
        stats_out=stats_out, warn_degenerate=warn_degenerate,
    )
    if len(centers_sfm) == 0:
        return None, None
    # rebuild at the SFM grid's cube frame so traversal math is shared
    res = 1 << level
    cells = np.clip(
        np.floor(((centers_sfm - sfm_grid.origin) / sfm_grid.scale + 1.0) / 2.0 * res),
        0, res - 1,
    ).astype(np.int64)
    host = VoxelGrid(level, sfm_grid.origin, sfm_grid.scale,
                     _dedup_sort(cells, level))
    return host, make_device_grid(host)


def _dedup_sort(cells: np.ndarray, level: int) -> np.ndarray:
    from ..ops.voxel_grid import _sort_coords

    return _sort_coords(cells, level)
