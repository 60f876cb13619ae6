"""Shared scene-setup recipe: workspace metadata + SceneInfo + SFM grid.

One definition of the four-step block the Trainer, the render CLI and
validation all need (reference equivalents: PhototourismDataset.read_meta
+ NeuconWSystem.get_octree, reference datasets/phototourism.py:317-462,
lightning_modules/neuconw_system.py:137-184): resolve the per-scene
sfm_path default, parse the workspace, build the unit-sphere SceneInfo
and the expand=1/radius=1.0 SFM occupancy grid used for the validation
near/far override and surface initialization.
"""

from __future__ import annotations

import os
from typing import NamedTuple


class SceneBundle(NamedTuple):
    meta: object  # datasets.phototourism.SceneMeta
    scene: object  # rendering.renderer.SceneInfo
    sfm_grid: object  # ops.voxel_grid.VoxelGrid
    sfm_dgrid: object  # device grid (flat or hierarchical)


def load_scene_bundle(cfg, img_downscale: int | None = None) -> SceneBundle:
    """Parse the workspace named by ``cfg.DATASET`` at ``img_downscale``
    (default: the config's IMG_DOWNSCALE) and build the render-side
    scene objects."""
    import jax.numpy as jnp

    from ..datasets.phototourism import SCENE_DEFAULTS, load_scene_meta
    from ..ops.ray_voxel import device_grid_from_host
    from ..ops.voxel_grid import grid_from_sfm_points
    from ..rendering.renderer import SceneInfo

    root = cfg.DATASET.ROOT_DIR
    scene_name = os.path.basename(os.path.normpath(root))
    sfm_path = (cfg.DATASET.PHOTOTOURISM.SFM_PATH
                or SCENE_DEFAULTS.get(scene_name, {}).get("sfm_path", "sparse"))
    if img_downscale is None:
        img_downscale = int(cfg.DATASET.PHOTOTOURISM.IMG_DOWNSCALE)
    meta = load_scene_meta(root, img_downscale, sfm_path=sfm_path)
    sc = meta.scene_config
    scene = SceneInfo(
        origin=jnp.asarray(sc["origin"], jnp.float32),
        radius=jnp.asarray(float(sc["radius"]), jnp.float32),
        sfm2gt=jnp.asarray(sc["sfm2gt"], jnp.float32),
    )
    sfm_grid = grid_from_sfm_points(
        sc, meta.points3d, sc["min_track_length"], sc["voxel_size"],
        expand=1, radius=1.0,
    )
    return SceneBundle(meta, scene, sfm_grid, device_grid_from_host(sfm_grid))


def val_downscale(cfg) -> int:
    """Validation/render resolution divisor: forced >= 8 like the
    reference's OOM guard (reference datasets/phototourism.py:70-71),
    overridable via TRAINER.VAL_DOWNSCALE for small scenes."""
    vds = int(getattr(cfg.TRAINER, "VAL_DOWNSCALE", -1))
    if vds <= 0:
        vds = max(8, int(cfg.DATASET.PHOTOTOURISM.IMG_DOWNSCALE))
    return vds
