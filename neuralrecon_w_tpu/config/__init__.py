"""Config system: yacs-compatible defaults + per-scene metadata loader."""

import os

import numpy as np
import yaml

from .defaults import get_cfg_defaults
from .node import CfgNode, from_dict

__all__ = ["get_cfg_defaults", "CfgNode", "from_dict", "load_scene_config"]


def load_scene_config(root_dir: str) -> dict:
    """Load the per-scene ``config.yaml`` shipped inside a dataset workspace.

    Keys (reference README.md:104-118): name, origin (3,), radius,
    eval_bbx [[min],[max]], eval_bbx_detail, voxel_size, min_track_length,
    sfm2gt (4x4). Consumed by the training system, renderer, dataset and
    voxel builder alike.
    """
    path = os.path.join(root_dir, "config.yaml")
    with open(path, "r") as f:
        scene = yaml.safe_load(f)
    scene.setdefault("sfm2gt", np.eye(4).tolist())
    return scene
