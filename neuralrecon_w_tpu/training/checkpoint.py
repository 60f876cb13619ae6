"""Checkpoint save/restore (orbax) + name-prefix parameter surgery.

Replaces Lightning's ModelCheckpoint + the manual SAVE_FREQ saves
(reference train.py:31-36, lightning_modules/neuconw_system.py:376-400)
and the prefix-loading used by every offline tool
(reference utils/__init__.py:64-99 extract_model_state_dict/load_ckpt).

Layout: <dir>/<step>/ holds {params, opt_state, step, fine_grid_coords}
as an orbax PyTree checkpoint; a config snapshot is written once per run
(the reference copies its config/ directory, neuconw_system.py:387-400).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..ops.voxel_grid import VoxelGrid


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(
    ckpt_dir: str,
    step: int,
    params: Any,
    opt_state: Any = None,
    fine_grid: VoxelGrid | None = None,
    config_snapshot: str | None = None,
) -> str:
    """Write <ckpt_dir>/step_<N>. Returns the path."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    tree = {"params": params, "step": np.asarray(step, np.int64)}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    # orbax's save is a COLLECTIVE in multiprocess runs (it barriers on
    # '<path>' and writes from the primary host): every process must
    # call it, with the same shared path. The side files below are
    # plain host writes — primary only.
    _checkpointer().save(path, jax.device_get(tree), force=True)
    if jax.process_index() == 0:
        if fine_grid is not None:
            np.savez_compressed(
                os.path.join(path, "fine_grid.npz"),
                level=fine_grid.level, origin=fine_grid.origin,
                scale=fine_grid.scale, coords=fine_grid.coords,
            )
        if config_snapshot is not None:
            snap = os.path.join(os.path.abspath(ckpt_dir),
                                "config_snapshot.yaml")
            if not os.path.exists(snap):
                with open(snap, "w") as f:
                    f.write(config_snapshot)
    return path


def restore_checkpoint(path: str, template: Any | None = None) -> dict:
    """Restore the full tree; with a template, dtypes/shapes are enforced."""
    path = os.path.abspath(path)  # orbax requires absolute paths
    restored = _checkpointer().restore(path, item=template)
    grid_path = os.path.join(path, "fine_grid.npz")
    if os.path.exists(grid_path):
        z = np.load(grid_path)
        restored["fine_grid"] = VoxelGrid(
            int(z["level"]), z["origin"], float(z["scale"]), z["coords"]
        )
    return restored


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_") and name[5:].isdigit():
            steps.append(int(name[5:]))
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"step_{max(steps)}")


def load_params_subtree(path: str, prefixes: tuple[str, ...] = ()) -> Any:
    """Load only the named top-level parameter groups, e.g.
    ('neuconw', 'embedding_a') — the prefix surgery offline tools use
    (reference utils/__init__.py:64-99)."""
    params = _checkpointer().restore(os.path.abspath(path))["params"]
    if not prefixes:
        return params
    return {k: v for k, v in params.items() if k in prefixes}
