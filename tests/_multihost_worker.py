"""Per-process worker for the 2-process multihost execution test.

Run as:
    python tests/_multihost_worker.py <rank> <port> <cfg_path> <save_dir> <out_json>

Each process gets 2 virtual CPU devices (4 global), initializes
jax.distributed through the REAL CLI flags (train_cli --multihost
--coordinator ...), and trains through the production Trainer across
every stateful multihost boundary:

  phase 1 (6 steps): disjoint cache splits per process, gradient psum
    over the global mesh, ONE octree_update at step 3 (process-sharded
    SDF sweep + cross-process all-gather, reference
    neuconw_system.py:239-258), ONE validation render at step 6
    (replicated-redundant, reference datasets/phototourism.py:57), and
    the orbax collective save at step 6 WITH the fine grid attached.
  phase 2 (resume +2 steps): a fresh Trainer restores params +
    opt_state + fine grid from the shared checkpoint on every process
    and trains 2 more lockstep steps through the surface-guided path.

Dumps split assignment, fine-grid fingerprints after refresh and after
restore, and full parameter fingerprints after both phases for the
parent to compare across ranks.
"""

from __future__ import annotations

import json
import os
import sys


def _param_fingerprint(params):
    import jax
    import numpy as np

    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in leaves:
        key = "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                       for k in path)
        if hasattr(leaf, "addressable_data"):
            arr = np.asarray(leaf.addressable_data(0), dtype=np.float64)
        else:
            arr = np.asarray(leaf, dtype=np.float64)
        out[key] = [float(arr.sum()), float(np.abs(arr).sum()),
                    float(arr.ravel()[0]) if arr.size else 0.0]
    return out


def _grid_fingerprint(grid):
    """Byte-level identity of the host fine grid across processes."""
    import hashlib

    if grid is None:
        return None
    coords = grid.coords
    return {
        "level": int(grid.level),
        "n_voxels": int(coords.shape[0]),
        "sha256": hashlib.sha256(coords.tobytes()).hexdigest(),
    }


def main():
    rank, port, cfg_path, save_dir, out_json = (
        int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5])
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from neuralrecon_w_tpu.tools.train_cli import main as train_main

    trainer = train_main([
        "--cfg_path", cfg_path, "--batch_size", "128",
        "--test_batch_size", "64", "--num_epochs", "100",
        "--max_steps", "6", "--exp_name", "mh", "--save_dir", save_dir,
        "--multihost", "--coordinator", f"localhost:{port}",
        "--num_processes", "2", "--process_id", str(rank),
    ])

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    # phase-1 boundaries actually crossed
    assert trainer.fine_grid_host is not None, "octree_update never ran"

    from neuralrecon_w_tpu.datasets.cache import local_split_names

    p = trainer.cfg.DATASET.PHOTOTOURISM
    split_root = os.path.join(
        trainer.cfg.DATASET.ROOT_DIR, p.CACHE_DIR, "splits")
    names = local_split_names(split_root, jax.process_count(),
                              jax.process_index())

    record = {
        "rank": rank,
        "process_count": jax.process_count(),
        "n_global_devices": len(jax.devices()),
        "n_local_devices": len(jax.local_devices()),
        "step": int(trainer.state.step),
        "splits": sorted(names),
        "is_main": trainer.is_main,
        "fingerprint": _param_fingerprint(trainer.state.params),
        "fine_grid": _grid_fingerprint(trainer.fine_grid_host),
    }

    # ---- phase 2: save -> resume across processes ----
    from neuralrecon_w_tpu.training import latest_checkpoint
    from neuralrecon_w_tpu.training.loop import Trainer, TrainerConfig

    ck = latest_checkpoint(os.path.join(save_dir, "mh", "checkpoints"))
    assert ck is not None and ck.endswith("step_6"), ck
    tcfg2 = TrainerConfig(
        batch_size=128, test_batch_size=64, num_epochs=100,
        exp_name="mh_resume", save_dir=save_dir, ckpt_path=ck,
    )
    trainer2 = Trainer(trainer.cfg, tcfg2, trainer.mesh)
    record["resume_fine_grid"] = _grid_fingerprint(trainer2.fine_grid_host)
    record["resume_restored_step"] = int(trainer2.state.step)
    trainer2.fit(max_steps=2)
    record["resume_step"] = int(trainer2.state.step)
    record["resume_fingerprint"] = _param_fingerprint(trainer2.state.params)

    with open(out_json, "w") as f:
        json.dump(record, f)


if __name__ == "__main__":
    main()
