"""Per-process worker for the 2-process multihost execution test.

Run as:
    python tests/_multihost_worker.py <rank> <port> <cfg_path> <save_dir> <out_json>

Each process gets 2 virtual CPU devices (4 global), initializes
jax.distributed through the REAL CLI flags (train_cli --multihost
--coordinator ...), trains a few lockstep steps through the production
Trainer — disjoint cache splits per process, gradient psum over the
global mesh — then dumps its local split assignment and a full parameter
fingerprint for the parent to compare across ranks (the executable
version of the reference's multi-node DDP path, reference train.py:55,
datasets/data.py:83-119).
"""

from __future__ import annotations

import json
import os
import sys


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

    import numpy as np

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

    from neuralrecon_w_tpu.datasets.cache import local_split_names

    p = trainer.cfg.DATASET.PHOTOTOURISM
    split_root = os.path.join(
        trainer.cfg.DATASET.ROOT_DIR, p.CACHE_DIR, "splits")
    names = local_split_names(split_root, jax.process_count(),
                              jax.process_index())

    leaves = jax.tree_util.tree_flatten_with_path(trainer.state.params)[0]
    fingerprint = {}
    for path, leaf in leaves:
        key = "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                       for k in path)
        arr = np.asarray(leaf.addressable_data(0), dtype=np.float64)
        fingerprint[key] = [float(arr.sum()), float(np.abs(arr).sum()),
                            float(arr.ravel()[0]) if arr.size else 0.0]

    with open(out_json, "w") as f:
        json.dump({
            "rank": rank,
            "process_count": jax.process_count(),
            "n_global_devices": len(jax.devices()),
            "n_local_devices": len(jax.local_devices()),
            "step": int(trainer.state.step),
            "splits": sorted(names),
            "is_main": trainer.is_main,
            "fingerprint": fingerprint,
        }, f)


if __name__ == "__main__":
    main()
