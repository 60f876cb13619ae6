"""Multi-host execution: 2 real processes, jax.distributed, gloo CPU
collectives, the production Trainer end to end.

This executes what the reference only runs on real clusters (multi-node
DDP, reference train.py:55 + datasets/data.py:83-119): each process
loads a DISJOINT subset of the ray-cache splits, the train step runs
SPMD over the 4-device global mesh (2 local CPU devices per process),
and the gradient psum keeps the replicated parameters bitwise identical
across processes.
"""

import json
import os
import socket
import subprocess
import sys

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_lockstep_training(tmp_path):
    from neuralrecon_w_tpu.testing import make_synthetic_scene
    from neuralrecon_w_tpu.tools.prepare_data.prepare_data_cache import (
        main as cache_main,
    )
    from neuralrecon_w_tpu.tools.prepare_data.prepare_data_split import (
        main as split_main,
    )

    root = str(tmp_path / "scene")
    os.makedirs(root)
    make_synthetic_scene(root, n_images=6, n_test=1, img_wh=(40, 30))
    split_main(["--root_dir", root, "--num_test", "1",
                "--roi_threshold", "0.3", "--static_threshold", "0.3"])
    cache_main(["--root_dir", root, "--split_to_chunks", "8"])

    cfg = {
        "NEUCONW": {
            "N_SAMPLES": 8, "N_IMPORTANCE": 8, "UP_SAMPLE_STEP": 2,
            "N_OUTSIDE": 2, "BOUNDARY_SAMPLES": 2, "S_VAL_BASE": 1,
            "SAMPLE_RANGE": 4, "N_VOCAB": 16, "ANNEAL_END": 100,
            # cross every stateful boundary inside the 6-step run:
            # octree_update at step 3 (sharded sweep + all-gather),
            # validation at step 6 (VAL_FREQ > 1 is a step count), and
            # the end-of-fit orbax collective save carries the fine grid
            "UPDATE_FREQ": 3, "TRAIN_VOXEL_SIZE": 0.12,
            "SDF_CONFIG": {"d_hidden": 64, "d_out": 65, "n_layers": 2,
                           "skip_in": (1,)},
            "COLOR_CONFIG": {"d_feature": 64, "d_hidden": 32, "n_layers": 2,
                             "head_channels": 16},
        },
        "DATASET": {"ROOT_DIR": root, "DATASET_NAME": "phototourism",
                    "PHOTOTOURISM": {"IMG_DOWNSCALE": 1}},
        "TRAINER": {"SAVE_FREQ": 1000, "VAL_FREQ": 6.0,
                    "CANONICAL_LR": 1e-3, "CANONICAL_BS": 512},
        "TPU": {"DEVICE_POOL": False},
    }
    cfg_path = str(tmp_path / "train_mh.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    port = _free_port()
    # multihost runs share one save_dir: orbax's save is a collective
    # that writes from the primary host (training/checkpoint.py)
    save_dir = str(tmp_path / "run")
    outs = [str(tmp_path / f"out{r}.json") for r in (0, 1)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests/_multihost_worker.py"),
             str(r), str(port), cfg_path, save_dir, outs[r]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for r in (0, 1)
    ]
    logs = [p.communicate(timeout=1500)[0] for p in procs]
    for r, p in enumerate(procs):
        assert p.returncode == 0, (
            f"rank {r} failed:\n{logs[r][-4000:]}\n"
            f"--- other rank:\n{logs[1 - r][-2000:]}")

    rec = [json.load(open(o)) for o in outs]
    for r in (0, 1):
        assert rec[r]["process_count"] == 2
        assert rec[r]["n_global_devices"] == 4
        assert rec[r]["n_local_devices"] == 2
        assert rec[r]["step"] == 6
    assert rec[0]["is_main"] and not rec[1]["is_main"]

    # disjoint split partition across processes (reference
    # datasets/data.py:83-100 seeded assignment)
    s0, s1 = set(rec[0]["splits"]), set(rec[1]["splits"])
    assert s0 and s1 and not (s0 & s1)
    assert len(s0 | s1) == 8

    # lockstep: the psum'd update left every replica bitwise identical —
    # still true after the octree_update at step 3 and the validation
    # render at step 6
    fp0, fp1 = rec[0]["fingerprint"], rec[1]["fingerprint"]
    assert fp0.keys() == fp1.keys() and len(fp0) > 4
    for k in fp0:
        assert fp0[k] == fp1[k], (k, fp0[k], fp1[k])

    # octree_update crossed: the fine grid rebuilt from the sharded SDF
    # sweep + cross-process all-gather is byte-identical on both hosts
    g0, g1 = rec[0]["fine_grid"], rec[1]["fine_grid"]
    assert g0 is not None and g0["n_voxels"] > 0
    assert g0 == g1, (g0, g1)

    # save -> resume crossed: both processes restored the same step,
    # the same fine grid, and stayed in lockstep for 2 more
    # surface-guided steps
    for r in (0, 1):
        assert rec[r]["resume_restored_step"] == 6
        assert rec[r]["resume_step"] == 8
    assert rec[0]["resume_fine_grid"] == g0  # checkpoint carried the grid
    assert rec[1]["resume_fine_grid"] == g0
    rfp0, rfp1 = rec[0]["resume_fingerprint"], rec[1]["resume_fingerprint"]
    assert rfp0.keys() == rfp1.keys()
    for k in rfp0:
        assert rfp0[k] == rfp1[k], (k, rfp0[k], rfp1[k])
    # and training actually advanced past the restored params
    assert any(rfp0[k] != fp0[k] for k in fp0)

    # artifacts written exactly once into the shared dir (metrics by the
    # main process's logger, the checkpoint by orbax's primary host);
    # the step-6 validation wrote its report + images on main only
    assert os.path.exists(os.path.join(save_dir, "mh", "logs",
                                       "metrics.jsonl"))
    val_dir = os.path.join(save_dir, "mh", "val")
    assert os.path.isdir(val_dir) and os.listdir(val_dir)
    from neuralrecon_w_tpu.training import latest_checkpoint

    ck = latest_checkpoint(os.path.join(save_dir, "mh", "checkpoints"))
    assert ck is not None and ck.endswith("step_6")
