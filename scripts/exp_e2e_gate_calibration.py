"""Calibrate the e2e geometry gates from seeded runs (CPU, no chip).

Runs the tests/test_e2e.py pipeline (synthetic sphere scene -> split ->
cache -> 300-step training -> mesh extraction -> eval) once per seed and
prints per-seed chamfer/F plus the mean + 3*sigma bands the gates in
tests/test_e2e.py are set from.

Usage:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/exp_e2e_gate_calibration.py --seeds 5 \
        --out /tmp/e2e_gates.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import yaml  # noqa: E402


def run_one(seed: int, workdir: str) -> dict:
    from neuralrecon_w_tpu.evaluation import eval_mesh
    from neuralrecon_w_tpu.testing import make_synthetic_scene
    from neuralrecon_w_tpu.tools.extract_mesh_cli import main as extract_main
    from neuralrecon_w_tpu.tools.prepare_data.prepare_data_cache import (
        main as cache_main,
    )
    from neuralrecon_w_tpu.tools.prepare_data.prepare_data_split import (
        main as split_main,
    )
    from neuralrecon_w_tpu.tools.train_cli import main as train_main
    from neuralrecon_w_tpu.training import latest_checkpoint
    from neuralrecon_w_tpu.utils.ply import write_ply

    root = os.path.join(workdir, f"scene_{seed}")
    os.makedirs(root)
    info = make_synthetic_scene(root, n_images=6, n_test=1, img_wh=(40, 30))
    split_main(["--root_dir", root, "--num_test", "1",
                "--roi_threshold", "0.3", "--static_threshold", "0.3"])
    cache_main(["--root_dir", root, "--split_to_chunks", "8"])

    # the exact tests/test_e2e.py cfg, with the training seed varied
    cfg = {
        "NEUCONW": {
            "N_SAMPLES": 8, "N_IMPORTANCE": 8, "UP_SAMPLE_STEP": 2,
            "N_OUTSIDE": 2, "BOUNDARY_SAMPLES": 2, "S_VAL_BASE": 1,
            "SAMPLE_RANGE": 4, "N_VOCAB": 16, "ANNEAL_END": 100,
            "UPDATE_FREQ": 100, "TRAIN_VOXEL_SIZE": 0.12,
            "SDF_THRESHOLD": 0.1, "NEAR_FAR_OVERRIDE": True,
            "SDF_CONFIG": {"d_hidden": 64, "d_out": 65, "n_layers": 4,
                           "skip_in": [2]},
            "COLOR_CONFIG": {"d_feature": 64, "d_hidden": 32, "n_layers": 2,
                             "head_channels": 16},
            "MESH_MASK_LIST": ["sky"],
            "DEPTH_LOSS": True,
            "LOSS": {"depth_weight": 1.0},
        },
        "DATASET": {"ROOT_DIR": root, "DATASET_NAME": "phototourism",
                    "PHOTOTOURISM": {"IMG_DOWNSCALE": 1}},
        "TRAINER": {"SAVE_FREQ": 1000, "VAL_FREQ": 100.0,
                    "CANONICAL_LR": 1e-3, "CANONICAL_BS": 512,
                    "SEED": seed},
    }
    cfg_path = os.path.join(workdir, f"cfg_{seed}.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    save_dir = os.path.join(workdir, f"run_{seed}")
    trainer = train_main([
        "--cfg_path", cfg_path, "--batch_size", "512",
        "--test_batch_size", "128", "--num_epochs", "100",
        "--max_steps", "300", "--exp_name", "cal", "--save_dir", save_dir,
    ])
    assert trainer.fine_grid_host is not None
    n_fine = int(trainer.fine_grid_host.coords.shape[0])

    ck = latest_checkpoint(os.path.join(save_dir, "cal", "checkpoints"))
    out = os.path.join(workdir, f"mesh_{seed}.ply")
    extract_main(["--cfg_path", cfg_path, "--ckpt_path", ck,
                  "--mesh_size", "48", "--chunk", "8192", "--out", out])

    rs = np.random.RandomState(0)
    v = rs.randn(4000, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    gt_path = os.path.join(workdir, f"gt_{seed}.ply")
    write_ply(gt_path, v * info["sphere_radius"])
    res = eval_mesh(out, gt_path, info["scene_config"], is_mesh=True,
                    threshold=[0.5], save_name=f"cal_{seed}",
                    write_visualizations=False)
    return {
        "seed": seed,
        "fscore": float(res["fscores"][0]),
        "chamfer_pred_to_gt": float(res["chamfer_pred_to_gt"]),
        "chamfer_gt_to_pred": float(res["chamfer_gt_to_pred"]),
        "fine_grid_voxels": n_fine,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--out", type=str, default="/tmp/e2e_gates.json")
    args = ap.parse_args()

    runs = []
    with tempfile.TemporaryDirectory() as workdir:
        for seed in range(args.seeds):
            rec = run_one(66 + seed, workdir)
            runs.append(rec)
            print(json.dumps(rec), flush=True)

    def band(key, lo_is_bad=False):
        vals = np.array([r[key] for r in runs], np.float64)
        mean, std = float(vals.mean()), float(vals.std(ddof=1))
        return {"mean": mean, "std": std, "min": float(vals.min()),
                "max": float(vals.max()),
                "gate_mean_minus_3s" if lo_is_bad else "gate_mean_plus_3s":
                    mean - 3 * std if lo_is_bad else mean + 3 * std}

    summary = {
        "runs": runs,
        "fscore": band("fscore", lo_is_bad=True),
        "chamfer_pred_to_gt": band("chamfer_pred_to_gt"),
        "chamfer_gt_to_pred": band("chamfer_gt_to_pred"),
        "fine_grid_voxels": band("fine_grid_voxels", lo_is_bad=True),
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "runs"},
                     indent=1))


if __name__ == "__main__":
    main()
