"""Long-horizon convergence experiment on a densely-viewed synthetic
scene (flagship nets, bf16, real chip).

Round-1 found the 6-view toy scene collapses to a NeuS fog optimum
past ~1000 steps (STATUS.md). This experiment checks whether that is
view sparsity (expected NeuS behavior) or a framework defect: 24 train
views, 64x48, 3000 steps, flagship 8x512 SDF.

Usage: python scripts/exp_synth_convergence.py [workdir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nw_synth_conv"
    # loss/schedule overrides: KEY=VALUE pairs after the workdir
    overrides = dict(kv.split("=", 1) for kv in sys.argv[2:])
    shape = overrides.pop("SHAPE", "sphere")
    root = os.path.join(work, f"{shape}_scene")
    os.makedirs(root, exist_ok=True)

    from neuralrecon_w_tpu.testing import make_synthetic_scene

    info = make_synthetic_scene(root, n_images=26, n_test=2,
                                img_wh=(64, 48), n_points=600, shape=shape)
    print("scene:", info["n_points"], "sfm points", flush=True)

    from neuralrecon_w_tpu.tools.prepare_data.prepare_data_split import (
        main as split_main,
    )
    from neuralrecon_w_tpu.tools.prepare_data.prepare_data_cache import (
        main as cache_main,
    )

    split_main(["--root_dir", root, "--num_test", "2",
                "--roi_threshold", "0.3", "--static_threshold", "0.3"])
    cache_main(["--root_dir", root, "--split_to_chunks", "8"])
    print("cache done", flush=True)

    cfg = {
        "NEUCONW": {
            "N_SAMPLES": 8, "N_IMPORTANCE": 16, "UP_SAMPLE_STEP": 2,
            "N_OUTSIDE": 4, "BOUNDARY_SAMPLES": 10, "S_VAL_BASE": 3,
            "SAMPLE_RANGE": 8, "N_VOCAB": 32, "ANNEAL_END": 2000,
            "UPDATE_FREQ": 500, "TRAIN_VOXEL_SIZE": 0.08,
            "SDF_THRESHOLD": 0.0, "NEAR_FAR_OVERRIDE": True,
            "MESH_MASK_LIST": ["sky"],
            "DEPTH_LOSS": True,
            # reference-style anchoring (brandenburg uses igr 1e-4 with
            # DEPTH_LOSS on): measured F=0.9965@0.05 with refresh, 0.9999
            # without. The weakly-anchored (0.1, 0.1) variant reaches
            # PSNR 33 but level-shifts the SDF all-negative (STATUS.md).
            "LOSS": {"depth_weight": 1.0, "igr_weight": 0.001},
        },
        "DATASET": {
            "ROOT_DIR": root,
            "DATASET_NAME": "phototourism",
            "PHOTOTOURISM": {"IMG_DOWNSCALE": 1},
        },
        "TRAINER": {"SAVE_FREQ": 3000, "VAL_FREQ": 500.0,
                    "VAL_DOWNSCALE": 2,
                    "CANONICAL_LR": 5e-4, "CANONICAL_BS": 2048},
        "TPU": {"FIELD_DTYPE": "bfloat16"},
    }
    exp = overrides.pop("EXP", "conv")
    steps = overrides.pop("STEPS", "3000")
    for k, v in overrides.items():
        node = cfg
        *path, leaf = k.split(".")
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = yaml.safe_load(v)

    cfg_path = os.path.join(work, f"train_sphere_{exp}.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from neuralrecon_w_tpu.tools.train_cli import main as train_main

    save_dir = os.path.join(work, "runs")
    trainer = train_main([
        "--cfg_path", cfg_path, "--batch_size", "2048",
        "--test_batch_size", "512", "--num_epochs", "100",
        "--max_steps", steps, "--exp_name", exp, "--save_dir", save_dir,
    ])
    print("train done at step", int(trainer.state.step), flush=True)

    log = os.path.join(save_dir, exp, "logs", "metrics.jsonl")
    rows = [json.loads(l) for l in open(log)]
    tr = [r for r in rows if "loss" in r]
    print("loss trajectory:", [round(r["loss"], 3) for r in tr[::10]][:40],
          flush=True)
    psnr = [(r["step"], round(r.get("psnr", 0), 2)) for r in tr
            if r["step"] % 500 < 10]
    print("train psnr:", psnr[:20], flush=True)
    val = [(r["step"], round(r.get("val/psnr", 0), 2)) for r in rows
           if "val/psnr" in r]
    print("val psnr:", val, flush=True)

    from neuralrecon_w_tpu.training import latest_checkpoint
    from neuralrecon_w_tpu.tools.extract_mesh_cli import main as extract_main
    from neuralrecon_w_tpu.evaluation import eval_mesh
    from neuralrecon_w_tpu.utils.ply import write_ply

    ck = latest_checkpoint(os.path.join(save_dir, exp, "checkpoints"))
    out = os.path.join(work, f"mesh_{exp}.ply")
    extract_main(["--cfg_path", cfg_path, "--ckpt_path", ck,
                  "--mesh_size", "128", "--chunk", "65536",
                  "--out", out])
    from neuralrecon_w_tpu.testing.synthetic import sample_surface

    gt_path = os.path.join(work, f"gt_{shape}.ply")
    write_ply(gt_path, sample_surface(shape, 20000, info["sphere_radius"]))
    res = eval_mesh(out, gt_path, info["scene_config"], is_mesh=True,
                    threshold=[0.05, 0.1, 0.2], save_name=exp,
                    write_visualizations=False)
    print("F-scores @ [0.05, 0.1, 0.2]:",
          [round(f, 4) for f in res["fscores"]], flush=True)
    print("chamfer:", round(res.get("dist1", 0), 4),
          round(res.get("dist2", 0), 4), flush=True)


if __name__ == "__main__":
    main()
