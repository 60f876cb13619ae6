"""End-to-end tests of the "W" machinery (the reason NeuS-W exists):
appearance embeddings absorbing per-image photometric jitter, and
semantic ray masks protecting training from transient occluders
(reference lightning_modules/neuconw_system.py:74-78, 348-355).

Small-scale versions of scripts/exp_wild_ablation.py; the full-scale
flagship numbers (3000 steps, real chip) live in STATUS.md's ablation
table. Both tests run the COMPLETE pipeline: synthetic workspace ->
ray cache -> train_cli (with online surface refresh) -> probe/extract.
"""

import json
import os

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow

JITTER = 0.35


def _write_cfg(path, root, encode_a=True, ray_mask=None, update_freq=250):
    cfg = {
        "NEUCONW": {
            "N_SAMPLES": 6, "N_IMPORTANCE": 8, "UP_SAMPLE_STEP": 2,
            "N_OUTSIDE": 2, "BOUNDARY_SAMPLES": 4, "S_VAL_BASE": 3,
            "SAMPLE_RANGE": 8, "N_VOCAB": 16, "ANNEAL_END": 400,
            "UPDATE_FREQ": update_freq, "TRAIN_VOXEL_SIZE": 0.08,
            "SDF_THRESHOLD": 0.0, "NEAR_FAR_OVERRIDE": True,
            "ENCODE_A": bool(encode_a),
            "RAY_MASK_LIST": ray_mask,
            "MESH_MASK_LIST": ["sky"],
            "DEPTH_LOSS": True,
            "LOSS": {"depth_weight": 1.0, "igr_weight": 0.001},
            "SDF_CONFIG": {"d_hidden": 128, "d_out": 129, "n_layers": 4,
                           "skip_in": (2,)},
            "COLOR_CONFIG": {"d_feature": 128, "d_hidden": 64,
                             "n_layers": 2, "head_channels": 32},
        },
        "DATASET": {
            "ROOT_DIR": root,
            "DATASET_NAME": "phototourism",
            "PHOTOTOURISM": {"IMG_DOWNSCALE": 1},
        },
        "TRAINER": {"SAVE_FREQ": 100000, "VAL_FREQ": 1e9,
                    "CANONICAL_LR": 5e-4, "CANONICAL_BS": 512},
    }
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def _build_scene(root, **kw):
    from neuralrecon_w_tpu.testing import make_synthetic_scene
    from neuralrecon_w_tpu.tools.prepare_data.prepare_data_cache import (
        main as cache_main,
    )

    info = make_synthetic_scene(
        root, n_images=14, n_test=2, img_wh=(48, 36), n_points=400,
        seed=0, **kw,
    )
    cache_main(["--root_dir", root, "--split_to_chunks", "8"])
    return info


def _train(cfg_path, tag, save_dir, steps=400, batch=512):
    from neuralrecon_w_tpu.tools.train_cli import main as train_main
    from neuralrecon_w_tpu.training import latest_checkpoint

    train_main([
        "--cfg_path", cfg_path, "--batch_size", str(batch),
        "--test_batch_size", "128", "--num_epochs", "1000",
        "--max_steps", str(steps), "--exp_name", tag,
        "--save_dir", save_dir,
    ])
    rows = [json.loads(l) for l in
            open(os.path.join(save_dir, tag, "logs", "metrics.jsonl"))]
    psnrs = [r["psnr"] for r in rows if "psnr" in r]
    tail = float(np.mean(psnrs[-max(len(psnrs) // 4, 1):]))
    ck = latest_checkpoint(os.path.join(save_dir, tag, "checkpoints"))
    return tail, ck


def test_appearance_embedding_absorbs_jitter(tmp_path):
    """Train on the photometrically-jittered scene with ENCODE_A, then
    probe the mechanism: rendering the SAME points/view under each
    image's embedding must track that image's injected gain. (Train
    PSNR alone is confounded on this fixture: unique per-image view
    directions let the IDR view branch absorb jitter too.)"""
    root = str(tmp_path / "scene_jitter")
    _build_scene(root, appearance_jitter=JITTER)
    cfg_path = _write_cfg(str(tmp_path / "cfg.yaml"), root, encode_a=True)
    # correlation strengthens monotonically with training (calibrated:
    # r_exposure 0.45 @ 400 steps, 0.72 @ 800, 0.83 @ 1200)
    psnr, ck = _train(cfg_path, "jitter_a", str(tmp_path), steps=1200)
    assert psnr > 18.0, f"jittered training failed to fit: psnr={psnr}"

    from neuralrecon_w_tpu.config import get_cfg_defaults
    from neuralrecon_w_tpu.models.neuconw import field_config_from_cfg
    from neuralrecon_w_tpu.testing import embedding_gain_correlation
    from neuralrecon_w_tpu.training.checkpoint import load_params_subtree

    cfg = get_cfg_defaults()
    cfg.merge_from_file(cfg_path)
    params = load_params_subtree(ck)
    res = embedding_gain_correlation(
        params, field_config_from_cfg(cfg),
        n_images=14, n_test=2, seed=0, jitter=JITTER, n_points=1024,
    )
    # flagship 3000-step runs reach r_exposure 0.89 (STATUS.md);
    # calibrated small-scale value at 1200 steps is 0.83
    assert res["pearson_r_exposure"] > 0.5, res
    # the embedding axis must actually move the output (not a constant)
    lo, hi = res["rendered_rgb_range"]
    assert hi - lo > 0.05, res


def test_transient_masking_protects_training(tmp_path):
    """Train on the occluder-painted scene with and without
    RAY_MASK_LIST=['person']: masking keeps the photometric fit clean
    (the unmasked run must spend capacity fitting view-inconsistent
    rectangles) and the masked geometry stays near GT."""
    root = str(tmp_path / "scene_occ")
    info = _build_scene(root, transient_occluders=True)
    cfg_m = _write_cfg(str(tmp_path / "cfg_m.yaml"), root,
                       ray_mask=["person"])
    cfg_u = _write_cfg(str(tmp_path / "cfg_u.yaml"), root, ray_mask=None)
    psnr_m, ck_m = _train(cfg_m, "occ_masked", str(tmp_path))
    psnr_u, _ = _train(cfg_u, "occ_unmasked", str(tmp_path))

    # flagship scale: +4.1 dB at 3000 steps, ~5 dB at step 300
    # (STATUS.md). At this 400-step CPU scale the measured margin
    # drifts with f32 summation order (observed 1.4-2.1 dB across
    # sessions); gate at 1.0 dB — still requires the unmasked run to
    # demonstrably lose capacity to the occluders.
    assert psnr_m > psnr_u + 1.0, (psnr_m, psnr_u)

    # masked geometry: extract and score against the analytic sphere
    from neuralrecon_w_tpu.evaluation import eval_mesh
    from neuralrecon_w_tpu.tools.extract_mesh_cli import main as extract_main
    from neuralrecon_w_tpu.utils.ply import write_ply

    mesh_path = str(tmp_path / "occ_masked_mesh.ply")
    extract_main([
        "--cfg_path", cfg_m, "--ckpt_path", ck_m,
        "--mesh_size", "64", "--chunk", "32768", "--out", mesh_path,
    ])
    assert os.path.exists(mesh_path), "masked run produced no surface"
    rs = np.random.RandomState(0)
    v = rs.randn(3000, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    gt_path = str(tmp_path / "gt.ply")
    write_ply(gt_path, v * info["sphere_radius"])
    res = eval_mesh(mesh_path, gt_path, info["scene_config"], is_mesh=True,
                    threshold=[0.1, 0.2], save_name="wild_mask",
                    write_visualizations=False)
    # Geometry-parity-under-occlusion at full scale is the flagship
    # ablation's claim (occluded+masked F@0.1 0.98 at 3000 steps on
    # hardware, STATUS.md). At this 12-view 48x36 CPU scale the mesh
    # stays coarse and oscillates (calibrated F@0.2 0.27-0.40 across
    # 400/800/1200 steps) — gate that the masked run still produces
    # geometry overlapping GT, with margin under the observed band.
    assert res["fscores"][1] > 0.15, res
