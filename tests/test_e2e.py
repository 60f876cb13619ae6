"""End-to-end pipeline test on the synthetic sphere scene:
split tsv -> ray cache -> training -> mesh extraction -> evaluation.

This is the tiny-scene fixture the reference never had (SURVEY.md §4);
it exercises every CLI-facing subsystem against ground truth geometry.
"""

import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    from neuralrecon_w_tpu.testing import make_synthetic_scene

    root = str(tmp_path_factory.mktemp("scene") / "sphere_scene")
    os.makedirs(root)
    info = make_synthetic_scene(root, n_images=6, n_test=1, img_wh=(40, 30))
    return root, info


@pytest.fixture(scope="module")
def cfg_path(scene, tmp_path_factory):
    root, _ = scene
    cfg = {
        "NEUCONW": {
            "N_SAMPLES": 8, "N_IMPORTANCE": 8, "UP_SAMPLE_STEP": 2,
            "N_OUTSIDE": 2, "BOUNDARY_SAMPLES": 2, "S_VAL_BASE": 1,
            "SAMPLE_RANGE": 4, "N_VOCAB": 16, "ANNEAL_END": 100,
            "UPDATE_FREQ": 100, "TRAIN_VOXEL_SIZE": 0.12,
            "SDF_THRESHOLD": 0.1, "NEAR_FAR_OVERRIDE": True,
            "SDF_CONFIG": {"d_hidden": 64, "d_out": 65, "n_layers": 4,
                            "skip_in": (2,)},
            "COLOR_CONFIG": {"d_feature": 64, "d_hidden": 32, "n_layers": 2,
                              "head_channels": 16},
            "MESH_MASK_LIST": ["sky"],
            "DEPTH_LOSS": True,
            "LOSS": {"depth_weight": 1.0},
        },
        "DATASET": {
            "ROOT_DIR": root,
            "DATASET_NAME": "phototourism",
            "PHOTOTOURISM": {"IMG_DOWNSCALE": 1},
        },
        "TRAINER": {"SAVE_FREQ": 1000, "VAL_FREQ": 100.0, "CANONICAL_LR": 1e-3,
                     "CANONICAL_BS": 512},
    }
    path = str(tmp_path_factory.mktemp("cfg") / "train_sphere.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


@pytest.mark.slow
def test_01_prepare_split(scene):
    root, info = scene
    from neuralrecon_w_tpu.tools.prepare_data.prepare_data_split import main

    path = main(["--root_dir", root, "--num_test", "1",
                 "--roi_threshold", "0.3", "--static_threshold", "0.3"])
    lines = open(path).read().strip().split("\n")
    assert len(lines) >= 5  # header + images


@pytest.mark.slow
def test_02_prepare_cache(scene):
    root, _ = scene
    from neuralrecon_w_tpu.tools.prepare_data.prepare_data_cache import main

    split_root = main(["--root_dir", root, "--split_to_chunks", "8"])
    assert os.path.exists(os.path.join(split_root, "split_0", "rays1.h5"))
    assert os.path.exists(os.path.join(split_root, "rays1_meta_info.json"))


@pytest.mark.slow
def test_03_train(scene, cfg_path, tmp_path_factory):
    root, _ = scene
    from neuralrecon_w_tpu.tools.train_cli import main

    save_dir = str(tmp_path_factory.mktemp("run"))
    trainer = main([
        "--cfg_path", cfg_path, "--batch_size", "512",
        "--test_batch_size", "128", "--num_epochs", "100",
        "--max_steps", "300", "--exp_name", "sphere", "--save_dir", save_dir,
    ])
    assert int(trainer.state.step) == 300
    # the surface refinement fired and produced a non-degenerate grid:
    # 5 seeded calibration runs measured 13272-13332 occupied voxels
    # (docs/e2e_gate_calibration.json); an all-negative level shift or
    # an empty zero set lands far outside [8000, 40000]
    assert trainer.fine_grid_host is not None
    n_vox = int(trainer.fine_grid_host.coords.shape[0])
    assert 8000 <= n_vox <= 40000, n_vox
    # metrics were logged
    log = os.path.join(save_dir, "sphere", "logs", "metrics.jsonl")
    assert os.path.getsize(log) > 0
    # checkpoint written at end
    from neuralrecon_w_tpu.training import latest_checkpoint

    ck = latest_checkpoint(os.path.join(save_dir, "sphere", "checkpoints"))
    assert ck is not None and ck.endswith("step_300")
    test_03_train.ckpt = ck
    test_03_train.save_dir = save_dir


@pytest.mark.slow
def test_04_extract_and_eval(scene, cfg_path, tmp_path_factory):
    root, info = scene
    from neuralrecon_w_tpu.tools.extract_mesh_cli import main as extract_main
    from neuralrecon_w_tpu.evaluation import eval_mesh
    from neuralrecon_w_tpu.utils.ply import read_ply, write_ply

    ck = test_03_train.ckpt
    out = str(tmp_path_factory.mktemp("mesh") / "mesh.ply")
    path = extract_main([
        "--cfg_path", cfg_path, "--ckpt_path", ck,
        "--mesh_size", "48", "--chunk", "8192", "--vertex_color",
        "--a_index", "1", "--out", out,
    ])
    assert path == out and os.path.exists(out)
    mesh = read_ply(out)
    assert len(mesh["verts"]) > 50
    assert "colors" in mesh

    # analytic GT sphere point cloud
    rs = np.random.RandomState(0)
    v = rs.randn(4000, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    gt_path = str(tmp_path_factory.mktemp("gt") / "gt.ply")
    write_ply(gt_path, v * info["sphere_radius"])

    res = eval_mesh(out, gt_path, info["scene_config"], is_mesh=True,
                    threshold=[0.5], save_name="e2e",
                    write_visualizations=False)
    # Gates calibrated from 5 seeded runs of this exact pipeline
    # (scripts/exp_e2e_gate_calibration.py; raw bands in
    # docs/e2e_gate_calibration.json): F mean 0.349 sigma 0.050,
    # chamfer_pred_to_gt mean 0.523 sigma 0.022, chamfer_gt_to_pred
    # mean 0.659 sigma 0.044. Each gate sits at mean +/- 4*sigma:
    # sigma from n=5 is itself noisy and GEMM summation-order
    # differences across BLAS/backends move F by ~0.05 at this step
    # count, so 3*sigma left real flake risk (advisor r3) — 4*sigma
    # still catches any genuine regression (the degenerate failure
    # modes score F < 0.05).
    assert res["fscores"][0] > 0.14, res
    assert res["chamfer_pred_to_gt"] < 0.62, res
    assert res["chamfer_gt_to_pred"] < 0.84, res


@pytest.mark.slow
def test_04b_render_cli_from_trained_ckpt(scene, cfg_path, tmp_path_factory):
    """render_cli on a TRAINED checkpoint exercises the fine-grid
    restore path (the surface grid persisted by save_checkpoint drives
    surface-guided sampling in the render)."""
    from PIL import Image

    from neuralrecon_w_tpu.tools.render_cli import main as render_main
    from neuralrecon_w_tpu.training.checkpoint import restore_checkpoint

    ck = test_03_train.ckpt
    # precondition: the 300-step training refreshed the surface grid
    assert "fine_grid" in restore_checkpoint(ck, None)
    out = str(tmp_path_factory.mktemp("render"))
    render_main(["--cfg_path", cfg_path, "--ckpt_path", ck,
                 "--out_dir", out, "--img_downscale", "2",
                 "--chunk", "120"])
    pngs = [p for p in os.listdir(out) if p.startswith("view_")
            and not p.endswith(("_depth.png", "_normal.png"))]
    assert len(pngs) == 1
    img = np.asarray(Image.open(os.path.join(out, pngs[0])), np.float32)
    assert img.shape == (15, 20, 3)
    # a trained model renders structure, not a constant field
    assert img.std() > 5.0


@pytest.mark.slow
def test_05_resume(scene, cfg_path):
    """Checkpoint resume continues from the saved step."""
    from neuralrecon_w_tpu.tools.train_cli import main

    trainer = main([
        "--cfg_path", cfg_path, "--batch_size", "512",
        "--test_batch_size", "128", "--num_epochs", "100",
        "--max_steps", "2", "--exp_name", "sphere_resume",
        "--save_dir", test_03_train.save_dir,
        "--ckpt_path", test_03_train.ckpt, "--divide_lr",
    ])
    assert int(trainer.state.step) == 302


def test_blobs_fixture_generates_consistent_workspace(tmp_path):
    """The non-convex union-of-spheres fixture: surface samples lie on
    the zero set, tracks survive the occlusion test, and the workspace
    loads through the standard dataset path."""
    from neuralrecon_w_tpu.datasets import load_scene_meta
    from neuralrecon_w_tpu.testing.synthetic import (
        blobs_sdf, make_synthetic_scene, sample_surface,
    )

    pts = sample_surface("blobs", 2000, 1.0)
    assert len(pts) == 2000
    assert float(np.abs(blobs_sdf(pts)).max()) < 1e-6
    # the union is genuinely non-convex: some midpoints of surface-point
    # pairs lie OUTSIDE the shape (positive SDF)
    mid = (pts[:500] + pts[500:1000]) / 2
    assert np.sum(blobs_sdf(mid) > 0) > 0

    root = str(tmp_path / "blobs_scene")
    os.makedirs(root)
    info = make_synthetic_scene(root, n_images=6, n_test=1, img_wh=(40, 30),
                                n_points=250, shape="blobs")
    assert info["shape"] == "blobs" and info["n_points"] > 100
    meta = load_scene_meta(root)
    assert len(meta.img_ids_train) == 5
    # every COLMAP track must reproject onto its keypoint pixel
    from neuralrecon_w_tpu.datasets.colmap import (
        read_images_binary, read_points3d_binary,
    )
    images = read_images_binary(os.path.join(root, "dense/sparse/images.bin"))
    pts3d = read_points3d_binary(os.path.join(root, "dense/sparse/points3D.bin"))
    im = next(iter(images.values()))
    assert len(im.point3D_ids) > 10
