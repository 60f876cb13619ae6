"""render_cli: novel-view synthesis + NeRF-W appearance control from a
checkpoint (the user-facing render tool the reference lacks; appearance
machinery per reference lightning_modules/neuconw_system.py:74-78)."""

import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def render_setup(tmp_path_factory):
    """Synthetic scene + untrained-but-valid checkpoint + tiny cfg."""
    import jax

    from neuralrecon_w_tpu.config import get_cfg_defaults
    from neuralrecon_w_tpu.models.neuconw import (
        field_config_from_cfg, init_field,
    )
    from neuralrecon_w_tpu.testing import make_synthetic_scene
    from neuralrecon_w_tpu.training.checkpoint import save_checkpoint

    base = tmp_path_factory.mktemp("render_cli")
    root = str(base / "sphere_scene")
    os.makedirs(root)
    make_synthetic_scene(root, n_images=6, n_test=1, img_wh=(40, 30))

    cfg_dict = {
        "NEUCONW": {
            "N_SAMPLES": 8, "N_IMPORTANCE": 4, "UP_SAMPLE_STEP": 1,
            "N_OUTSIDE": 2, "BOUNDARY_SAMPLES": 2, "S_VAL_BASE": 1,
            "SAMPLE_RANGE": 4, "N_VOCAB": 16, "NEAR_FAR_OVERRIDE": True,
            "SDF_CONFIG": {"d_hidden": 32, "d_out": 33, "n_layers": 2,
                           "skip_in": ()},
            "COLOR_CONFIG": {"d_feature": 32, "d_hidden": 16, "n_layers": 2,
                             "head_channels": 8},
        },
        "DATASET": {"ROOT_DIR": root, "DATASET_NAME": "phototourism",
                    "PHOTOTOURISM": {"IMG_DOWNSCALE": 1}},
    }
    cfg_path = str(base / "train_sphere.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)

    cfg = get_cfg_defaults()
    cfg.merge_from_file(cfg_path)
    fc = field_config_from_cfg(cfg)
    params = jax.device_get(init_field(jax.random.PRNGKey(0), fc))
    ckpt_path = save_checkpoint(str(base / "ck"), 7, params)
    return cfg_path, ckpt_path, str(base)


def _frames(out_dir, prefix):
    return sorted(p for p in os.listdir(out_dir)
                  if p.startswith(prefix) and not p.endswith("_depth.png")
                  and not p.endswith("_normal.png"))


def test_render_view_outputs(render_setup):
    from PIL import Image

    from neuralrecon_w_tpu.tools.render_cli import main

    cfg_path, ckpt_path, base = render_setup
    out = os.path.join(base, "views")
    main(["--cfg_path", cfg_path, "--ckpt_path", ckpt_path,
          "--out_dir", out, "--img_downscale", "2", "--chunk", "128"])
    png = _frames(out, "view_")
    assert len(png) == 1
    img = np.asarray(Image.open(os.path.join(out, png[0])))
    assert img.shape == (15, 20, 3)
    for suffix in ("_depth.png", "_normal.png"):
        assert os.path.exists(os.path.join(out, png[0][:-4] + suffix))


def test_appearance_override_changes_colors(render_setup):
    """Different --a_index embeddings must change rendered colors (the
    appearance head consumes the per-image table)."""
    from PIL import Image

    from neuralrecon_w_tpu.tools.render_cli import main

    cfg_path, ckpt_path, base = render_setup
    outs = []
    for a in (1, 9):
        out = os.path.join(base, f"a{a}")
        main(["--cfg_path", cfg_path, "--ckpt_path", ckpt_path,
              "--out_dir", out, "--img_downscale", "2", "--chunk", "128",
              "--a_index", str(a)])
        name = _frames(out, "view_")[0]
        outs.append(np.asarray(Image.open(os.path.join(out, name)), np.float32))
    assert np.abs(outs[0] - outs[1]).mean() > 0.1


def test_appearance_interpolation_endpoints(render_setup):
    """Frame 0 of an a-interp sweep equals rendering with the endpoint
    embedding; intermediate frames differ from both endpoints."""
    from PIL import Image

    from neuralrecon_w_tpu.tools.render_cli import main

    cfg_path, ckpt_path, base = render_setup
    out = os.path.join(base, "interp")
    main(["--cfg_path", cfg_path, "--ckpt_path", ckpt_path,
          "--out_dir", out, "--img_downscale", "2", "--chunk", "128",
          "--a_interp", "1,3", "--frames", "3"])
    frames = _frames(out, "interp_")
    assert len(frames) == 3
    arrs = [np.asarray(Image.open(os.path.join(out, f)), np.float32)
            for f in frames]
    assert np.abs(arrs[0] - arrs[2]).mean() > 1e-3  # endpoints differ
    mid_vs_ends = min(np.abs(arrs[1] - arrs[0]).mean(),
                      np.abs(arrs[1] - arrs[2]).mean())
    assert mid_vs_ends > 1e-4


def test_gif_assembly(render_setup):
    from PIL import Image

    from neuralrecon_w_tpu.tools.render_cli import main

    cfg_path, ckpt_path, base = render_setup
    out = os.path.join(base, "gif")
    main(["--cfg_path", cfg_path, "--ckpt_path", ckpt_path,
          "--out_dir", out, "--img_downscale", "2", "--chunk", "128",
          "--a_interp", "1,3", "--frames", "3", "--gif"])
    gif = Image.open(os.path.join(out, "interp_1_3.gif"))
    assert gif.is_animated and gif.n_frames == 4  # 3 + ping-pong middle


def test_pose_interp_moves_camera(render_setup):
    from PIL import Image

    from neuralrecon_w_tpu.tools.render_cli import main

    cfg_path, ckpt_path, base = render_setup
    out = os.path.join(base, "flythrough")
    main(["--cfg_path", cfg_path, "--ckpt_path", ckpt_path,
          "--out_dir", out, "--img_downscale", "2", "--chunk", "128",
          "--a_interp", "1,3", "--frames", "2", "--pose_interp"])
    frames = _frames(out, "interp_")
    # camera moved between endpoint views -> depth images differ
    d = [np.asarray(Image.open(os.path.join(out, f[:-4] + "_depth.png")),
                    np.float32) for f in frames]
    assert np.abs(d[0] - d[1]).mean() > 1e-3


def _sharded_setup(cfg_path, ckpt_path):
    """Shared pieces for the sharded-render parity tests."""
    import numpy as np

    from neuralrecon_w_tpu.config import get_cfg_defaults
    from neuralrecon_w_tpu.datasets.phototourism import (
        build_image_rays, load_image,
    )
    from neuralrecon_w_tpu.models.neuconw import field_config_from_cfg
    from neuralrecon_w_tpu.rendering.renderer import render_config_from_cfg
    from neuralrecon_w_tpu.training.checkpoint import restore_checkpoint
    from neuralrecon_w_tpu.training.step import make_render_fn
    from neuralrecon_w_tpu.utils.scene import load_scene_bundle

    cfg = get_cfg_defaults()
    cfg.merge_from_file(cfg_path)
    meta, scene, sfm_grid, sfm_dgrid = load_scene_bundle(cfg, 4)
    params = restore_checkpoint(ckpt_path, None)["params"]
    fc = field_config_from_cfg(cfg)
    rcfg = render_config_from_cfg(cfg, sfm_level=sfm_grid.level,
                                  nerf_far_override=True)
    render_chunk = make_render_fn(fc, rcfg)

    id_ = meta.img_ids_train[0]
    h, w = load_image(meta, id_).shape[:2]
    rays, _ = build_image_rays(meta, id_, with_semantics=False)
    rays10 = np.concatenate([rays[:, :8], rays[:, 9:11]], axis=1)
    ts = rays[:, 8].astype(np.int32)
    labels = np.zeros((len(rays10),), np.int32)
    kw = dict(chunk=40, fine_grid=None, sfm_grid=sfm_dgrid)
    return (render_chunk, params, scene, rays10, ts, labels, (w, h), kw,
            (fc, rcfg))


_sharded_single_cache = {}


def _assert_sharded_parity(render_setup, mesh_kwargs):
    import numpy as np

    from neuralrecon_w_tpu.parallel.mesh import make_mesh
    from neuralrecon_w_tpu.training.validation import render_image

    cfg_path, ckpt_path, _ = render_setup
    (render_chunk, params, scene, rays10, ts, labels, wh,
     kw, _fcrcfg) = _sharded_setup(cfg_path, ckpt_path)
    # the single-device reference render is identical across the mesh
    # variants; compute it once per session
    if "single" not in _sharded_single_cache:
        _sharded_single_cache["single"] = render_image(
            render_chunk, params, scene, rays10, ts, labels, wh, **kw)
    single = _sharded_single_cache["single"]
    mesh = make_mesh(**mesh_kwargs)
    sharded = render_image(render_chunk, params, scene, rays10, ts, labels,
                           wh, mesh=mesh, **kw)
    for k in ("color", "depth", "normal"):
        np.testing.assert_allclose(sharded[k], single[k], rtol=2e-5,
                                   atol=2e-5, err_msg=k)


def test_sharded_render_matches_single_device(render_setup):
    """render_image over the 8-device mesh (rays sharded on the data
    axis, params replicated) reproduces the single-device render."""
    _assert_sharded_parity(render_setup, {})


def test_sharded_render_with_model_axis(render_setup):
    """A (data=4, model=2) mesh must also reproduce the single-device
    render: rays shard on data only, params replicate over both axes."""
    _assert_sharded_parity(render_setup, dict(n_data=4, n_model=2))


def test_scan_render_matches_chunk_loop(render_setup):
    """make_scan_render_fn (whole frame in ONE device dispatch, the
    render_cli --dispatch scan serving path) reproduces the host
    chunk-loop render image-for-image."""
    import numpy as np

    from neuralrecon_w_tpu.training.step import make_scan_render_fn
    from neuralrecon_w_tpu.training.validation import render_image

    cfg_path, ckpt_path, _ = render_setup
    (render_chunk, params, scene, rays10, ts, labels, wh,
     kw, (fc, rcfg)) = _sharded_setup(cfg_path, ckpt_path)
    if "single" not in _sharded_single_cache:
        _sharded_single_cache["single"] = render_image(
            render_chunk, params, scene, rays10, ts, labels, wh, **kw)
    single = _sharded_single_cache["single"]
    scan_render = make_scan_render_fn(fc, rcfg, kw["chunk"])
    scanned = render_image(render_chunk, params, scene, rays10, ts, labels,
                           wh, scan_render=scan_render, **kw)
    for k in ("color", "depth", "normal"):
        np.testing.assert_allclose(scanned[k], single[k], rtol=2e-5,
                                   atol=2e-5, err_msg=k)
