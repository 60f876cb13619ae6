"""Training-system tests: loss parity semantics, the jitted+sharded train
step (8 virtual CPU devices via conftest), sweeps, surface refinement,
checkpoint round-trip."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralrecon_w_tpu.config import get_cfg_defaults
from neuralrecon_w_tpu.models import field_config_from_cfg, init_field
from neuralrecon_w_tpu.ops.voxel_grid import VoxelGrid, grid_from_points
from neuralrecon_w_tpu.ops.ray_voxel import device_grid_from_host
from neuralrecon_w_tpu.parallel import make_mesh, sharded_sdf_sweep
from neuralrecon_w_tpu.rendering import SceneInfo, render_config_from_cfg
from neuralrecon_w_tpu.training import (
    TrainState,
    init_state,
    jit_train_step,
    loss_config_from_cfg,
    loss_terms,
    make_optimizer,
    make_train_step,
    mse,
    psnr,
    ray_mask_from_labels,
    scaled_lr,
    octree_update,
    surface_level,
)


def tiny_cfg():
    cfg = get_cfg_defaults()
    n = cfg.NEUCONW
    n.N_SAMPLES = 4
    n.N_IMPORTANCE = 4
    # one importance round: halves the unrolled sampler graph (CPU
    # compile budget); two-round coverage lives in the rendering and
    # sampler-parity suites
    n.UP_SAMPLE_STEP = 1
    n.N_OUTSIDE = 2
    n.BOUNDARY_SAMPLES = 2
    n.N_VOCAB = 8
    n.ANNEAL_END = 10
    n.SDF_CONFIG.d_hidden = 64
    n.SDF_CONFIG.d_out = 65
    n.SDF_CONFIG.n_layers = 4
    n.SDF_CONFIG.skip_in = (2,)
    n.COLOR_CONFIG.d_feature = 64
    n.COLOR_CONFIG.d_hidden = 16
    n.COLOR_CONFIG.n_layers = 2
    n.COLOR_CONFIG.head_channels = 8
    return cfg


def make_batch(n=16, seed=0):
    rs = np.random.RandomState(seed)
    o = rs.randn(n, 3).astype(np.float32) * 0.1 + np.array([0, 0, 2], np.float32)
    d = -o + rs.randn(n, 3).astype(np.float32) * 0.05
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    near = np.full((n, 1), 0.5, np.float32)
    far = np.full((n, 1), 4.0, np.float32)
    depth = np.full((n, 1), 2.0, np.float32)
    weight = (rs.rand(n, 1) > 0.5).astype(np.float32)
    rays = np.concatenate([o, d, near, far, depth, weight], axis=1)
    return {
        "rays": jnp.asarray(rays),
        "ts": jnp.asarray(rs.randint(0, 8, (n,)), jnp.int32),
        "labels": jnp.asarray(rs.randint(0, 4, (n,)), jnp.int32),
        "rgbs": jnp.asarray(rs.rand(n, 3).astype(np.float32)),
    }


def scene():
    return SceneInfo(
        origin=jnp.zeros((3,)), radius=jnp.asarray(2.5),
        sfm2gt=jnp.eye(4),
    )


def test_scaled_lr_rule():
    cfg = get_cfg_defaults()
    cfg.TRAINER.CANONICAL_LR = 1e-4
    cfg.TRAINER.CANONICAL_BS = 4096
    assert scaled_lr(cfg, 4096) == pytest.approx(1e-4)
    assert scaled_lr(cfg, 8192) == pytest.approx(2e-4)
    cfg.TRAINER.LR = 3e-4
    assert scaled_lr(cfg, 123) == pytest.approx(3e-4)


def test_loss_masked_rays_do_not_leak():
    """A masked ray's color error must not change the loss."""
    cfg = tiny_cfg()
    lcfg = loss_config_from_cfg(cfg)
    n = 8
    results = {
        "color": jnp.zeros((n, 3)),
        "gradient_error": jnp.asarray(0.5),
        "ray_mask": jnp.asarray([1, 1, 1, 1, 0, 0, 0, 0], jnp.float32),
        "mask_error": jnp.zeros((n, 1)),
        "sfm_depth_sq": jnp.zeros((n,)),
        "sfm_depth_valid": jnp.zeros((n,)),
        "floor_normal_error": jnp.zeros((n, 3)),
        "floor_count": jnp.zeros(()),
    }
    rgbs = jnp.ones((n, 3))
    base = loss_terms(lcfg, results, rgbs)
    # corrupt masked rays' colors wildly
    results2 = dict(results, color=results["color"].at[4:].set(100.0))
    pert = loss_terms(lcfg, results2, rgbs)
    np.testing.assert_allclose(float(base["loss"]), float(pert["loss"]), rtol=1e-6)
    # color term: sum |0-1| * 4 rays * 3 ch / 4 = 3.0
    np.testing.assert_allclose(float(base["color_loss"]), 3.0, rtol=1e-5)


def test_ray_mask_from_labels():
    labels = jnp.asarray([0, 1, 2, 1], jnp.int32)
    m = ray_mask_from_labels(labels, (1,))
    np.testing.assert_array_equal(np.asarray(m), [1, 0, 1, 0])


@pytest.mark.slow
def test_train_step_runs_and_descends():
    cfg = tiny_cfg()
    fc = field_config_from_cfg(cfg)
    rcfg = render_config_from_cfg(cfg)
    lcfg = loss_config_from_cfg(cfg)
    opt, _ = make_optimizer(cfg, 2048, total_steps=0)
    state = init_state(jax.random.PRNGKey(0), fc, opt)
    step = make_train_step(fc, rcfg, lcfg, opt, anneal_end=10)

    batch = make_batch(16)
    rng = jax.random.PRNGKey(1)
    sc = scene()
    losses = []
    for _ in range(5):
        state, aux = step(state, sc, batch, rng)
        losses.append(float(aux["loss"]))
    assert int(state.step) == 5
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # overfitting one tiny batch must descend


def test_jit_train_step_multidevice():
    """The pjit'd step over an 8-device data mesh matches single-device."""
    cfg = tiny_cfg()
    # no bg chain: halves both compiles; the bg path shards as plain DP
    # and is covered by the slow-tier TP/DP and e2e suites
    cfg.NEUCONW.RENDER_BG = False
    cfg.NEUCONW.N_OUTSIDE = 0
    fc = field_config_from_cfg(cfg)
    rcfg = render_config_from_cfg(cfg)
    lcfg = loss_config_from_cfg(cfg)
    opt, _ = make_optimizer(cfg, 2048, total_steps=0)
    step = make_train_step(fc, rcfg, lcfg, opt, anneal_end=10)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    jstep = jit_train_step(step, mesh, donate=False)

    batch = make_batch(16)
    rng = jax.random.PRNGKey(1)
    sc = scene()

    s0 = init_state(jax.random.PRNGKey(0), fc, opt)
    # jit the single-device reference too: one whole-graph compile beats
    # eager per-op compilation of the full fwd+bwd graph by ~10x on CPU
    s1, aux1 = jax.jit(step)(s0, sc, batch, rng)
    s0b = init_state(jax.random.PRNGKey(0), fc, opt)
    s2, aux2 = jstep(s0b, sc, batch, rng, None, None)
    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]), rtol=1e-4)
    # params end up numerically identical paths
    la = jax.tree.leaves(s1.params)
    lb = jax.tree.leaves(s2.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _run_tp_equals_dp(cfg, batch_size=16):
    """TP (4 data x 2 model) and pure DP must produce the same loss and
    updated params; returns the spec tree for sharding-shape asserts."""
    from neuralrecon_w_tpu.parallel.mesh import field_param_specs
    from neuralrecon_w_tpu.parallel import shard_rays

    fc = field_config_from_cfg(cfg)
    rcfg = render_config_from_cfg(cfg)
    lcfg = loss_config_from_cfg(cfg)
    opt, _ = make_optimizer(cfg, 2048)
    step = make_train_step(fc, rcfg, lcfg, opt, anneal_end=10)
    batch = make_batch(batch_size)
    rng = jax.random.PRNGKey(1)
    sc = scene()

    mesh_tp = make_mesh(n_model=2)
    s0 = init_state(jax.random.PRNGKey(0), fc, opt)
    specs = field_param_specs(mesh_tp, s0.params)
    j_tp = jit_train_step(step, mesh_tp, donate=False, param_specs=specs)
    s_tp, aux_tp = j_tp(s0, sc, shard_rays(mesh_tp, batch), rng, None, None)

    mesh_dp = make_mesh()
    s0b = init_state(jax.random.PRNGKey(0), fc, opt)
    j_dp = jit_train_step(step, mesh_dp, donate=False)
    s_dp, aux_dp = j_dp(s0b, sc, shard_rays(mesh_dp, batch), rng, None, None)

    np.testing.assert_allclose(float(aux_tp["loss"]), float(aux_dp["loss"]),
                               rtol=1e-5)
    # atol: TP partitions GEMM reductions, so f32 summation order
    # differs from DP; observed worst case at flagship widths is one
    # element in 2e4 at 2.4e-5 (Adam updates are ~1e-3, so 1e-4 still
    # pins the update to within 10% elementwise)
    for a, b in zip(jax.tree.leaves(s_tp.params), jax.tree.leaves(s_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    return specs


@pytest.mark.slow
def test_tensor_parallel_matches_data_parallel():
    """TP==DP on the tiny config with its NATURAL shard-hostile dims
    (d_out 65): the odd output dim must engage the row-sharding fallback
    instead of silently replicating (VERDICT r01 #5)."""
    from jax.sharding import PartitionSpec as P
    from neuralrecon_w_tpu.parallel.mesh import MODEL_AXIS

    specs = _run_tp_equals_dp(tiny_cfg())
    spec_leaves = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    n_col = sum(1 for s in spec_leaves if s == P(None, MODEL_AXIS))
    n_row = sum(1 for s in spec_leaves if s == P(MODEL_AXIS, None))
    assert n_col > 4, specs
    assert n_row >= 1, specs  # the d_out=65 head row-shards


@pytest.mark.slow
def test_tensor_parallel_flagship_widths():
    """TP==DP at the UNMODIFIED flagship widths: SDF 8x512 d_out=513,
    color 4x256 d_feature=512, vocab 5000 (VERDICT r01 #5)."""
    from jax.sharding import PartitionSpec as P
    from neuralrecon_w_tpu.parallel.mesh import MODEL_AXIS

    cfg = get_cfg_defaults()
    n = cfg.NEUCONW
    n.N_SAMPLES = 4
    n.N_IMPORTANCE = 4
    n.UP_SAMPLE_STEP = 2
    n.N_OUTSIDE = 2
    n.BOUNDARY_SAMPLES = 2
    n.ANNEAL_END = 10
    n.N_VOCAB = 5000  # flagship vocab (defaults ship 1500)
    assert n.SDF_CONFIG.d_out == 513  # flagship SDF head
    specs = _run_tp_equals_dp(cfg, batch_size=8)
    spec_leaves = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert any(s == P(MODEL_AXIS, None) for s in spec_leaves), specs
    # the appearance table vocab-shards (5000 % 2 == 0)
    flat = jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda x: isinstance(x, P))[0]
    emb = [s for p, s in flat
           if any("embedding_a" in str(getattr(k, "key", "")) for k in p)]
    assert emb and all(s == P(MODEL_AXIS) for s in emb), emb


@pytest.mark.slow
def test_train_step_with_grids():
    """Fine + SFM grids attach as dynamic operands (no retrace crash)."""
    cfg = tiny_cfg()
    fc = field_config_from_cfg(cfg)
    lcfg = loss_config_from_cfg(cfg)
    opt, _ = make_optimizer(cfg, 2048)

    pts = np.random.RandomState(0).randn(64, 3).astype(np.float64) * 0.3
    grid = grid_from_points(pts, [-1, -1, -1], [1, 1, 1], voxel_size=0.25, expand=0)
    dgrid = device_grid_from_host(grid)
    from neuralrecon_w_tpu.rendering import render_config_from_cfg as rc

    rcfg = rc(cfg, sfm_level=grid.level, fine_level=grid.level, nerf_far_override=True)
    step = make_train_step(fc, rcfg, lcfg, opt, anneal_end=10)
    state = init_state(jax.random.PRNGKey(0), fc, opt)
    state, aux = step(state, scene(), make_batch(8), jax.random.PRNGKey(2),
                      dgrid, dgrid)
    assert np.isfinite(float(aux["loss"]))


def test_sharded_sdf_sweep_matches_plain():
    cfg = tiny_cfg()
    fc = field_config_from_cfg(cfg)
    params = init_field(jax.random.PRNGKey(0), fc)
    pts = np.random.RandomState(0).randn(1000, 3).astype(np.float32) * 0.4
    plain = sharded_sdf_sweep(params, fc, pts, mesh=None, chunk=128)
    mesh = make_mesh()
    sharded = sharded_sdf_sweep(params, fc, pts, mesh=mesh, chunk=128)
    assert plain.shape == (1000,)
    np.testing.assert_allclose(plain, sharded, atol=1e-5)


def test_surface_level_and_octree_update():
    cfg = tiny_cfg()
    fc = field_config_from_cfg(cfg)
    params = init_field(jax.random.PRNGKey(0), fc)

    scene_config = {
        "eval_bbx": [[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]],
        "sfm2gt": np.eye(4).tolist(),
        "origin": [0.0, 0.0, 0.0],
        "radius": 1.0,
    }
    lvl = surface_level(scene_config, train_voxel_size=0.3)
    assert lvl == 3  # 2*1.0 / 0.3 -> ceil(log2 6.67) = 3

    pts = np.random.RandomState(1).uniform(-0.9, 0.9, (500, 3))
    sfm_grid = grid_from_points(pts, [-1, -1, -1], [1, 1, 1], voxel_size=0.5, expand=0)
    host, dev = octree_update(
        params, fc, sfm_grid, scene_config,
        scene_origin=np.zeros(3), scene_radius=1.0,
        train_voxel_size=0.3, sdf_threshold=1.0, chunk=256,
    )
    # threshold 1.0 keeps essentially everything near geometric init
    assert host is not None and host.level == 3 and len(host.coords) > 0
    assert dev.occ.dtype == jnp.uint32


def test_octree_update_degenerate_sdf_warns(caplog):
    """A refresh that keeps >90% of candidate voxels (no meaningful zero
    set — e.g. the all-negative level-shifted basin) must warn loudly;
    a healthy refresh must not (BENCHMARKS.md quality matrix)."""
    import logging

    cfg = tiny_cfg()
    fc = field_config_from_cfg(cfg)
    params = init_field(jax.random.PRNGKey(0), fc)
    scene_config = {
        "eval_bbx": [[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]],
        "sfm2gt": np.eye(4).tolist(),
        "origin": [0.0, 0.0, 0.0],
        "radius": 1.0,
    }
    pts = np.random.RandomState(1).uniform(-0.9, 0.9, (500, 3))
    sfm_grid = grid_from_points(pts, [-1, -1, -1], [1, 1, 1], voxel_size=0.5,
                                expand=0)
    with caplog.at_level(logging.WARNING,
                         logger="neuralrecon_w_tpu.training.surface"):
        octree_update(params, fc, sfm_grid, scene_config,
                      scene_origin=np.zeros(3), scene_radius=1.0,
                      train_voxel_size=0.3, sdf_threshold=1e6, chunk=256)
    assert any("degenerate" in r.message for r in caplog.records)

    caplog.clear()
    with caplog.at_level(logging.WARNING,
                         logger="neuralrecon_w_tpu.training.surface"):
        octree_update(params, fc, sfm_grid, scene_config,
                      scene_origin=np.zeros(3), scene_radius=1.0,
                      train_voxel_size=0.3, sdf_threshold=0.0, chunk=256)
    assert not any("degenerate" in r.message for r in caplog.records)


def test_checkpoint_roundtrip(tmp_path):
    from neuralrecon_w_tpu.training import (
        latest_checkpoint, restore_checkpoint, save_checkpoint,
    )

    cfg = tiny_cfg()
    fc = field_config_from_cfg(cfg)
    params = init_field(jax.random.PRNGKey(0), fc)
    path = save_checkpoint(str(tmp_path / "ck"), 42, params)
    assert latest_checkpoint(str(tmp_path / "ck")) == path
    restored = restore_checkpoint(path)
    assert int(restored["step"]) == 42
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(restored["params"])
    assert len(a) == len(b)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))


def test_psnr_mse():
    a = jnp.zeros((4, 3))
    b = jnp.full((4, 3), 0.1)
    np.testing.assert_allclose(float(mse(a, b)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, rtol=1e-5)


def test_device_ray_pool():
    """HBM-resident pool: on-device gathers, sharded and unsharded."""
    from neuralrecon_w_tpu.datasets.cache import DeviceRayPool, RayPool

    rays = np.random.RandomState(0).rand(1024, 12).astype(np.float32)
    rgbs = np.random.RandomState(1).rand(1024, 3).astype(np.float32)
    pool = RayPool(rays, rgbs)
    for m in [None, make_mesh()]:
        dp = DeviceRayPool(pool, m)
        b = dp.next_batch(jax.random.PRNGKey(0), 64)
        assert b["rays"].shape == (64, 10)
        b2 = dp.next_batch(jax.random.PRNGKey(1), 64)
        assert not np.allclose(np.asarray(b["rays"]), np.asarray(b2["rays"]))
        src = set(map(tuple, np.round(pool.rays, 5)))
        for row in np.asarray(b["rays"])[:16]:
            assert tuple(np.round(row, 5)) in src


def test_device_ray_pool_epoch_semantics():
    """'epoch' sampling covers every pool row exactly once per epoch
    (per shard on a mesh) — the host RayPool / reference
    DataLoader(shuffle=True) statistics, produced on device."""
    from neuralrecon_w_tpu.datasets.cache import DeviceRayPool, RayPool

    n, bs = 512, 64
    rays = np.random.RandomState(0).rand(n, 12).astype(np.float32)
    rays[:, 0] = np.arange(n)  # row id rides in o_x
    rgbs = np.random.RandomState(1).rand(n, 3).astype(np.float32)
    pool = RayPool(rays, rgbs)
    for m in [None, make_mesh()]:
        dp = DeviceRayPool(pool, m, sampling="epoch", seed=5)
        epoch1 = [np.asarray(dp.next_batch(None, bs)["rays"][:, 0])
                  for _ in range(n // bs)]
        ids = np.concatenate(epoch1).astype(int)
        assert len(ids) == n and len(set(ids.tolist())) == n
        # the next epoch reshuffles: same coverage, different order
        epoch2 = [np.asarray(dp.next_batch(None, bs)["rays"][:, 0])
                  for _ in range(n // bs)]
        ids2 = np.concatenate(epoch2).astype(int)
        assert len(set(ids2.tolist())) == n
        assert not np.array_equal(ids, ids2)


def test_device_ray_pool_scan_window():
    """take_scan_window hands the scan dispatch disjoint consecutive
    epoch windows; crossing the epoch boundary reshuffles."""
    from neuralrecon_w_tpu.datasets.cache import DeviceRayPool, RayPool

    n = 512
    rays = np.random.RandomState(0).rand(n, 12).astype(np.float32)
    rgbs = np.random.RandomState(1).rand(n, 3).astype(np.float32)
    dp = DeviceRayPool(RayPool(rays, rgbs), None, sampling="epoch")
    perm, start = dp.take_scan_window(64, 4)
    perm2, start2 = dp.take_scan_window(64, 4)
    assert int(start) == 0 and int(start2) == 256
    assert perm2 is perm  # same epoch
    window = np.asarray(perm[:512]).astype(int)
    assert len(set(window.tolist())) == n  # a permutation: all disjoint
    # 256 rows left < 512 needed -> reshuffle, cursor back to 0
    perm3, start3 = dp.take_scan_window(64, 8)
    assert int(start3) == 0 and not np.array_equal(np.asarray(perm3), np.asarray(perm))
    import pytest

    with pytest.raises(ValueError):
        dp.take_scan_window(64, 9)  # window larger than the pool


@pytest.mark.slow
def test_trainer_scan_dispatch_with_device_pool(tmp_path):
    """The production TPU dispatch path (HBM-resident pool + scan-fused
    steps + epoch sampling) on the CPU mesh: steps advance by scan
    windows, loss finite, epoch windows drawn without replacement."""
    import yaml

    from neuralrecon_w_tpu.testing import make_synthetic_scene
    from neuralrecon_w_tpu.tools.prepare_data.prepare_data_cache import (
        main as cache_main,
    )
    from neuralrecon_w_tpu.tools.prepare_data.prepare_data_split import (
        main as split_main,
    )
    from neuralrecon_w_tpu.tools.train_cli import main as train_main

    root = str(tmp_path / "scene")
    os.makedirs(root)
    make_synthetic_scene(root, n_images=6, n_test=1, img_wh=(40, 30))
    split_main(["--root_dir", root, "--num_test", "1",
                "--roi_threshold", "0.3", "--static_threshold", "0.3"])
    cache_main(["--root_dir", root, "--split_to_chunks", "4"])
    cfg = {
        "NEUCONW": {
            "N_SAMPLES": 4, "N_IMPORTANCE": 4, "UP_SAMPLE_STEP": 1,
            # no bg chain: this test targets pool/scan dispatch
            # semantics; the bg path is covered by the rendering and
            # multidevice suites (CPU compile budget)
            "RENDER_BG": False,
            "N_OUTSIDE": 0, "BOUNDARY_SAMPLES": 2, "S_VAL_BASE": 1,
            "SAMPLE_RANGE": 4, "N_VOCAB": 16, "ANNEAL_END": 100,
            "UPDATE_FREQ": 1000, "TRAIN_VOXEL_SIZE": 0.12,
            "SDF_CONFIG": {"d_hidden": 48, "d_out": 49, "n_layers": 2,
                           "skip_in": [1]},
            "COLOR_CONFIG": {"d_feature": 48, "d_hidden": 16, "n_layers": 1,
                             "head_channels": 8},
        },
        "DATASET": {"ROOT_DIR": root, "DATASET_NAME": "phototourism",
                    "PHOTOTOURISM": {"IMG_DOWNSCALE": 1}},
        "TRAINER": {"SAVE_FREQ": 1000, "VAL_FREQ": 1000.0,
                    "CANONICAL_LR": 1e-3, "CANONICAL_BS": 512},
        # force the TPU production dispatch on the CPU mesh: device
        # pool (n_devices=1 keeps it single-shard) + scan fusion
        "TPU": {"DEVICE_POOL": True, "SCAN_INNER": 3},
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    trainer = train_main([
        "--cfg_path", cfg_path, "--batch_size", "64",
        "--test_batch_size", "64", "--num_epochs", "100",
        "--max_steps", "6", "--exp_name", "scan", "--n_devices", "1",
        "--save_dir", str(tmp_path / "run"),
    ])
    assert int(trainer.state.step) == 6
    assert trainer.device_pool is not None
    assert trainer.device_pool.sampling == "epoch"
    # two scan windows of 3 x 64 rays consumed without replacement
    assert trainer.device_pool._cursor > 0
    log = os.path.join(str(tmp_path / "run"), "scan", "logs", "metrics.jsonl")
    import json

    rows = [json.loads(l) for l in open(log)]
    assert rows and all(np.isfinite(r["loss"]) for r in rows)


def test_local_split_names_partition(tmp_path):
    """Shard assignment is a partition of the split set for every world
    size, including ones that do not divide the split count (the
    reference asserts divisibility instead, datasets/data.py:42-45)."""
    from neuralrecon_w_tpu.datasets.cache import local_split_names

    n_splits = 10
    for i in range(n_splits):
        (tmp_path / f"split_{i}").mkdir()
    for world in (1, 2, 3, 4, 7, 8, 10):
        shards = [local_split_names(str(tmp_path), world, r) for r in range(world)]
        flat = [s for shard in shards for s in shard]
        assert len(flat) == n_splits, (world, shards)
        assert len(set(flat)) == n_splits, (world, shards)
        assert all(shard for shard in shards)
    import pytest

    with pytest.raises(ValueError):
        local_split_names(str(tmp_path), n_splits + 1, 0)


@pytest.mark.slow
def test_bf16_activations_descend():
    """FIELD_DTYPE=bfloat16 halves activation traffic; training must
    still descend and the outputs stay f32."""
    cfg = tiny_cfg()
    cfg.TPU.FIELD_DTYPE = "bfloat16"
    fc = field_config_from_cfg(cfg)
    assert fc.act_dtype == "bfloat16"
    rcfg = render_config_from_cfg(cfg)
    lcfg = loss_config_from_cfg(cfg)
    opt, _ = make_optimizer(cfg, 2048, total_steps=0)
    state = init_state(jax.random.PRNGKey(0), fc, opt)
    step = make_train_step(fc, rcfg, lcfg, opt, anneal_end=10)
    batch = make_batch(16)
    losses = []
    for _ in range(5):
        state, aux = step(state, scene(), batch, jax.random.PRNGKey(1))
        losses.append(float(aux["loss"]))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]


def test_val_interval_lightning_semantics():
    """VAL_FREQ >= 1 is a step count (per-scene configs use 10000.0);
    < 1 is an epoch fraction (defaults use 0.125). The old
    epoch-multiple reading silently skipped validation on short runs."""
    from neuralrecon_w_tpu.training.loop import val_interval

    assert val_interval(10000.0, 36) == 10000
    assert val_interval(500.0, 36) == 500
    assert val_interval(0.125, 800) == 100
    assert val_interval(0.125, 4) == 1


def _fine_grid_and_level():
    pts = np.random.RandomState(3).randn(3000, 3)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)  # unit-sphere shell
    grid = grid_from_points(pts, [-2, -2, -2], [2, 2, 2], voxel_size=0.25,
                            expand=1)
    from neuralrecon_w_tpu.ops.ray_voxel import make_device_grid

    return grid, make_device_grid(grid)


@pytest.mark.slow
def test_surface_band_cache_matches_query():
    """step with batch surf_t/surf_hit == step with the exact per-step
    DDA query: the band cache is the same function of (ray, grid),
    hoisted out of the step and amortized over the refresh interval."""
    from neuralrecon_w_tpu.ops.ray_voxel import grid_near_far

    cfg = tiny_cfg()
    cfg.TPU.SURFACE_QUERY = "dda"  # exact in-step query as the oracle
    fc = field_config_from_cfg(cfg)
    lcfg = loss_config_from_cfg(cfg)
    opt, _ = make_optimizer(cfg, 2048)
    grid, dgrid = _fine_grid_and_level()
    rcfg = render_config_from_cfg(cfg, fine_level=grid.level)
    step = make_train_step(fc, rcfg, lcfg, opt, anneal_end=10)
    state = init_state(jax.random.PRNGKey(0), fc, opt)
    batch = make_batch(16)

    _, aux_q = step(state, scene(), batch, jax.random.PRNGKey(2), dgrid, None)

    surf, _, hit = grid_near_far(
        dgrid, grid.level, batch["rays"][:, 0:3], batch["rays"][:, 3:6],
        first_only=True)
    assert bool(jnp.any(hit))
    cbatch = dict(batch, surf_t=surf, surf_hit=hit)
    _, aux_c = step(state, scene(), cbatch, jax.random.PRNGKey(2), dgrid, None)
    np.testing.assert_allclose(
        float(aux_q["loss"]), float(aux_c["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(aux_q["psnr"]), float(aux_c["psnr"]), rtol=1e-6)


def test_device_pool_attach_surface():
    """attach_surface rows match the direct query for every gathered
    batch, sharded and unsharded; detach_surface removes them."""
    from neuralrecon_w_tpu.datasets.cache import DeviceRayPool, RayPool
    from neuralrecon_w_tpu.ops.ray_voxel import grid_near_far

    grid, dgrid = _fine_grid_and_level()
    rs = np.random.RandomState(0)
    n = 256
    o = rs.randn(n, 3).astype(np.float32) * 0.1 + np.array([0, 0, 2.2], np.float32)
    d = -o + rs.randn(n, 3).astype(np.float32) * 0.05
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rows = np.concatenate([
        o, d, np.full((n, 1), 0.5, np.float32), np.full((n, 1), 4.0, np.float32),
        rs.randint(0, 8, (n, 1)).astype(np.float32),
        rs.randint(0, 4, (n, 1)).astype(np.float32),
        np.full((n, 1), 2.0, np.float32), rs.rand(n, 1).astype(np.float32),
    ], axis=1)
    pool = RayPool(rows, rs.rand(n, 3).astype(np.float32))
    for m in [None, make_mesh()]:
        dp = DeviceRayPool(pool, m)
        dp.attach_surface(dgrid, grid.level, chunk=128)
        b = dp.next_batch(jax.random.PRNGKey(0), 64)
        assert "surf_t" in b and "surf_hit" in b
        surf, _, hit = grid_near_far(
            dgrid, grid.level, b["rays"][:, 0:3], b["rays"][:, 3:6],
            first_only=True)
        np.testing.assert_allclose(np.asarray(b["surf_t"]), np.asarray(surf),
                                   atol=1e-6)
        assert bool(jnp.all(b["surf_hit"] == hit))
        assert bool(jnp.any(b["surf_hit"]))
        dp.detach_surface()
        assert "surf_t" not in dp.data
