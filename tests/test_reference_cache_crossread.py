"""Cache cross-compatibility: train THIS framework from h5 ray-cache
splits written by the REFERENCE's own torch writer.

The reference's PhototourismDataset(use_cache=False) +
prepare_data_cache.py run (CPU, CUDA externals stubbed — see
_ref_cache_writer.py) on a synthetic workspace; our read_ray_cache /
RayPool / jit_train_step then consume the reference-written splits
directly. This pins the full storage contract end to end: h5 layout,
meta_info.json, 12-column with-semantics row order
(reference datasets/phototourism.py:611-623), padding rows, and the ray
geometry conventions (no +0.5 centering, percentile near/far, SFM depth
raster + weights)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def ref_cache(tmp_path_factory):
    pytest.importorskip("torch")
    pytest.importorskip("pandas")
    from neuralrecon_w_tpu.testing import make_synthetic_scene

    # the reference hardcodes per-scene sfm_path/depth_percent by the
    # root dir's basename and crashes on unknown names
    # (reference datasets/phototourism.py:82-93) -> brandenburg_gate,
    # whose sfm_path is '../neuralsfm' relative to dense/
    root = str(tmp_path_factory.mktemp("ref_scene") / "brandenburg_gate")
    os.makedirs(root)
    make_synthetic_scene(root, n_images=6, n_test=1, img_wh=(40, 30))
    os.symlink(os.path.join(root, "dense", "sparse"),
               os.path.join(root, "neuralsfm"))

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never claim the chip
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "_ref_cache_writer.py"),
         root, "cache_ref", "8"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0 and "REF_CACHE_WRITER_OK" in r.stdout, (
        r.stdout[-2000:], r.stderr[-2000:])
    return root


@pytest.mark.slow
def test_reference_cache_format_readable(ref_cache):
    import json

    from neuralrecon_w_tpu.datasets import read_ray_cache

    split_root = os.path.join(ref_cache, "cache_ref", "splits")
    names = sorted(d for d in os.listdir(split_root)
                   if os.path.isdir(os.path.join(split_root, d)))
    assert len(names) == 8, names
    meta = json.load(open(os.path.join(split_root, "rays1_meta_info.json")))
    rays, rgbs = read_ray_cache(split_root)
    assert rays.shape[0] == meta["data_length"] == rgbs.shape[0]
    # 12-col with-semantics layout [o3 d3 near far ts label depth weight]
    assert rays.shape[1] == 12 and rgbs.shape[1] == 3
    assert np.all(np.isfinite(rays)) and np.all(rgbs >= 0) and np.all(rgbs <= 1)
    d = rays[:, 3:6]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1).mean(), 1.0, atol=0.25)
    assert np.all(rays[:, 7] > rays[:, 6])  # far > near
    ts = rays[:, 8]
    assert np.all(ts == ts.astype(np.int64))  # integer image ids
    labels = rays[:, 9]
    assert set(np.unique(labels.astype(np.int64))) <= set(range(151))
    # depth oversampling (brandenburg depth_percent=0.2) left valid rows
    assert (rays[:, 11] > 0).mean() > 0.02


@pytest.mark.slow
def test_train_from_reference_cache(ref_cache):
    """Full consumption path: reference-written splits -> RayPool ->
    jitted train step over the device mesh; loss finite and descending."""
    import jax

    from neuralrecon_w_tpu.config import get_cfg_defaults
    from neuralrecon_w_tpu.datasets import (
        RayPool, load_scene_meta, read_ray_cache,
    )
    from neuralrecon_w_tpu.models import field_config_from_cfg, init_field
    from neuralrecon_w_tpu.rendering import SceneInfo, render_config_from_cfg
    from neuralrecon_w_tpu.training import (
        init_state, loss_config_from_cfg, make_optimizer, make_train_step,
    )

    cfg = get_cfg_defaults()
    n = cfg.NEUCONW
    n.N_SAMPLES, n.N_IMPORTANCE, n.UP_SAMPLE_STEP = 8, 8, 2
    n.N_OUTSIDE, n.BOUNDARY_SAMPLES, n.N_VOCAB = 2, 2, 64
    n.SDF_CONFIG.d_hidden, n.SDF_CONFIG.d_out = 64, 65
    n.SDF_CONFIG.n_layers, n.SDF_CONFIG.skip_in = 4, (2,)
    n.COLOR_CONFIG.d_feature, n.COLOR_CONFIG.d_hidden = 64, 32
    n.COLOR_CONFIG.n_layers, n.COLOR_CONFIG.head_channels = 2, 16
    n.DEPTH_LOSS = True
    n.LOSS.depth_weight = 1.0

    import jax.numpy as jnp

    meta = load_scene_meta(ref_cache)
    sc = meta.scene_config
    scene = SceneInfo(origin=jnp.asarray(sc["origin"], jnp.float32),
                      radius=jnp.asarray(float(sc["radius"])),
                      sfm2gt=jnp.asarray(sc["sfm2gt"], jnp.float32))
    rays, rgbs = read_ray_cache(
        os.path.join(ref_cache, "cache_ref", "splits"))
    pool = RayPool(rays, rgbs, with_semantics=True, seed=0)

    fc = field_config_from_cfg(cfg)
    rcfg = render_config_from_cfg(cfg)
    lcfg = loss_config_from_cfg(cfg)
    opt, _ = make_optimizer(cfg, 256)
    state = init_state(jax.random.PRNGKey(0), fc, opt)
    step = jax.jit(make_train_step(fc, rcfg, lcfg, opt, anneal_end=100))

    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        batch = pool.next_batch(256)
        rng, k = jax.random.split(rng)
        state, aux = step(state, scene, batch, k)
        losses.append(float(aux["loss"]))
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
