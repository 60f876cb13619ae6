"""Fused Pallas SDF-MLP kernel: interpret-mode correctness vs the jnp
reference path (runs on the CPU test harness; the compiled path is
exercised on real TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from neuralrecon_w_tpu.models.sdf import init_sdf, sdf_value
from neuralrecon_w_tpu.ops.pallas_mlp import (
    fused_field_sdf,
    fused_sdf_head,
    pack_sdf_weights,
)

CFG = dict(
    d_in=3, d_out=257, d_hidden=256, n_layers=8, skip_in=(4,), multires=6,
    bias=0.5, scale=1, geometric_init=True, weight_norm=True,
    inside_outside=False,
)
ITEMS = tuple(sorted(CFG.items()))


def test_fused_sdf_matches_reference():
    params = init_sdf(jax.random.PRNGKey(0), CFG)
    pts = np.random.RandomState(0).randn(2048, 3).astype(np.float32) * 0.5
    ref = np.asarray(sdf_value(params, CFG, jnp.asarray(pts)))
    out = np.asarray(
        fused_sdf_head(params, ITEMS, jnp.asarray(pts), tile=512, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_fused_sdf_scaled():
    cfg = dict(CFG, scale=2.0)
    items = tuple(sorted(cfg.items()))
    params = init_sdf(jax.random.PRNGKey(1), cfg)
    pts = np.random.RandomState(1).randn(512, 3).astype(np.float32) * 0.3
    ref = np.asarray(sdf_value(params, cfg, jnp.asarray(pts)))
    out = np.asarray(
        fused_sdf_head(params, items, jnp.asarray(pts), tile=512, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_fused_field_sdf_pads_and_reshapes():
    """Non-tile-multiple batches and batched shapes round-trip."""
    from neuralrecon_w_tpu.config import get_cfg_defaults
    from neuralrecon_w_tpu.models import field_config_from_cfg, init_field, field_sdf

    cfg = get_cfg_defaults()
    n = cfg.NEUCONW
    n.N_VOCAB = 8
    n.SDF_CONFIG.d_hidden = 256
    n.SDF_CONFIG.d_out = 257
    fc = field_config_from_cfg(cfg)
    params = init_field(jax.random.PRNGKey(0), fc)
    pts = jnp.asarray(np.random.RandomState(0).randn(5, 7, 3).astype(np.float32) * 0.4)
    ref = np.asarray(field_sdf(params, fc, pts))
    out = np.asarray(fused_field_sdf(params, fc, pts, tile=512, interpret=True))
    assert out.shape == (5, 7)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_pack_weights_shapes():
    params = init_sdf(jax.random.PRNGKey(0), CFG)
    packed = pack_sdf_weights(params, ITEMS)
    assert len(packed) == 9  # 8 hidden + 1 output layer
    # layer 0: PE 39 -> padded 128 in, 256 out
    assert packed[0][0].shape == (128, 256)
    # skip layer 4: (256-39 -> pad 256) + 128 PE = 384 in
    assert packed[4][0].shape == (384, 256)
    # output layer: 256 in, 257 out -> round_up(257, 128) = 384
    assert packed[8][0].shape == (256, 384)


def test_fused_field_forward_matches_reference_path():
    """Fused field kernel (SDF + hand-rolled input gradient + color) vs
    models.neuconw.field_forward, interpret mode."""
    from neuralrecon_w_tpu.config import get_cfg_defaults
    from neuralrecon_w_tpu.models import (
        field_config_from_cfg, field_forward, init_field,
    )
    from neuralrecon_w_tpu.ops.pallas_field import fused_field_forward

    cfg = get_cfg_defaults()
    n = cfg.NEUCONW
    n.N_VOCAB = 16
    n.SDF_CONFIG.d_hidden = 256
    n.SDF_CONFIG.d_out = 257
    n.COLOR_CONFIG.d_feature = 256
    fc = field_config_from_cfg(cfg)
    params = init_field(jax.random.PRNGKey(0), fc)
    rs = np.random.RandomState(0)
    pts = jnp.asarray(rs.randn(200, 3).astype(np.float32) * 0.4)
    dirs = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    a = params["embedding_a"][jnp.asarray(rs.randint(0, 16, 200), jnp.int32)]

    rgb_r, _, sdf_r, grad_r = field_forward(params, fc, pts, dirs, a)
    rgb_k, sdf_k, grad_k = fused_field_forward(params, fc, pts, dirs, a,
                                               tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(sdf_k), np.asarray(sdf_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(grad_k), np.asarray(grad_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_r), atol=1e-4)
