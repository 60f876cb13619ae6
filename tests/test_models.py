import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralrecon_w_tpu.config import get_cfg_defaults
from neuralrecon_w_tpu.models import (
    FieldConfig,
    apply_sdf,
    apply_wn_linear,
    field_background,
    field_config_from_cfg,
    field_forward,
    field_sdf,
    init_field,
    init_sdf,
    init_wn_linear,
    inv_s,
    pe_dim,
    positional_encoding,
    sdf_value,
    sdf_value_feat_grad,
    softplus_beta,
    wn_weight,
)

SDF_CFG = dict(
    d_in=3, d_out=257, d_hidden=256, n_layers=4, skip_in=(2,), multires=6,
    bias=0.5, scale=1, geometric_init=True, weight_norm=True, inside_outside=False,
)


def small_field_config():
    cfg = get_cfg_defaults()
    n = cfg.NEUCONW
    n.SDF_CONFIG.d_hidden = 128
    n.SDF_CONFIG.d_out = 129
    n.SDF_CONFIG.n_layers = 4
    n.SDF_CONFIG.skip_in = (2,)
    n.COLOR_CONFIG.d_feature = 128
    n.COLOR_CONFIG.d_hidden = 64
    n.COLOR_CONFIG.n_layers = 2
    n.N_VOCAB = 16
    n.S_CONFIG.init_val = 0.3
    return field_config_from_cfg(cfg)


def test_positional_encoding_layout():
    x = jnp.array([[0.5, -0.25, 1.0]])
    out = positional_encoding(x, 2)
    assert out.shape == (1, pe_dim(3, 2))
    np.testing.assert_allclose(out[0, :3], x[0], rtol=1e-6)
    np.testing.assert_allclose(out[0, 3:6], np.sin(np.array(x[0])), rtol=1e-6)
    np.testing.assert_allclose(out[0, 6:9], np.cos(np.array(x[0])), rtol=1e-6)
    np.testing.assert_allclose(out[0, 9:12], np.sin(2 * np.array(x[0])), rtol=1e-6)
    np.testing.assert_allclose(out[0, 12:15], np.cos(2 * np.array(x[0])), rtol=1e-6)


def test_softplus_beta():
    x = jnp.array([-1.0, 0.0, 0.05, 10.0])
    out = softplus_beta(x, 100.0)
    np.testing.assert_allclose(out[1], np.log(2) / 100, rtol=1e-5)
    np.testing.assert_allclose(out[3], 10.0, rtol=1e-6)  # linear regime
    assert out[0] >= 0


def test_softplus_beta_output_referenced_derivative():
    """The custom JVP (-expm1(-beta*y), an output-only residual) must
    match sigmoid(beta*x) through second order."""
    x = jnp.asarray(np.linspace(-0.3, 0.3, 4001), jnp.float32)

    def plain(v):
        return jnp.logaddexp(v * 100.0, 0.0) / 100.0

    d1 = jax.vmap(jax.grad(lambda v: softplus_beta(v, 100.0)))(x)
    d1p = jax.vmap(jax.grad(plain))(x)
    np.testing.assert_allclose(d1, d1p, atol=2e-6)
    d2 = jax.vmap(jax.grad(jax.grad(lambda v: softplus_beta(v, 100.0))))(x)
    d2p = jax.vmap(jax.grad(jax.grad(plain)))(x)
    np.testing.assert_allclose(d2, d2p, atol=2e-4)
    # saturated tail: the output-referenced form must not blow up
    xt = jnp.asarray([-50.0, 50.0], jnp.float32)
    dt = jax.vmap(jax.grad(lambda v: softplus_beta(v, 100.0)))(xt)
    np.testing.assert_allclose(dt, [0.0, 1.0], atol=1e-7)


def test_weight_norm_identity_at_init():
    p = init_wn_linear(jax.random.PRNGKey(0), 8, 16)
    w_eff = wn_weight(p)
    np.testing.assert_allclose(np.asarray(w_eff), np.asarray(p["v"]), rtol=1e-5)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    y = apply_wn_linear(p, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ p["v"] + p["b"]), rtol=1e-5)
    # both g and v receive gradients
    g = jax.grad(lambda pp: jnp.sum(apply_wn_linear(pp, x) ** 2))(p)
    assert np.abs(np.asarray(g["g"])).sum() > 0
    assert np.abs(np.asarray(g["v"])).sum() > 0


@pytest.mark.slow
def test_geometric_init_sphere():
    """With geometric init, sdf(x) ~ |x| - bias at initialization (exercised
    at the production 8x512 architecture)."""
    cfg = dict(SDF_CFG, d_out=513, d_hidden=512, n_layers=8, skip_in=(4,))
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    pts = np.random.RandomState(0).randn(256, 3).astype(np.float32) * 0.6
    sdf = np.asarray(sdf_value(params, cfg, jnp.asarray(pts)))
    expected = np.linalg.norm(pts, axis=-1) - 0.5
    corr = np.corrcoef(sdf, expected)[0, 1]
    assert corr > 0.95, f"geometric init not spherical: corr={corr}"
    assert np.abs(sdf - expected).mean() < 0.12


def test_geometric_init_inside_outside():
    cfg = dict(SDF_CFG, inside_outside=True)
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    pts = np.random.RandomState(0).randn(256, 3).astype(np.float32) * 0.6
    sdf = np.asarray(sdf_value(params, cfg, jnp.asarray(pts)))
    expected = 0.5 - np.linalg.norm(pts, axis=-1)
    assert np.corrcoef(sdf, expected)[0, 1] > 0.95


def test_sdf_grad_matches_autodiff_and_fd():
    params = init_sdf(jax.random.PRNGKey(1), SDF_CFG)
    x = jnp.asarray(np.random.RandomState(1).randn(16, 3).astype(np.float32) * 0.5)
    sdf, feat, grad = sdf_value_feat_grad(params, SDF_CFG, x)
    assert sdf.shape == (16,) and feat.shape == (16, 256) and grad.shape == (16, 3)
    # consistency with a plain forward
    out = apply_sdf(params, SDF_CFG, x)
    np.testing.assert_allclose(np.asarray(sdf), np.asarray(out[:, 0]), rtol=1e-5)
    # finite differences
    eps = 1e-3
    for axis in range(3):
        dx = jnp.zeros_like(x).at[:, axis].set(eps)
        fd = (sdf_value(params, SDF_CFG, x + dx) - sdf_value(params, SDF_CFG, x - dx)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(grad[:, axis]), np.asarray(fd), atol=2e-2)
    # near-unit gradient norm at geometric init
    gn = np.linalg.norm(np.asarray(grad), axis=-1)
    assert np.abs(gn - 1.0).mean() < 0.3


@pytest.mark.slow
def test_sdf_grad_is_differentiable():
    """Eikonal-style double backprop through the fused vjp."""
    params = init_sdf(jax.random.PRNGKey(2), SDF_CFG)
    x = jnp.asarray(np.random.RandomState(2).randn(8, 3).astype(np.float32) * 0.5)

    def eikonal(p):
        _, _, g = sdf_value_feat_grad(p, SDF_CFG, x)
        return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    grads = jax.grad(eikonal)(params)
    total = sum(float(jnp.abs(leaf).sum()) for leaf in jax.tree.leaves(grads))
    assert np.isfinite(total) and total > 0


@pytest.mark.slow
def test_field_forward_shapes_and_ranges():
    fc = small_field_config()
    params = init_field(jax.random.PRNGKey(0), fc)
    n = 32
    pts = jnp.asarray(np.random.RandomState(0).randn(n, 3).astype(np.float32) * 0.3)
    dirs = jnp.asarray(np.random.RandomState(1).randn(n, 3).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    a = params["embedding_a"][jnp.zeros((n,), jnp.int32)]
    rgb, s, sdf, grad = field_forward(params, fc, pts, dirs, a)
    assert rgb.shape == (n, 3) and sdf.shape == (n,) and grad.shape == (n, 3)
    assert float(rgb.min()) >= 0.0 and float(rgb.max()) <= 1.0
    np.testing.assert_allclose(float(s), np.exp(10 * 0.3), rtol=1e-5)
    np.testing.assert_allclose(float(inv_s(params)), np.exp(3.0), rtol=1e-5)


def test_field_background():
    fc = small_field_config()
    params = init_field(jax.random.PRNGKey(0), fc)
    n = 8
    pts4 = jnp.asarray(np.random.RandomState(0).rand(n, 4).astype(np.float32))
    dirs = jnp.ones((n, 3)) / np.sqrt(3)
    a = params["embedding_a"][jnp.zeros((n,), jnp.int32)]
    density, rgb = field_background(params, fc, pts4, dirs, a)
    assert density.shape == (n, 1) and rgb.shape == (n, 3)
    assert np.all(np.isfinite(np.asarray(density)))


def test_field_sdf_batched_shapes():
    fc = small_field_config()
    params = init_field(jax.random.PRNGKey(0), fc)
    pts = jnp.zeros((4, 5, 3))
    out = field_sdf(params, fc, pts)
    assert out.shape == (4, 5)


@pytest.mark.slow
def test_field_forward_per_ray_inputs_match_broadcast():
    """dirs / appearance are constant along a ray; the n_samples path
    computes their head contributions at ray granularity
    (models/color.py) and must match the broadcast-to-samples path to
    float rounding in both activation dtypes."""
    from neuralrecon_w_tpu.models.neuconw import field_forward

    for dtype, tol in (("float32", 1e-6), ("bfloat16", 5e-3)):
        cfg = get_cfg_defaults()
        n = cfg.NEUCONW
        n.SDF_CONFIG.d_hidden = 128
        n.SDF_CONFIG.d_out = 129
        n.SDF_CONFIG.n_layers = 4
        n.SDF_CONFIG.skip_in = (2,)
        n.COLOR_CONFIG.d_feature = 128
        n.COLOR_CONFIG.d_hidden = 64
        n.COLOR_CONFIG.n_layers = 2
        n.N_VOCAB = 16
        cfg.TPU.FIELD_DTYPE = dtype
        fc = field_config_from_cfg(cfg)
        params = init_field(jax.random.PRNGKey(0), fc)
        R, S = 12, 5
        rs = np.random.RandomState(0)
        pts = jnp.asarray(rs.randn(R * S, 3).astype(np.float32) * 0.3)
        d = rs.randn(R, 3).astype(np.float32)
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
        a = jnp.asarray(rs.randn(R, fc.n_a).astype(np.float32))
        d_full = jnp.broadcast_to(d[:, None, :], (R, S, 3)).reshape(-1, 3)
        a_full = jnp.broadcast_to(a[:, None, :], (R, S, fc.n_a)).reshape(-1, fc.n_a)

        rgb1, _, sdf1, g1 = field_forward(params, fc, pts, d_full, a_full)
        rgb2, _, sdf2, g2 = field_forward(params, fc, pts, d, a, n_samples=S)
        np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb2), atol=tol)
        np.testing.assert_allclose(np.asarray(sdf1), np.asarray(sdf2), atol=tol)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=tol)
