"""Fused SDF custom-VJP kernels (ops/pallas_field_vjp.py): primals and
full parameter/input gradients vs the reference jax.vjp path, interpret
mode (compiled behavior exercised on TPU by the benchmarks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralrecon_w_tpu.models.sdf import init_sdf, sdf_value_feat_grad
from neuralrecon_w_tpu.ops.pallas_field_vjp import sdf_value_feat_grad_pallas

CFG = dict(d_in=3, d_out=129, d_hidden=128, n_layers=4, skip_in=(2,),
           multires=6, bias=0.5, scale=1.3, geometric_init=True,
           weight_norm=True, inside_outside=False)


@pytest.fixture(scope="module")
def setup():
    params = init_sdf(jax.random.PRNGKey(0), CFG)
    rs = np.random.RandomState(0)
    # 2 tiles of 16 (one padded) exercise the tile loop + padding; more
    # points only pay interpret-mode overhead on the CPU test backend
    x = jnp.asarray(rs.randn(24, 3).astype(np.float32) * 0.5)
    cots = (jnp.asarray(rs.randn(24).astype(np.float32)),
            jnp.asarray(rs.randn(24, 128).astype(np.float32)),
            jnp.asarray(rs.randn(24, 3).astype(np.float32)))
    return params, x, cots


def test_primals_match(setup):
    params, x, _ = setup
    s1, f1, g1 = sdf_value_feat_grad(params, CFG, x)
    s2, f2, g2 = sdf_value_feat_grad_pallas(params, CFG, x, tile=16,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-5)


@pytest.mark.slow
def test_full_gradients_match(setup):
    params, x, (c_sdf, c_feat, c_grad) = setup

    def loss(fn):
        def inner(p, xx):
            s, f, g = fn(p, xx)
            return (jnp.sum(s * c_sdf) + jnp.sum(f * c_feat)
                    + jnp.sum(g * c_grad))
        return inner

    ref_fn = loss(lambda p, xx: sdf_value_feat_grad(p, CFG, xx))
    pal_fn = loss(lambda p, xx: sdf_value_feat_grad_pallas(
        p, CFG, xx, tile=16, interpret=True))

    gr = jax.grad(ref_fn, argnums=(0, 1))(params, x)
    gp = jax.grad(pal_fn, argnums=(0, 1))(params, x)

    def chk(a, b):
        d = float(jnp.abs(a - b).max())
        m = float(jnp.abs(a).max())
        assert d < 2e-4 * max(m, 1.0), (d, m)

    jax.tree.map(chk, gr[0], gp[0])
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               atol=2e-4)


@pytest.mark.slow
def test_padding_batch_sizes(setup):
    """Non-tile-multiple point counts pad correctly and the dW
    accumulation over multiple grid steps stays exact."""
    params, _, _ = setup
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(23, 3).astype(np.float32) * 0.4)
    s1, f1, g1 = sdf_value_feat_grad(params, CFG, x)
    s2, f2, g2 = sdf_value_feat_grad_pallas(params, CFG, x, tile=8,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-5)

    def loss_pal(p):
        s, f, g = sdf_value_feat_grad_pallas(p, CFG, x, tile=8, interpret=True)
        return jnp.sum(s) + jnp.sum(g)

    def loss_ref(p):
        s, f, g = sdf_value_feat_grad(p, CFG, x)
        return jnp.sum(s) + jnp.sum(g)

    gp = jax.grad(loss_pal)(params)
    gr = jax.grad(loss_ref)(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        ),
        gr, gp,
    )


@pytest.mark.slow
def test_split_dw_deep_net():
    """The backward emits dW across two pallas_call's (VMEM cannot hold
    all accumulators at once); verify the layer-split path end-to-end on
    a deep net where both groups are non-trivial (8 layers -> 4+4)."""
    cfg = dict(d_in=3, d_out=65, d_hidden=64, n_layers=8, skip_in=(4,),
               multires=6, bias=0.5, scale=1.3, geometric_init=True,
               weight_norm=True, inside_outside=False)
    params = init_sdf(jax.random.PRNGKey(3), cfg)
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(48, 3).astype(np.float32) * 0.4)
    c = (jnp.asarray(rs.randn(48).astype(np.float32)),
         jnp.asarray(rs.randn(48, 64).astype(np.float32)),
         jnp.asarray(rs.randn(48, 3).astype(np.float32)))

    def loss(fn):
        def inner(p, xx):
            s, f, g = fn(p, xx)
            return jnp.sum(s * c[0]) + jnp.sum(f * c[1]) + jnp.sum(g * c[2])
        return inner

    gr = jax.grad(loss(lambda p, xx: sdf_value_feat_grad(p, cfg, xx)),
                  argnums=(0, 1))(params, x)
    gp = jax.grad(loss(lambda p, xx: sdf_value_feat_grad_pallas(
        p, cfg, xx, tile=16, interpret=True)), argnums=(0, 1))(params, x)

    def chk(a, b):
        d = float(jnp.abs(a - b).max())
        m = float(jnp.abs(a).max())
        assert d < 3e-4 * max(m, 1.0), (d, m)

    jax.tree.map(chk, gr[0], gp[0])
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               atol=3e-4)
