"""Fused background-NeRF custom VJP (ops/pallas_nerf_bg.py): primal and
all gradients (every layer's w/b, pts4, dirs, appearance) against
jax.grad through models.nerf_bg.apply_nerf_bg, interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.flatten_util import ravel_pytree

from neuralrecon_w_tpu.models.nerf_bg import apply_nerf_bg, init_nerf_bg
from neuralrecon_w_tpu.ops.pallas_nerf_bg import _make_bg_custom

N_A = 48


def _inputs(n=37, seed=1):
    rs = np.random.RandomState(seed)
    xyz = rs.randn(n, 3).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    inv_r = rs.uniform(0.05, 1.0, (n, 1)).astype(np.float32)
    pts4 = jnp.asarray(np.concatenate([xyz, inv_r], axis=-1))
    d0 = rs.randn(n, 3).astype(np.float32)
    dirs = jnp.asarray(d0 / np.linalg.norm(d0, axis=-1, keepdims=True))
    a = jnp.asarray(rs.randn(n, N_A).astype(np.float32)) * 0.3
    c_den = jnp.asarray(rs.randn(n, 1).astype(np.float32))
    c_rgb = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    return pts4, dirs, a, c_den, c_rgb


@pytest.mark.slow
@pytest.mark.parametrize("encode_a", [True, False])
def test_bg_kernel_primal_and_grads(encode_a):
    params = init_nerf_bg(jax.random.PRNGKey(0), encode_a, N_A)
    pts4, dirs, a, c_den, c_rgb = _inputs()
    a_in = a if encode_a else None

    f = _make_bg_custom(encode_a, N_A if encode_a else 0, "float32", 16,
                        True)

    d0, r0 = apply_nerf_bg(params, encode_a, pts4, dirs, a_in)
    d1, r1 = f(params, pts4, dirs, a_in)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=2e-5)

    def loss_of(fn):
        def g(params, pts4, dirs, a):
            den, rgb = fn(params, encode_a, pts4, dirs, a) \
                if fn is apply_nerf_bg else fn(params, pts4, dirs, a)
            return jnp.sum(den * c_den) + jnp.sum(rgb * c_rgb)
        return g

    args = (0, 1, 2, 3) if encode_a else (0, 1, 2)
    gr = jax.grad(loss_of(apply_nerf_bg), argnums=args)(
        params, pts4, dirs, a_in)
    gp = jax.grad(loss_of(f), argnums=args)(params, pts4, dirs, a_in)
    fr, _ = ravel_pytree(gr)
    fp, _ = ravel_pytree(gp)
    rel = float(jnp.linalg.norm(fp - fr) / jnp.linalg.norm(fr))
    assert rel < 1e-5, rel


def test_bg_kernel_through_field_background():
    """field_background(bg_mode='pallas') parity against the XLA path."""
    from neuralrecon_w_tpu.config import get_cfg_defaults
    from neuralrecon_w_tpu.models import field_config_from_cfg, init_field
    from neuralrecon_w_tpu.models.neuconw import field_background
    import neuralrecon_w_tpu.ops.pallas_nerf_bg as B

    cfg = get_cfg_defaults()
    cfg.NEUCONW.N_VOCAB = 8
    fc = field_config_from_cfg(cfg)
    params = init_field(jax.random.PRNGKey(0), fc)
    # one padded tile of 16: exercises padding at minimum interpret cost
    pts4, dirs, a, _, _ = _inputs(9, seed=3)

    d0, r0 = field_background(params, fc, pts4, dirs, a)
    orig = B._make_bg_custom

    def interp(encode_a, n_a, act_dtype, tile, interpret):
        return orig(encode_a, n_a, act_dtype, 16, True)

    B._make_bg_custom = interp
    try:
        d1, r1 = field_background(params, fc._replace(bg_mode="pallas"),
                                  pts4, dirs, a)
    finally:
        B._make_bg_custom = orig
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=2e-5)
