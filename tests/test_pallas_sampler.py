"""Fused importance-sampler kernel: interpret-mode parity with the jnp
sampler stage (sampling.py) at both tiny and production architectures."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralrecon_w_tpu.models import field_sdf
from neuralrecon_w_tpu.models.sdf import init_sdf
from neuralrecon_w_tpu.ops.pallas_sampler import fused_importance_sampler
from neuralrecon_w_tpu.rendering.sampling import cat_z_vals, up_sample


@pytest.mark.parametrize("layout", ["rows", "lanes"])
@pytest.mark.parametrize("d_hidden,d_out,n_layers,skip", [
    pytest.param(256, 257, 8, (4,), marks=pytest.mark.slow),
    (64, 65, 4, (2,)),
])
def test_fused_sampler_matches_jnp(d_hidden, d_out, n_layers, skip, layout):
    cfg = dict(d_in=3, d_out=d_out, d_hidden=d_hidden, n_layers=n_layers,
               skip_in=skip, multires=6, bias=0.5, scale=1,
               geometric_init=True, weight_norm=True, inside_outside=False)
    params_sdf = init_sdf(jax.random.PRNGKey(0), cfg)
    items = tuple(sorted(cfg.items()))

    class FC:
        sdf = items
        sdf_cfg = dict(items)
        act_dtype = "float32"

    params = {"neuconw": {"sdf": params_sdf}}
    # 16 rays keep the parity meaningful; the interpret-mode kernel and
    # the eager jnp reference both scale with R on the CPU test backend
    R, n0, n_imp, steps, s_base = 16, 8, 16, 2, 3
    rs = np.random.RandomState(0)
    o = (rs.randn(R, 3) * 0.1 + [0, 0, 0.9]).astype(np.float32)
    d = -o + rs.randn(R, 3).astype(np.float32) * 0.05
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    z = np.sort(rs.rand(R, n0).astype(np.float32) * 1.5 + 0.05, axis=-1)

    def jnp_importance(o, d, z_vals):
        sdf_fn = lambda pts: field_sdf(params, FC, pts)
        pts = o[:, None, :] + d[:, None, :] * z_vals[..., None]
        sdf = sdf_fn(pts)
        for i in range(steps):
            new_z = up_sample(o, d, z_vals, sdf, n_imp // steps,
                              64.0 * 2 ** (s_base + i))
            z_vals, sdf = cat_z_vals(sdf_fn, o, d, z_vals, new_z, sdf,
                                     last=(i + 1 == steps))
        return z_vals

    ref = np.asarray(jax.jit(jnp_importance)(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(z)))
    out = np.asarray(fused_importance_sampler(
        params_sdf, items, jnp.asarray(o), jnp.asarray(d), jnp.asarray(z),
        n_imp, steps, s_base, tile=16, interpret=True, layout=layout,
    ))
    assert out.shape == (R, n0 + n_imp)
    np.testing.assert_allclose(out, ref, atol=1e-4)
    # output must be row-sorted
    assert np.all(np.diff(out, axis=-1) >= -1e-6)
