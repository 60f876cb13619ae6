"""Fully-fused field (SDF + color) custom VJP
(ops/pallas_field_train.py): primal and all seven gradients (SDF
weights/biases, color weights/biases, pts, dirs, appearance) against
jax.grad through the verified plain-jnp field math
(ops/field_vjp_math.py), interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.flatten_util import ravel_pytree

from neuralrecon_w_tpu.ops import field_vjp_math as M
from neuralrecon_w_tpu.ops.pallas_field_train import _make_field_custom

SKIP = (2,)
MULTIRES = 6
MULTIRES_VIEW = 4
SCALE = 1.3
N_A = 16
NAMES = ["xyz_final", "static0", "static1", "lin0", "lin1", "lin2"]


@pytest.fixture(scope="module")
def setup():
    rs = np.random.RandomState(0)
    d_hidden, d_out = 64, 65
    d_pe = 3 * (1 + 2 * MULTIRES)
    dims = (d_pe, d_hidden, d_hidden, d_hidden, d_out)

    def mk(sh, s=0.2):
        return jnp.asarray(rs.randn(*sh).astype(np.float32)) * s

    sdf_w = (mk((d_pe, d_hidden)), mk((d_hidden, d_hidden - d_pe)),
             mk((d_hidden, d_hidden)), mk((d_hidden, d_out)))
    sdf_b = tuple(mk((w.shape[1],), 0.05) for w in sdf_w)

    d_feat = d_out - 1
    pev_w = 3 * (1 + 2 * MULTIRES_VIEW)
    head, d_ch = 32, 48
    cw = {
        "xyz_final": (mk((d_feat, d_feat)), mk((d_feat,), 0.05)),
        "static0": (mk((d_feat + pev_w + N_A, head)), mk((head,), 0.05)),
        "static1": (mk((head, head)), mk((head,), 0.05)),
        "lin0": (mk((3 + 3 + head, d_ch)), mk((d_ch,), 0.05)),
        "lin1": (mk((d_ch, d_ch)), mk((d_ch,), 0.05)),
        "lin2": (mk((d_ch, 3)), mk((3,), 0.05)),
    }
    meta = tuple((nm, cw[nm][0].shape[0], cw[nm][0].shape[1])
                 for nm in NAMES)
    col_w = tuple(cw[nm][0] for nm in NAMES)
    col_b = tuple(cw[nm][1] for nm in NAMES)

    # 2 tiles of 8 exercise the tile loop; more points only pay
    # interpret-mode overhead on the CPU test backend
    n = 16
    pts = mk((n, 3), 0.4)
    dirs0 = rs.randn(n, 3).astype(np.float32)
    dirs = jnp.asarray(dirs0 / np.linalg.norm(dirs0, axis=-1, keepdims=True))
    a = mk((n, N_A), 0.3)
    cots = (mk((n, 3), 1.0), mk((n,), 1.0), mk((n, 3), 1.0))
    return dims, sdf_w, sdf_b, col_w, col_b, meta, pts, dirs, a, cots


def _ref_field(sdf_w, sdf_b, col_w, col_b, pts, dirs, a):
    sres = M.forward_with_residuals(sdf_w, sdf_b, SKIP, MULTIRES,
                                    np.float32(SCALE), pts)
    sdf = sres["out"][:, 0] / SCALE
    feat = sres["out"][:, 1:]
    cwd = {nm: (w, b) for nm, w, b in zip(NAMES, col_w, col_b)}
    cres = M.color_forward_with_residuals(cwd, pts, sres["grad"], dirs,
                                          feat, a, MULTIRES_VIEW)
    return cres["rgb"], sdf, sres["grad"]


@pytest.mark.slow
def test_field_train_primal_and_grads(setup):
    dims, sdf_w, sdf_b, col_w, col_b, meta, pts, dirs, a, cots = setup
    c_rgb, c_sdf, c_grad = cots
    cfg_static = (dims, SKIP, MULTIRES, SCALE, "float32", meta,
                  MULTIRES_VIEW, N_A)
    fk = _make_field_custom(cfg_static, 16, True, 2)

    r_ref = _ref_field(sdf_w, sdf_b, col_w, col_b, pts, dirs, a)
    r_pal = fk(sdf_w, sdf_b, col_w, col_b, pts, dirs, a)
    for x, y in zip(r_ref, r_pal):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def loss_of(fn):
        def g(*args):
            rgb, sdf, grad = fn(*args)
            return (jnp.sum(rgb * c_rgb) + jnp.sum(sdf * c_sdf)
                    + jnp.sum(grad * c_grad))
        return g

    arg7 = tuple(range(7))
    gr = jax.grad(loss_of(_ref_field), argnums=arg7)(
        sdf_w, sdf_b, col_w, col_b, pts, dirs, a)
    gp = jax.grad(loss_of(fk), argnums=arg7)(
        sdf_w, sdf_b, col_w, col_b, pts, dirs, a)
    fr, _ = ravel_pytree(gr)
    fp, _ = ravel_pytree(gp)
    rel = float(jnp.linalg.norm(fp - fr) / jnp.linalg.norm(fr))
    assert rel < 1e-5, rel


def test_field_train_single_group(setup):
    """n_groups=1 (all SDF dW + color dW in one call) matches too."""
    dims, sdf_w, sdf_b, col_w, col_b, meta, pts, dirs, a, cots = setup
    c_rgb, c_sdf, c_grad = cots
    cfg_static = (dims, SKIP, MULTIRES, SCALE, "float32", meta,
                  MULTIRES_VIEW, N_A)
    f1 = _make_field_custom(cfg_static, 8, True, 1)

    def loss(*args):
        rgb, sdf, grad = f1(*args)
        return (jnp.sum(rgb * c_rgb) + jnp.sum(sdf * c_sdf)
                + jnp.sum(grad * c_grad))

    gp = jax.jit(jax.grad(loss, argnums=(0, 2, 4)))(
        sdf_w, sdf_b, col_w, col_b, pts, dirs, a)

    def ref_loss(*args):
        rgb, sdf, grad = _ref_field(*args)
        return (jnp.sum(rgb * c_rgb) + jnp.sum(sdf * c_sdf)
                + jnp.sum(grad * c_grad))

    gr = jax.jit(jax.grad(ref_loss, argnums=(0, 2, 4)))(
        sdf_w, sdf_b, col_w, col_b, pts, dirs, a)
    fr, _ = ravel_pytree(gr)
    fp, _ = ravel_pytree(gp)
    assert float(jnp.linalg.norm(fp - fr) / jnp.linalg.norm(fr)) < 1e-5


@pytest.mark.slow
def test_field_train_through_params(setup):
    """field_forward(grad_mode='pallas_field') primal parity against the
    default XLA path, through real weight-normed params."""
    from neuralrecon_w_tpu.models import field_config_from_cfg, init_field
    from neuralrecon_w_tpu.models.neuconw import field_forward
    from neuralrecon_w_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    n = cfg.NEUCONW
    n.SDF_CONFIG.d_hidden = 64
    n.SDF_CONFIG.d_out = 65
    n.SDF_CONFIG.n_layers = 4
    n.SDF_CONFIG.skip_in = (2,)
    n.COLOR_CONFIG.d_feature = 64
    n.COLOR_CONFIG.d_hidden = 48
    n.COLOR_CONFIG.head_channels = 32
    n.N_VOCAB = 8
    fc = field_config_from_cfg(cfg)
    params = init_field(jax.random.PRNGKey(0), fc)

    rs = np.random.RandomState(1)
    pts = jnp.asarray(rs.randn(30, 3).astype(np.float32)) * 0.4
    d0 = rs.randn(30, 3).astype(np.float32)
    dirs = jnp.asarray(d0 / np.linalg.norm(d0, axis=-1, keepdims=True))
    a = jnp.asarray(rs.randn(30, fc.n_a).astype(np.float32)) * 0.3

    rgb0, s0, sdf0, grad0 = field_forward(params, fc, pts, dirs, a)
    fc_p = fc._replace(grad_mode="pallas_field")
    import neuralrecon_w_tpu.ops.pallas_field_train as T
    orig = T._make_field_custom

    def interp(cfg_static, tile, interpret, n_groups):
        return orig(cfg_static, tile, True, n_groups)

    T._make_field_custom = interp
    try:
        rgb1, s1, sdf1, grad1 = field_forward(params, fc_p, pts, dirs, a)
    finally:
        T._make_field_custom = orig
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sdf1), np.asarray(sdf0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(grad1), np.asarray(grad0),
                               atol=2e-4)
