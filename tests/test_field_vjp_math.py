"""Hand-derived field VJP (ops/field_vjp_math.py) vs the jax.grad oracle.

The loss contracts BOTH outputs of (out, grad) = forward(x) with random
cotangents, so every term of the second-order backward is exercised."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralrecon_w_tpu.ops.field_vjp_math import (
    backward,
    forward_with_residuals,
)


def make_net(L=5, d_hidden=48, d_out=16, skip=(2,), multires=4, seed=0):
    rs = np.random.RandomState(seed)
    pe_w = 3 * (1 + 2 * multires)
    dims = [pe_w] + [d_hidden] * (L - 1) + [d_out]
    weights, biases = [], []
    for l in range(L):
        # reference convention: the pre-skip layer shrinks its output so
        # concat(h, pe) is exactly dims[l] wide at the skip layer
        d_in = dims[l]
        d_o = dims[l + 1] - (pe_w if (l + 1) in skip else 0)
        weights.append(jnp.asarray(rs.randn(d_in, d_o).astype(np.float32) * 0.3))
        biases.append(jnp.asarray(rs.randn(d_o).astype(np.float32) * 0.1))
    return weights, biases


def oracle(weights, biases, skip, multires, scale, x, c_out, c_grad):
    """jax.grad of the identically-structured forward."""

    def fwd(ws, bs, xx):
        res = forward_with_residuals(ws, bs, skip, multires, scale, xx)
        return res["out"], res["grad"]

    def loss(ws, bs, xx):
        out, grad = fwd(ws, bs, xx)
        return jnp.sum(out * c_out) + jnp.sum(grad * c_grad)

    return jax.grad(loss, argnums=(0, 1, 2))(weights, biases, x)


@pytest.mark.parametrize("skip", [(2,), ()])
def test_hand_vjp_matches_jax_grad(skip):
    multires, scale = 4, 1.5
    weights, biases = make_net(skip=skip, multires=multires)
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(12, 3).astype(np.float32) * 0.5)
    c_out = jnp.asarray(rs.randn(12, 16).astype(np.float32))
    c_grad = jnp.asarray(rs.randn(12, 3).astype(np.float32))

    # jit each stage: one whole-graph compile per stage beats eager
    # per-op compilation on the CPU test backend
    res = jax.jit(lambda w, b, p: forward_with_residuals(
        w, b, skip, multires, scale, p))(weights, biases, x)
    dWs, dbs, dx = jax.jit(lambda w, b, r, co, cg: backward(
        w, b, skip, multires, scale, r, co, cg))(
            weights, biases, res, c_out, c_grad)
    oW, ob, ox = jax.jit(lambda w, b, p, co, cg: oracle(
        w, b, skip, multires, scale, p, co, cg))(
            weights, biases, x, c_out, c_grad)

    np.testing.assert_allclose(np.asarray(dx), np.asarray(ox),
                               rtol=1e-4, atol=1e-4)
    for l, (a, b) in enumerate(zip(dWs, oW)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"dW mismatch at layer {l}")
    for l, (a, b) in enumerate(zip(dbs, ob)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"db mismatch at layer {l}")


def test_forward_matches_reference_sdf():
    """forward_with_residuals equals models.sdf's apply + vjp grad when
    fed the same effective weights."""
    from neuralrecon_w_tpu.models.sdf import (
        init_sdf, sdf_value_feat_grad, _layer_weight,
    )

    cfg = dict(d_in=3, d_out=33, d_hidden=48, n_layers=4, skip_in=(2,),
               multires=4, bias=0.5, scale=1.5, geometric_init=True,
               weight_norm=True, inside_outside=False)
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    weights = [_layer_weight(params[f"lin{l}"]) for l in range(5)]
    biases = [params[f"lin{l}"]["b"] for l in range(5)]

    x = jnp.asarray(np.random.RandomState(2).randn(10, 3).astype(np.float32) * 0.4)
    res = jax.jit(lambda w, b, p: forward_with_residuals(
        w, b, (2,), 4, 1.5, p))(weights, biases, x)
    sdf_ref, feat_ref, grad_ref = jax.jit(
        lambda p, xx: sdf_value_feat_grad(p, cfg, xx))(params, x)
    np.testing.assert_allclose(np.asarray(res["out"][:, 0] / 1.5),
                               np.asarray(sdf_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res["grad"]),
                               np.asarray(grad_ref), atol=1e-4)


def test_color_backward_matches_jax_grad():
    from neuralrecon_w_tpu.ops.field_vjp_math import (
        color_backward, color_forward_with_residuals,
    )

    rs = np.random.RandomState(3)
    d_feat, head, d_hidden, n_a, mrv = 24, 16, 20, 8, 4
    pev_w = 3 * (1 + 2 * mrv)

    def mk(i, o):
        return (jnp.asarray(rs.randn(i, o).astype(np.float32) * 0.3),
                jnp.asarray(rs.randn(o).astype(np.float32) * 0.1))

    cw = {
        "xyz_final": mk(d_feat, d_feat),
        "static0": mk(d_feat + pev_w + n_a, head),
        "static1": mk(head, head),
        "lin0": mk(6 + head, d_hidden),
        "lin1": mk(d_hidden, d_hidden),
        "lin2": mk(d_hidden, 3),
    }
    n = 10
    pts = jnp.asarray(rs.randn(n, 3).astype(np.float32) * 0.4)
    grad = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    dirs = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    feat = jnp.asarray(rs.randn(n, d_feat).astype(np.float32))
    a = jnp.asarray(rs.randn(n, n_a).astype(np.float32))
    c_rgb = jnp.asarray(rs.randn(n, 3).astype(np.float32))

    def loss(cw_, pts_, grad_, dirs_, feat_, a_):
        r = color_forward_with_residuals(cw_, pts_, grad_, dirs_, feat_, a_, mrv)
        return jnp.sum(r["rgb"] * c_rgb)

    o = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(cw, pts, grad, dirs, feat, a)
    res = color_forward_with_residuals(cw, pts, grad, dirs, feat, a, mrv)
    d_cw, d_pts, d_grad, d_dirs, d_feat_, d_a = color_backward(
        cw, res, pts, grad, dirs, feat, a, mrv, c_rgb
    )
    for k in cw:
        np.testing.assert_allclose(np.asarray(d_cw[k][0]), np.asarray(o[0][k][0]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)
        np.testing.assert_allclose(np.asarray(d_cw[k][1]), np.asarray(o[0][k][1]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)
    for got, exp, name in [(d_pts, o[1], "pts"), (d_grad, o[2], "grad"),
                           (d_dirs, o[3], "dirs"), (d_feat_, o[4], "feat"),
                           (d_a, o[5], "a")]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


@pytest.mark.slow
def test_full_field_vjp_matches_jax_grad():
    """The combined (color + SDF + second-order) hand VJP against
    jax.grad with cotangents on all three outputs."""
    from neuralrecon_w_tpu.ops.field_vjp_math import (
        field_forward_with_residuals, field_vjp,
    )

    skip, multires, mrv, scale = (2,), 4, 4, 1.3
    weights, biases = make_net(skip=skip, multires=multires, d_out=17)
    d_feat, head, n_a = 16, 12, 8
    pev_w = 3 * (1 + 2 * mrv)
    rs = np.random.RandomState(5)

    def mk(i, o):
        return (jnp.asarray(rs.randn(i, o).astype(np.float32) * 0.3),
                jnp.asarray(rs.randn(o).astype(np.float32) * 0.1))

    cw = {
        "xyz_final": mk(d_feat, d_feat),
        "static0": mk(d_feat + pev_w + n_a, head),
        "static1": mk(head, head),
        "lin0": mk(6 + head, 20),
        "lin1": mk(20, 3),
    }
    n = 9
    pts = jnp.asarray(rs.randn(n, 3).astype(np.float32) * 0.4)
    dirs = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    a = jnp.asarray(rs.randn(n, n_a).astype(np.float32))
    c_rgb = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    c_sdf = jnp.asarray(rs.randn(n).astype(np.float32))
    c_grad = jnp.asarray(rs.randn(n, 3).astype(np.float32))

    def loss(ws, bs, cw_, p, d, a_):
        r = field_forward_with_residuals(ws, bs, cw_, skip, multires, mrv,
                                         scale, p, d, a_)
        return (jnp.sum(r["rgb"] * c_rgb) + jnp.sum(r["sdf"] * c_sdf)
                + jnp.sum(r["grad"] * c_grad))

    o = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(
        weights, biases, cw, pts, dirs, a
    )
    res = field_forward_with_residuals(weights, biases, cw, skip, multires,
                                       mrv, scale, pts, dirs, a)
    dWs, dbs, d_cw, d_pts, d_dirs, d_a = field_vjp(
        weights, biases, cw, skip, multires, mrv, scale, pts, dirs, a, res,
        c_rgb, c_sdf, c_grad,
    )
    for l in range(len(weights)):
        np.testing.assert_allclose(np.asarray(dWs[l]), np.asarray(o[0][l]),
                                   rtol=2e-4, atol=2e-4, err_msg=f"W{l}")
        np.testing.assert_allclose(np.asarray(dbs[l]), np.asarray(o[1][l]),
                                   rtol=2e-4, atol=2e-4, err_msg=f"b{l}")
    for k in cw:
        np.testing.assert_allclose(np.asarray(d_cw[k][0]), np.asarray(o[2][k][0]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)
    np.testing.assert_allclose(np.asarray(d_pts), np.asarray(o[3]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(d_dirs), np.asarray(o[4]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(o[5]),
                               rtol=2e-4, atol=2e-4)
