"""Hand-derived VJP of the fused SDF forward + input gradient.

The round-2 fused training kernel needs a custom backward; second-order
backprop inside Pallas is error-prone to derive in place, so the math
lives here as plain jnp structured exactly like the kernel (explicit
layer loops, no jax.grad anywhere), validated against jax.grad of the
reference path (tests/test_field_vjp_math.py), then transplanted.

Notation (L layers, weights W_l of shape (d_in_l, d_out_l)):

forward F:
    pe = PE(x*s);  u_0 = pe
    l in skip:  u_l = concat(h_l, pe) * c          (c = 1/sqrt2)
    z_l = u_l @ W_l + b_l;   h_{l+1} = sp(z_l)  (l < L-1)
    out = z_{L-1};  sdf = out_0 / s

input-gradient G (reverse sweep):
    d_{L-1} = E = ones on col 0
    r_l = d_l @ W_l^T
    l in skip: split r_l -> h-part a_l * c, pe-part adds to g_pe * c
    d_{l-1} = a_l * sp'(z_{l-1})
    g_pe += r_0;   grad = Jpe(xs)^T g_pe    (the two `s` scales cancel)

Given cotangents c_out (on out) and c_grad (on grad), the backward is:
  (1) adjoint of G, run bottom-up: produces dW contributions
      (r_hat^T d_l), and second-order z-cotangents
      z2_l = dhat_l * a_{l+1} * sp''(z_l);
  (2) standard top-down backward of F with gamma_{L-1} = c_out and the
      z2_l injected at each layer;
  (3) PE terms: Jpe applications for both passes plus the
      Jpe-entry x-dependence (second derivatives of sin/cos).
Weight-norm (v, g) chain rule is applied by the caller on the effective
weights' cotangents (first-order, cheap, stays in XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _sp(z):
    # exact logaddexp(zb, 0)/beta — bit-matches models.layers.softplus_beta
    # (the earlier clamped form differed by ~1.5e-6, which the sharp
    # beta=100 layers amplify ~250x per layer at geometric init)
    zb = z * 100.0
    return (jnp.maximum(zb, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(zb)))) / 100.0


def _sp1(z):
    return jax.nn.sigmoid(z * 100.0)


def _sp2(z):
    sg = jax.nn.sigmoid(z * 100.0)
    return 100.0 * sg * (1.0 - sg)


def _pe(xs, multires):
    feats = [xs]
    for i in range(multires):
        feats.append(jnp.sin((2.0**i) * xs))
        feats.append(jnp.cos((2.0**i) * xs))
    return jnp.concatenate(feats, axis=-1)


def _pe_jac_T(xs, multires, g_pe):
    """Jpe(xs)^T g_pe -> (N, 3): contract a pe-width cotangent to xs."""
    out = g_pe[:, :3]
    for i in range(multires):
        f = np.float32(2.0**i)
        s_off = 3 + 6 * i
        c_off = 6 + 6 * i
        out = out + g_pe[:, s_off : s_off + 3] * f * jnp.cos(f * xs)
        out = out - g_pe[:, c_off : c_off + 3] * f * jnp.sin(f * xs)
    return out


def _pe_jac(xs, multires, t):
    """Jpe(xs) t -> (N, pe): push an xs tangent through the PE jacobian."""
    parts = [t]
    for i in range(multires):
        f = np.float32(2.0**i)
        parts.append(t * f * jnp.cos(f * xs))
        parts.append(-t * f * jnp.sin(f * xs))
    return jnp.concatenate(parts, axis=-1)


def _pe_jac_x_cot(xs, multires, g_pe, c_grad):
    """x-cotangent from grad = Jpe(xs)^T g_pe's own xs dependence."""
    dxs = jnp.zeros_like(xs)
    for i in range(multires):
        f = np.float32(2.0**i)
        s_off = 3 + 6 * i
        c_off = 6 + 6 * i
        dxs = dxs - g_pe[:, s_off : s_off + 3] * (f * f) * jnp.sin(f * xs) * c_grad
        dxs = dxs - g_pe[:, c_off : c_off + 3] * (f * f) * jnp.cos(f * xs) * c_grad
    return dxs


def forward_with_residuals(weights, biases, skip, multires, scale, x):
    """Forward + reverse sweep, keeping everything the backward needs."""
    L = len(weights)
    c = np.float32(1.0 / np.sqrt(2))
    xs = x * scale
    pe = _pe(xs, multires)

    us, zs = [], []
    h = pe
    for l in range(L):
        u = jnp.concatenate([h, pe], axis=-1) * c if l in skip else h
        us.append(u)
        z = u @ weights[l] + biases[l]
        zs.append(z)
        if l < L - 1:
            h = _sp(z)
    out = zs[-1]

    deltas = [None] * L
    a_parts = [None] * L  # a_l: the h-part of r_l after split/scale
    deltas[L - 1] = jnp.zeros_like(out).at[:, 0].set(1.0)
    g_pe = jnp.zeros_like(pe)
    pe_w = pe.shape[-1]
    for l in range(L - 1, -1, -1):
        r = deltas[l] @ weights[l].T
        if l in skip:
            g_pe = g_pe + r[:, -pe_w:] * c
            a = r[:, :-pe_w] * c
        else:
            a = r
        a_parts[l] = a
        if l > 0:
            deltas[l - 1] = a * _sp1(zs[l - 1])
        else:
            g_pe = g_pe + a
    grad = _pe_jac_T(xs, multires, g_pe)
    return dict(xs=xs, pe=pe, us=us, zs=zs, out=out, deltas=deltas,
                a_parts=a_parts, g_pe=g_pe, grad=grad)


def backward(weights, biases, skip, multires, scale, res, c_out, c_grad):
    """Returns (dWs, dbs, dx) for cotangents on (out, grad)."""
    L = len(weights)
    c = np.float32(1.0 / np.sqrt(2))
    xs, pe = res["xs"], res["pe"]
    us, zs, deltas, a_parts = res["us"], res["zs"], res["deltas"], res["a_parts"]
    pe_w = pe.shape[-1]

    dWs = [jnp.zeros_like(w) for w in weights]
    dbs = [jnp.zeros_like(b) for b in biases]

    # ---------- adjoint of G (bottom-up) ----------
    # grad = Jpe^T g_pe: cotangent on g_pe and the Jpe x-dependence term
    ghat_pe = _pe_jac(xs, multires, c_grad)  # cot on g_pe
    dxs = _pe_jac_x_cot(xs, multires, res["g_pe"], c_grad)

    z2 = [jnp.zeros_like(z) for z in zs]  # second-order cotangents on z_l
    # l = 0: g_pe += a_0 (layer 0 never in skip => a_0 = r_0)
    a_hat = ghat_pe
    for l in range(0, L):
        if l == 0:
            r_hat = a_hat  # g_pe += a_0 directly (layer 0 never in skip)
        else:
            # a_hat currently holds dhat_{l-1}, the cotangent on d_{l-1};
            # d_{l-1} = a_l * sp1(z_{l-1})
            dhat = a_hat
            a_l_hat = dhat * _sp1(zs[l - 1])
            z2[l - 1] = z2[l - 1] + dhat * a_parts[l] * _sp2(zs[l - 1])
            if l in skip:
                # r_l split into (h-part * c -> a_l, pe-part * c -> g_pe)
                r_hat = jnp.concatenate([a_l_hat * c, ghat_pe * c], axis=-1)
            else:
                r_hat = a_l_hat
        # r_l = d_l @ W_l^T : dW picks up the outer product, d_l a push
        dWs[l] = dWs[l] + jnp.einsum("ni,no->io", r_hat, deltas[l])
        a_hat = r_hat @ weights[l]  # cotangent on d_l, consumed next iter
    # d_{L-1} is the constant seed; its cotangent is dropped

    # ---------- backward of F (top-down) with z2 injections ----------
    gamma = c_out
    pe_hat = jnp.zeros_like(pe)
    for l in range(L - 1, -1, -1):
        g_tot = gamma + z2[l]
        dWs[l] = dWs[l] + us[l].T @ g_tot
        dbs[l] = dbs[l] + jnp.sum(g_tot, axis=0)
        beta = g_tot @ weights[l].T
        if l in skip:
            h_hat = beta[:, :-pe_w] * c
            pe_hat = pe_hat + beta[:, -pe_w:] * c
        else:
            h_hat = beta
        if l > 0:
            gamma = h_hat * _sp1(zs[l - 1])
        else:
            pe_hat = pe_hat + h_hat

    dxs = dxs + _pe_jac_T(xs, multires, pe_hat)
    dx = dxs * scale
    return dWs, dbs, dx


# ------------------------- color net (IDR head) -------------------------
#
# forward (models/color.py, encode_a=True):
#   xyzf = feat @ Wxf + bxf
#   h0   = concat(xyzf, PEv(dirs), a)
#   h_{s+1} = relu(h_s @ Ws_s + bs_s)            (static head)
#   m0   = concat(pts, grad, h_S)
#   m_{l+1} = relu(m_l @ Wl_l + bl_l)  (last layer linear)
#   rgb  = sigmoid(m_last)


def color_forward_with_residuals(cw, pts, grad, dirs, feat, a, multires_view):
    """cw: dict with 'xyz_final', 'static{i}', 'lin{i}' -> (W, b)."""
    pev = _pe(dirs, multires_view)
    xyzf = feat @ cw["xyz_final"][0] + cw["xyz_final"][1]
    hs = [jnp.concatenate([xyzf, pev, a], axis=-1)]
    s = 0
    zs_static = []
    while f"static{s}" in cw:
        z = hs[-1] @ cw[f"static{s}"][0] + cw[f"static{s}"][1]
        zs_static.append(z)
        hs.append(jax.nn.relu(z))
        s += 1
    ms = [jnp.concatenate([pts, grad, hs[-1]], axis=-1)]
    zs_main = []
    l = 0
    n_lin = sum(1 for k in cw if k.startswith("lin"))
    while f"lin{l}" in cw:
        z = ms[-1] @ cw[f"lin{l}"][0] + cw[f"lin{l}"][1]
        zs_main.append(z)
        ms.append(jax.nn.relu(z) if l < n_lin - 1 else z)
        l += 1
    rgb = jax.nn.sigmoid(zs_main[-1])
    return dict(pev=pev, xyzf=xyzf, hs=hs, zs_static=zs_static, ms=ms,
                zs_main=zs_main, rgb=rgb)


def color_backward(cw, res, pts, grad, dirs, feat, a, multires_view, c_rgb):
    """First-order backward; returns (d_cw, d_pts, d_grad, d_dirs,
    d_feat, d_a)."""
    d_cw = {k: (jnp.zeros_like(w), jnp.zeros_like(b)) for k, (w, b) in cw.items()}
    n_lin = len(res["zs_main"])
    g = c_rgb * res["rgb"] * (1.0 - res["rgb"])  # sigmoid'
    for l in range(n_lin - 1, -1, -1):
        if l < n_lin - 1:
            g = g * (res["zs_main"][l] > 0)
        w, b = cw[f"lin{l}"]
        d_cw[f"lin{l}"] = (res["ms"][l].T @ g, jnp.sum(g, axis=0))
        g = g @ w.T
    d_pts = g[:, :3]
    d_grad = g[:, 3:6]
    g = g[:, 6:]  # cotangent on h_S
    n_s = len(res["zs_static"])
    for s in range(n_s - 1, -1, -1):
        g = g * (res["zs_static"][s] > 0)
        w, b = cw[f"static{s}"]
        d_cw[f"static{s}"] = (res["hs"][s].T @ g, jnp.sum(g, axis=0))
        g = g @ w.T
    d_xf = g[:, : res["xyzf"].shape[-1]]
    pe_w = res["pev"].shape[-1]
    d_pev = g[:, res["xyzf"].shape[-1] : res["xyzf"].shape[-1] + pe_w]
    d_a = g[:, res["xyzf"].shape[-1] + pe_w :]
    w, b = cw["xyz_final"]
    d_cw["xyz_final"] = (feat.T @ d_xf, jnp.sum(d_xf, axis=0))
    d_feat = d_xf @ w.T
    d_dirs = _pe_jac_T(dirs, multires_view, d_pev)
    return d_cw, d_pts, d_grad, d_dirs, d_feat, d_a


# ------------------------ combined field VJP ------------------------


def field_forward_with_residuals(weights, biases, cw, skip, multires,
                                 multires_view, scale, pts, dirs, a):
    """Full field forward (rgb, sdf, grad) keeping all residuals."""
    sres = forward_with_residuals(weights, biases, skip, multires, scale, pts)
    sdf = sres["out"][:, 0] / scale
    feat = sres["out"][:, 1:]
    cres = color_forward_with_residuals(cw, pts, sres["grad"], dirs, feat, a,
                                        multires_view)
    return dict(sdf=sdf, feat=feat, grad=sres["grad"], rgb=cres["rgb"],
                sres=sres, cres=cres)


def field_vjp(weights, biases, cw, skip, multires, multires_view, scale,
              pts, dirs, a, res, c_rgb, c_sdf, c_grad):
    """Backward of the full field given cotangents on (rgb, sdf, grad).

    Returns (dWs, dbs, d_cw, d_pts, d_dirs, d_a)."""
    d_cw, d_pts_c, d_grad_c, d_dirs, d_feat, d_a = color_backward(
        cw, res["cres"], pts, res["grad"], dirs, res["feat"], a,
        multires_view, c_rgb,
    )
    c_out = jnp.concatenate(
        [(c_sdf / scale)[:, None], d_feat], axis=-1
    )
    dWs, dbs, dx = backward(weights, biases, skip, multires, scale,
                            res["sres"], c_out, c_grad + d_grad_c)
    return dWs, dbs, d_cw, dx + d_pts_c, d_dirs, d_a
