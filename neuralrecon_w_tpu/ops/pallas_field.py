"""Fused field forward (SDF + analytic input-gradient + color) as one
Pallas TPU kernel — the forward half of the round-2 fused-field plan
(BENCHMARKS.md roadmap).

Computes per point tile, entirely in VMEM:
  1. SDF MLP forward, keeping each layer's pre-activation,
  2. the input gradient by a hand-rolled reverse sweep (softplus'
     = sigmoid(beta z); transposed contractions via dot_general on the
     same weight buffers — no transposed copies),
  3. the PE jacobian contraction back to xyz,
  4. the IDR color network on [pts, normals, dir_encoding].

Gradient-free w.r.t. parameters (jax.lax.stop_gradient semantics): this
kernel serves the no-backprop surfaces — validation renders, mesh
vertex coloring, SDF+normal probes. The training step keeps the
jax.vjp path until the custom-VJP backward kernel lands (round 2).

Verified in interpret mode against models.neuconw.field_forward.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.layers import pe_dim
from .pallas_mlp import LANE, _round_up, _sdf_static, pack_sdf_weights


# --------------------------- weight packing ---------------------------


def pack_color_weights(params_color: dict, color_cfg_items: tuple, n_a: int):
    """Zero-padded color-net weights for the kernel.

    Layer layout (encode_a=True, models/color.py):
      xyz_final: (d_feature, d_feature)
      static0: (d_feature + pe_view + n_a, head), static1..: (head, head)
      lin0: (3 + 3 + head, d_hidden), lin1..n-1: (d_hidden, d_hidden),
      lin_n: (d_hidden, 3)   [weight-normed]
    """
    cfg = dict(color_cfg_items)
    from .pallas_mlp import _effective_weight

    def padw(w, b):
        wi = _round_up(w.shape[0], LANE)
        wo = _round_up(w.shape[1], LANE)
        w_p = jnp.zeros((wi, wo), jnp.float32).at[: w.shape[0], : w.shape[1]].set(w)
        b_p = jnp.zeros((wo,), jnp.float32).at[: b.shape[0]].set(b)
        return w_p, b_p

    packed = []
    meta = []

    def add(p, name):
        w = _effective_weight(p)
        packed.append(padw(w, p["b"]))
        meta.append((name, w.shape[0], w.shape[1]))

    add(params_color["xyz_final"], "xyz_final")
    s = 0
    while f"static{s}" in params_color:
        add(params_color[f"static{s}"], f"static{s}")
        s += 1
    l = 0
    while f"lin{l}" in params_color:
        add(params_color[f"lin{l}"], f"lin{l}")
        l += 1
    return packed, tuple(meta)


# ------------------------------ kernel ------------------------------


def _kernel(dims, skip, multires, scale, color_meta, multires_view, n_a,
            act, pts_ref, dirs_ref, a_ref, *refs):
    n_sdf = len(dims) - 1
    sdf_refs = refs[: 2 * n_sdf]
    color_refs = refs[2 * n_sdf : 2 * n_sdf + 2 * len(color_meta)]
    sdf_out, grad_out, rgb_out = refs[-3], refs[-2], refs[-1]

    tile = pts_ref.shape[0]
    d_pe_pad = _round_up(dims[0], LANE)
    x = pts_ref[:, :3]
    dirs = dirs_ref[:, :3]
    a = a_ref[:, :n_a]

    xs = x * scale
    # PE, padded
    feats = [xs]
    for i in range(multires):
        feats.append(jnp.sin((2.0**i) * xs))
        feats.append(jnp.cos((2.0**i) * xs))
    pe = jnp.concatenate(feats, axis=-1)
    pe_pad = jnp.concatenate(
        [pe, jnp.zeros((tile, d_pe_pad - pe.shape[-1]), jnp.float32)], axis=-1
    )

    inv_sqrt2 = np.float32(1.0 / np.sqrt(2))

    # ---- SDF forward, retaining pre-activations ----
    h = pe_pad.astype(act)
    pe_a = h
    zs = []
    had_skip = []
    for l in range(n_sdf):
        w = sdf_refs[2 * l][:].astype(act)
        b = sdf_refs[2 * l + 1][:]
        if l in skip:
            h = (jnp.concatenate([h, pe_a], axis=-1) * inv_sqrt2).astype(act)
            had_skip.append(True)
        else:
            had_skip.append(False)
        z = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        zs.append(z)
        if l < n_sdf - 1:
            zb = z * 100.0
            h = jnp.where(
                zb > 20.0, z, jnp.log1p(jnp.exp(jnp.minimum(zb, 20.0))) / 100.0
            ).astype(act)
        else:
            h = z
    out = h  # (tile, d_out_pad); col 0 = sdf*scale, cols 1: = feature
    sdf = out[:, 0] / scale
    d_feat = dims[-1] - 1
    feature = out[:, 1 : 1 + d_feat]

    # ---- reverse sweep for d sdf / d x ----
    # cotangent on the last layer's output col 0 (of the raw, un-divided
    # head; the input scaling cancels the 1/scale on the output)
    d_out_pad = out.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, d_out_pad), 1)
    delta = jnp.where(col == 0, 1.0, 0.0)
    pe_delta = jnp.zeros((tile, d_pe_pad), jnp.float32)
    for l in range(n_sdf - 1, -1, -1):
        w = sdf_refs[2 * l][:].astype(act)
        # delta w.r.t. this layer's input: contract over the output axis
        din = jax.lax.dot_general(
            delta.astype(act), w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if had_skip[l]:
            h_w = din.shape[-1] - d_pe_pad
            pe_delta = pe_delta + din[:, h_w:] * inv_sqrt2
            din = din[:, :h_w] * inv_sqrt2
        if l > 0:
            # multiply by softplus'(z_{l-1}) = sigmoid(beta z)
            din = din * jax.nn.sigmoid(zs[l - 1] * 100.0)
            delta = din
        else:
            pe_delta = pe_delta + din

    # PE jacobian contraction: pe = [x, sin(2^i x), cos(2^i x)]
    grad = pe_delta[:, :3]
    for i in range(multires):
        f = np.float32(2.0**i)
        s_off = 3 + 6 * i
        c_off = 6 + 6 * i
        grad = grad + pe_delta[:, s_off : s_off + 3] * f * jnp.cos(f * xs)
        grad = grad - pe_delta[:, c_off : c_off + 3] * f * jnp.sin(f * xs)
    # out col0 had no /scale applied above; d(sdf)/dx = grad (scales cancel)

    # ---- color network ----
    cmap = {m[0]: i for i, m in enumerate(color_meta)}
    cdims = {m[0]: (m[1], m[2]) for m in color_meta}

    def clin(name, inp):
        i = cmap[name]
        w = color_refs[2 * i][:].astype(act)
        b = color_refs[2 * i + 1][:]
        din, dout = cdims[name]
        inp_pad = jnp.concatenate(
            [inp, jnp.zeros((tile, w.shape[0] - inp.shape[-1]), inp.dtype)],
            axis=-1,
        ) if inp.shape[-1] < w.shape[0] else inp
        z = jnp.dot(inp_pad.astype(act), w, preferred_element_type=jnp.float32)
        return z[:, :dout] + b[0, :dout]

    pe_view = [dirs]
    for i in range(multires_view):
        pe_view.append(jnp.sin((2.0**i) * dirs))
        pe_view.append(jnp.cos((2.0**i) * dirs))
    view_enc = jnp.concatenate(pe_view, axis=-1)

    xyz_final = clin("xyz_final", feature)
    hcol = jnp.concatenate([xyz_final, view_enc, a], axis=-1)
    s = 0
    while f"static{s}" in cmap:
        hcol = jax.nn.relu(clin(f"static{s}", hcol))
        s += 1
    xcol = jnp.concatenate([x, grad, hcol], axis=-1)
    l = 0
    n_lin = sum(1 for m in color_meta if m[0].startswith("lin"))
    while f"lin{l}" in cmap:
        xcol = clin(f"lin{l}", xcol)
        if l < n_lin - 1:
            xcol = jax.nn.relu(xcol)
        l += 1
    rgb = jax.nn.sigmoid(xcol[:, :3].astype(jnp.float32))

    def pad_lane(v):
        return jnp.concatenate(
            [v, jnp.zeros((tile, LANE - v.shape[-1]), jnp.float32)], axis=-1
        )

    sdf_out[:, :] = pad_lane(sdf[:, None])
    grad_out[:, :] = pad_lane(grad)
    rgb_out[:, :] = pad_lane(rgb)


@lru_cache(maxsize=None)
def _kernel_for(dims, skip, multires, scale, color_meta, multires_view,
                n_a, act_dtype):
    act = jnp.bfloat16 if act_dtype == "bfloat16" else jnp.float32
    return partial(_kernel, dims, skip, multires, scale, color_meta,
                   multires_view, n_a, act)


def fused_field_forward(
    params,
    fc,
    pts: jnp.ndarray,
    dirs: jnp.ndarray,
    a: jnp.ndarray,
    tile: int = 128,
    interpret: bool = False,
):
    """(rgb, sdf, grad) at (N, 3) points — one kernel, no parameter
    gradients. Pads N up to the tile size."""
    sdf_items = fc.sdf
    dims, skip, multires, scale = _sdf_static(sdf_items)
    ccfg = dict(fc.color)
    n = pts.shape[0]
    n_pad = _round_up(max(n, tile), tile)

    def pad128(x, width=128):
        out = jnp.zeros((n_pad, width), jnp.float32)
        return out.at[:n, : x.shape[1]].set(x)

    n_a = a.shape[-1]
    operands = [pad128(pts), pad128(dirs), pad128(a, _round_up(n_a, LANE))]
    in_specs = [
        pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, _round_up(n_a, LANE)), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for w, b in pack_sdf_weights(params["neuconw"]["sdf"], sdf_items):
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands += [w, b[None, :]]
    cpacked, cmeta = pack_color_weights(
        params["neuconw"]["color"], fc.color, n_a
    )
    for w, b in cpacked:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands += [w, b[None, :]]

    kernel = _kernel_for(tuple(dims), tuple(skip), multires, scale, cmeta,
                         int(ccfg["multires_view"]), n_a, fc.act_dtype)
    out_spec = pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    sdf_o, grad_o, rgb_o = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32),
        ),
        interpret=interpret,
    )(*operands)
    return rgb_o[:n, :3], sdf_o[:n, 0], grad_o[:n, :3]
