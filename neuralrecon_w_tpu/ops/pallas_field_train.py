"""Fully-fused FIELD forward+backward (SDF + color head) as Pallas TPU
kernels with a hand-derived custom VJP — the round-2 "swallow the color
head" plan (BENCHMARKS.md roadmap).

One training evaluation of the foreground field
(reference models/neuconw.py:339-376: NeuconW.forward = SDF MLP +
analytic gradient + IDR color head) costs XLA four HBM round-trips of
layer activations (forward, input-gradient transpose, and both backward
passes). These kernels keep the entire field per point-tile in VMEM:

  forward kernel  -> (rgb, sdf, grad); residuals are the raw inputs,
  backward kernel -> recomputes SDF forward + reverse sweep + color
                     forward in VMEM, runs the color backward, injects
                     the color head's (d_feat, d_normal) cotangents
                     into the SDF VJP (ops/field_vjp_math.py semantics,
                     verified there against jax.grad), and emits
                     d_pts / d_dirs / d_a plus dW/db accumulated across
                     the sequential grid.

As with ops/pallas_field_vjp.py, VMEM cannot hold the input weights
AND every dW accumulator at once, so dW emission is split across
`n_groups + 1` calls sharing the recompute: SDF layers are split over
the first `n_groups` calls (the first also emits d_pts/d_dirs/d_a),
and the color-head dWs ride the last call.

Exposed as ``field_rgb_sdf_grad_pallas`` — a custom-VJP drop-in for the
(rgb, sdf, grad) part of models.neuconw.field_forward. The weight-norm
(v, g) -> W materialization stays differentiable in XLA.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mlp import LANE, _round_up
from .pallas_field_vjp import (
    _pad_weights,
    _run_forward,
    _sdf_backward_body,
    _unpad_weight_grads,
)


# --------------------------- color packing ---------------------------


def color_effective_weights(params_color: dict):
    """(weights, biases, meta) with weight-norm materialized — the
    differentiable-in-XLA part. meta = ((name, d_in, d_out), ...)."""
    from .pallas_mlp import _effective_weight

    names = ["xyz_final"]
    s = 0
    while f"static{s}" in params_color:
        names.append(f"static{s}")
        s += 1
    l = 0
    while f"lin{l}" in params_color:
        names.append(f"lin{l}")
        l += 1
    weights, biases, meta = [], [], []
    for nm in names:
        w = _effective_weight(params_color[nm])
        weights.append(w)
        biases.append(params_color[nm]["b"])
        meta.append((nm, w.shape[0], w.shape[1]))
    return tuple(weights), tuple(biases), tuple(meta)


def _pack_color_train(weights, biases, meta, d_out_pad, act_dtype):
    """Zero-padded color weights for the train kernels. xyz_final's
    input side is padded to d_out_pad (the SDF output pad) so its
    transposed contraction directly yields a d_out_pad-wide feature
    cotangent (rolled by one column into the SDF c_out)."""
    wdt = jnp.bfloat16 if act_dtype == "bfloat16" else jnp.float32
    packed = []
    for (nm, d_in, d_out), w, b in zip(meta, weights, biases):
        in_pad = d_out_pad if nm == "xyz_final" else _round_up(d_in, LANE)
        out_pad = _round_up(d_out, LANE)
        w_p = jnp.zeros((in_pad, out_pad), jnp.float32).at[:d_in, :d_out].set(w)
        b_p = jnp.zeros((1, out_pad), jnp.float32).at[0, :d_out].set(b)
        packed.append((w_p.astype(wdt), b_p))
    return packed


# ------------------------- in-kernel color math -------------------------


def _pe_narrow(v, multires):
    feats = [v]
    for i in range(multires):
        feats.append(jnp.sin((2.0**i) * v))
        feats.append(jnp.cos((2.0**i) * v))
    return jnp.concatenate(feats, axis=-1)


def _pad_to(v, width):
    if v.shape[-1] == width:
        return v
    return jnp.concatenate(
        [v, jnp.zeros((v.shape[0], width - v.shape[-1]), v.dtype)], axis=-1
    )


def _color_forward(meta, multires_view, n_a, act, feat_pad, x, grad, dirs,
                   a, c_refs):
    """Color head forward on padded buffers, keeping residuals.

    feat_pad: (tile, d_out_pad) with the SDF feature in cols [0, 512)
    and zeros beyond (the raw SDF output rolled left by one column and
    masked)."""
    cmap = {m[0]: i for i, m in enumerate(meta)}

    def wb(name):
        i = cmap[name]
        return c_refs[2 * i][:], c_refs[2 * i + 1][:]

    def lin(name, inp):
        w, b = wb(name)
        return jnp.dot(_pad_to(inp, w.shape[0]).astype(act), w.astype(act),
                       preferred_element_type=jnp.float32) + b

    pev = _pe_narrow(dirs, multires_view)
    xyzf_w = dict(meta_d_out(meta))["xyz_final"]
    xyzf = lin("xyz_final", feat_pad)[:, :xyzf_w]
    h0 = jnp.concatenate([xyzf, pev, a], axis=-1)
    hs = [h0]
    zs_static = []
    s = 0
    while f"static{s}" in cmap:
        z = lin(f"static{s}", hs[-1])
        zs_static.append(z)
        hs.append(jnp.maximum(z, 0.0)[:, : dict(meta_d_out(meta))[f"static{s}"]])
        s += 1
    m0 = jnp.concatenate([x, grad, hs[-1]], axis=-1)
    ms = [m0]
    zs_main = []
    n_lin = sum(1 for m in meta if m[0].startswith("lin"))
    for l in range(n_lin):
        z = lin(f"lin{l}", ms[-1])
        zs_main.append(z)
        if l < n_lin - 1:
            ms.append(jnp.maximum(z, 0.0)[:, : dict(meta_d_out(meta))[f"lin{l}"]])
    rgb = jax.nn.sigmoid(zs_main[-1][:, :3])
    return dict(pev=pev, hs=hs, zs_static=zs_static, ms=ms,
                zs_main=zs_main, rgb=rgb, feat_pad=feat_pad)


def meta_d_out(meta):
    return tuple((m[0], m[2]) for m in meta)


def _color_backward(meta, multires_view, n_a, act, cres, x, dirs, a,
                    c_refs, c_rgb, dW_map, first):
    """Color head VJP (ops/field_vjp_math.py color_backward semantics)
    on padded buffers. Accumulates dW/db into dW_map (keyed by layer
    name) and returns (d_pts, d_grad, d_dirs, d_a, d_feat_pad)."""
    cmap = {m[0]: i for i, m in enumerate(meta)}
    dims_in = {m[0]: m[1] for m in meta}

    def wref(name):
        return c_refs[2 * cmap[name]]

    def emit(name, inp_pad, g):
        if name not in dW_map:
            return
        dw = jax.lax.dot_general(
            inp_pad.astype(act), g.astype(act),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db = jnp.sum(g, axis=0, keepdims=True)
        wr, br = dW_map[name]

        @pl.when(first)
        def _init(wr=wr, br=br, dw=dw, db=db):
            wr[:, :] = dw
            br[:, :] = db

        @pl.when(jnp.logical_not(first))
        def _acc(wr=wr, br=br, dw=dw, db=db):
            wr[:, :] = wr[:, :] + dw
            br[:, :] = br[:, :] + db

    def back(name, g):
        w = wref(name)[:]
        return jax.lax.dot_general(
            g.astype(act), w.astype(act),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    rgb = cres["rgb"]
    n_lin = len(cres["zs_main"])
    # sigmoid' on the padded last z: c_rgb is zero beyond col 3, so no mask
    z_last = cres["zs_main"][-1]
    sig = jax.nn.sigmoid(z_last)
    g = _pad_to(c_rgb, z_last.shape[-1]) * sig * (1.0 - sig)
    for l in range(n_lin - 1, -1, -1):
        if l < n_lin - 1:
            g = g * (cres["zs_main"][l] > 0)
        inp = _pad_to(cres["ms"][l], dims_in_pad(meta, f"lin{l}"))
        emit(f"lin{l}", inp, g)
        g = back(f"lin{l}", g)
    d_pts = g[:, :3]
    d_grad = g[:, 3:6]
    g = pltpu.roll(g, g.shape[-1] - 6, axis=1)  # cotangent on the static head
    n_s = len(cres["zs_static"])
    for s in range(n_s - 1, -1, -1):
        g = g[:, : cres["zs_static"][s].shape[-1]]
        g = g * (cres["zs_static"][s] > 0)
        inp = _pad_to(cres["hs"][s], dims_in_pad(meta, f"static{s}"))
        emit(f"static{s}", inp, g)
        g = back(f"static{s}", g)
    xf_w = dict(meta_d_out(meta))["xyz_final"]
    out_pad_xyz = wref("xyz_final")[:].shape[1]
    # zero-mask the non-feature cotangents (pev/a ride the same vector
    # when xf_w is not a lane multiple) and pad to the packed width
    gx = g[:, :out_pad_xyz] if g.shape[-1] >= out_pad_xyz else _pad_to(
        g, out_pad_xyz)
    colx = jax.lax.broadcasted_iota(jnp.int32, gx.shape, 1)
    d_xf = jnp.where(colx < xf_w, gx, 0.0)
    pev_w = cres["pev"].shape[-1]
    d_pev = g[:, xf_w:xf_w + pev_w]
    d_a = g[:, xf_w + pev_w:xf_w + pev_w + n_a]
    emit("xyz_final", cres["feat_pad"], d_xf)
    d_feat_pad = back("xyz_final", d_xf)
    # view-PE jacobian transpose back to dirs
    d_dirs = d_pev[:, :3]
    for i in range(multires_view):
        f = np.float32(2.0**i)
        s_off = 3 + 6 * i
        c_off = 6 + 6 * i
        d_dirs = d_dirs + d_pev[:, s_off:s_off + 3] * f * jnp.cos(f * dirs)
        d_dirs = d_dirs - d_pev[:, c_off:c_off + 3] * f * jnp.sin(f * dirs)
    return d_pts, d_grad, d_dirs, d_a, d_feat_pad


def dims_in_pad(meta, name):
    for nm, d_in, d_out in meta:
        if nm == name:
            return _round_up(d_in, LANE)
    raise KeyError(name)


def _feat_pad_from_out(out, d_feat):
    """SDF raw output (tile, d_out_pad) -> color feature input: cols
    [1, 1+d_feat) rolled into [0, d_feat), zeros beyond."""
    rolled = pltpu.roll(out, out.shape[-1] - 1, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 1)
    return jnp.where(col < d_feat, rolled, 0.0)


# ------------------------------ kernels ------------------------------


def _ftrain_fwd_kernel(dims, skip, multires, scale, meta, multires_view,
                       n_a, act, d_pe_pad, pts_ref, dirs_ref, a_ref, *refs):
    L = len(dims) - 1
    sdf_refs = refs[: 2 * L]
    c_refs = refs[2 * L: 2 * L + 2 * len(meta)]
    rgb_ref, sdf_ref, grad_ref = refs[-3], refs[-2], refs[-1]

    tile = pts_ref.shape[0]
    x = pts_ref[:, :3]
    dirs = dirs_ref[:, :3]
    a = a_ref[:, :n_a]
    res = _run_forward(x, sdf_refs, dims, skip, multires, scale, act,
                       d_pe_pad)
    feat_pad = _feat_pad_from_out(res["out"], dims[-1] - 1)
    cres = _color_forward(meta, multires_view, n_a, act, feat_pad, x,
                          res["grad"], dirs, a, c_refs)

    def pad_lane(v):
        return jnp.concatenate(
            [v, jnp.zeros((tile, LANE - v.shape[-1]), jnp.float32)], axis=-1
        )

    rgb_ref[:, :] = pad_lane(cres["rgb"])
    sdf_ref[:, :] = pad_lane(res["out"][:, :1] / scale)
    grad_ref[:, :] = pad_lane(res["grad"])


def _ftrain_bwd_kernel(dims, skip, multires, scale, meta, multires_view,
                       n_a, act, d_pe_pad, sdf_dw_layers, color_dw,
                       emit_dx, pts_ref, dirs_ref, a_ref, cot_ref, *refs):
    L = len(dims) - 1
    sdf_refs = refs[: 2 * L]
    it = 2 * L
    c_refs = refs[it: it + 2 * len(meta)]
    it += 2 * len(meta)
    dxd_ref = da_ref = None
    if emit_dx:
        dxd_ref, da_ref = refs[it], refs[it + 1]
        it += 2
    sdf_dW = {}
    for l in sdf_dw_layers:
        sdf_dW[l] = (refs[it], refs[it + 1])
        it += 2
    col_dW = {}
    for nm in color_dw:
        col_dW[nm] = (refs[it], refs[it + 1])
        it += 2

    tile = pts_ref.shape[0]
    x = pts_ref[:, :3]
    dirs = dirs_ref[:, :3]
    a = a_ref[:, :n_a]
    c_rgb = cot_ref[:, :3]
    c_sdf = cot_ref[:, 3:4]
    c_grad = cot_ref[:, 4:7]
    first = pl.program_id(0) == 0

    res = _run_forward(x, sdf_refs, dims, skip, multires, scale, act,
                       d_pe_pad)
    feat_pad = _feat_pad_from_out(res["out"], dims[-1] - 1)
    cres = _color_forward(meta, multires_view, n_a, act, feat_pad, x,
                          res["grad"], dirs, a, c_refs)
    d_pts_c, d_grad_c, d_dirs, d_a, d_feat_pad = _color_backward(
        meta, multires_view, n_a, act, cres, x, dirs, a, c_refs, c_rgb,
        col_dW, first,
    )

    # inject the color cotangents into the SDF VJP:
    #   c_out col0 = c_sdf / scale, cols [1, 1+d_feat) = d_feat
    c_out = pltpu.roll(d_feat_pad, 1, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, c_out.shape, 1)
    c_out = jnp.where(col == 0, c_sdf / scale, c_out)
    dxs = _sdf_backward_body(res, c_out, c_grad + d_grad_c, sdf_refs,
                             sdf_dW, first, dims, skip, multires, scale,
                             act, d_pe_pad)
    if emit_dx:
        dx = dxs * scale + d_pts_c
        dxd_ref[:, :] = jnp.concatenate(
            [dx, d_dirs, jnp.zeros((tile, LANE - 6), jnp.float32)], axis=-1
        )
        da_ref[:, :] = jnp.concatenate(
            [d_a, jnp.zeros((tile, LANE - n_a), jnp.float32)], axis=-1
        )


@lru_cache(maxsize=None)
def _fwd_kernel_for(dims, skip, multires, scale, meta, multires_view, n_a,
                    act_dtype, d_pe_pad):
    act = jnp.bfloat16 if act_dtype == "bfloat16" else jnp.float32

    def k(*a):
        return _ftrain_fwd_kernel(dims, skip, multires, scale, meta,
                                  multires_view, n_a, act, d_pe_pad, *a)
    return k


@lru_cache(maxsize=None)
def _bwd_kernel_for(dims, skip, multires, scale, meta, multires_view, n_a,
                    act_dtype, d_pe_pad, sdf_dw_layers, color_dw, emit_dx):
    act = jnp.bfloat16 if act_dtype == "bfloat16" else jnp.float32

    def k(*a):
        return _ftrain_bwd_kernel(dims, skip, multires, scale, meta,
                                  multires_view, n_a, act, d_pe_pad,
                                  sdf_dw_layers, color_dw, emit_dx, *a)
    return k


# --------------------------- host wrappers ---------------------------


def _row_spec(tile, width):
    return pl.BlockSpec((tile, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _pad_rows(v, n_pad, width):
    out = jnp.zeros((n_pad, width), jnp.float32)
    return out.at[: v.shape[0], : v.shape[1]].set(v)


def _weight_ops_specs(packed):
    ops, specs = [], []
    for w, b in packed:
        ops += [w, b if b.ndim == 2 else b[None, :]]
        specs += [_const_spec(w.shape), _const_spec((1, b.shape[-1]))]
    return ops, specs


def field_fwd_pallas(sdf_w, sdf_b, col_w, col_b, cfg_static, pts, dirs, a,
                     tile, interpret=False):
    (dims, skip, multires, scale, act_dtype, meta, multires_view,
     n_a) = cfg_static
    d_pe_pad = _round_up(dims[0], LANE)
    n = pts.shape[0]
    n_pad = _round_up(max(n, tile), tile)
    d_out_pad = _round_up(dims[-1], LANE)

    sdf_packed = _pad_weights(sdf_w, sdf_b, dims, skip, d_pe_pad, act_dtype)
    col_packed = _pack_color_train(col_w, col_b, meta, d_out_pad, act_dtype)
    w_ops, w_specs = _weight_ops_specs(list(sdf_packed) + col_packed)

    n_a_pad = _round_up(n_a, LANE)
    ops = [_pad_rows(pts, n_pad, LANE), _pad_rows(dirs, n_pad, LANE),
           _pad_rows(a, n_pad, n_a_pad)] + w_ops
    specs = [_row_spec(tile, LANE), _row_spec(tile, LANE),
             _row_spec(tile, n_a_pad)] + w_specs

    kernel = _fwd_kernel_for(dims, skip, multires, scale, meta,
                             multires_view, n_a, act_dtype, d_pe_pad)
    out_spec = _row_spec(tile, LANE)
    rgb_o, sdf_o, grad_o = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32) for _ in range(3)
        ),
        interpret=interpret,
    )(*ops)
    return rgb_o[:n, :3], sdf_o[:n, 0], grad_o[:n, :3]


def field_bwd_pallas(sdf_w, sdf_b, col_w, col_b, cfg_static, pts, dirs, a,
                     c_rgb, c_sdf, c_grad, tile, interpret=False,
                     n_groups=2):
    (dims, skip, multires, scale, act_dtype, meta, multires_view,
     n_a) = cfg_static
    d_pe_pad = _round_up(dims[0], LANE)
    L = len(dims) - 1
    n = pts.shape[0]
    n_pad = _round_up(max(n, tile), tile)
    d_out_pad = _round_up(dims[-1], LANE)

    sdf_packed = _pad_weights(sdf_w, sdf_b, dims, skip, d_pe_pad, act_dtype)
    col_packed = _pack_color_train(col_w, col_b, meta, d_out_pad, act_dtype)
    w_ops, w_specs = _weight_ops_specs(list(sdf_packed) + col_packed)

    cot = jnp.zeros((n_pad, LANE), jnp.float32)
    cot = cot.at[:n, 0:3].set(c_rgb).at[:n, 3].set(c_sdf).at[:n, 4:7].set(c_grad)
    n_a_pad = _round_up(n_a, LANE)
    ops = [_pad_rows(pts, n_pad, LANE), _pad_rows(dirs, n_pad, LANE),
           _pad_rows(a, n_pad, n_a_pad), cot] + w_ops
    specs = [_row_spec(tile, LANE), _row_spec(tile, LANE),
             _row_spec(tile, n_a_pad), _row_spec(tile, LANE)] + w_specs

    # SDF layers split over the first n_groups calls; color dWs ride the
    # last call; d_pts/d_dirs/d_a come from the first
    n_groups = max(1, min(n_groups, L))
    per = -(-L // n_groups)
    sdf_groups = [tuple(range(g * per, min((g + 1) * per, L)))
                  for g in range(n_groups)]
    sdf_groups = [g for g in sdf_groups if g]
    names = tuple(m[0] for m in meta)

    sdf_dWs = [None] * L
    sdf_dbs = [None] * L
    col_dWs = {}
    dx = d_dirs = d_a = None
    for gi, group in enumerate(sdf_groups):
        emit_dx = gi == 0
        color_dw = names if gi == len(sdf_groups) - 1 else ()
        out_specs, out_shapes = [], []
        if emit_dx:
            for _ in range(2):
                out_specs.append(_row_spec(tile, LANE))
                out_shapes.append(jax.ShapeDtypeStruct((n_pad, LANE),
                                                       jnp.float32))
        for l in group:
            w, b = sdf_packed[l]
            out_specs += [_const_spec(w.shape), _const_spec((1, b.shape[-1]))]
            out_shapes += [jax.ShapeDtypeStruct(w.shape, jnp.float32),
                           jax.ShapeDtypeStruct((1, b.shape[-1]), jnp.float32)]
        for nm in color_dw:
            w, b = col_packed[list(names).index(nm)]
            out_specs += [_const_spec(w.shape), _const_spec(b.shape)]
            out_shapes += [jax.ShapeDtypeStruct(w.shape, jnp.float32),
                           jax.ShapeDtypeStruct(b.shape, jnp.float32)]

        kernel = _bwd_kernel_for(dims, skip, multires, scale, meta,
                                 multires_view, n_a, act_dtype, d_pe_pad,
                                 group, color_dw, emit_dx)
        results = pl.pallas_call(
            kernel,
            grid=(n_pad // tile,),
            in_specs=specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            interpret=interpret,
        )(*ops)
        off = 0
        if emit_dx:
            dx = results[0][:n, :3]
            d_dirs = results[0][:n, 3:6]
            d_a = results[1][:n, :n_a]
            off = 2
        for j, l in enumerate(group):
            sdf_dWs[l] = results[off + 2 * j]
            sdf_dbs[l] = results[off + 2 * j + 1]
            if j == len(group) - 1:
                off = off + 2 * len(group)
        for j, nm in enumerate(color_dw):
            col_dWs[nm] = (results[off + 2 * j], results[off + 2 * j + 1])

    dWs, dbs = _unpad_weight_grads(sdf_dWs, sdf_dbs, sdf_w, dims, skip,
                                   d_pe_pad)
    d_col_w, d_col_b = [], []
    for nm, d_in, d_out in meta:
        dw_p, db_p = col_dWs[nm]
        d_col_w.append(dw_p[:d_in, :d_out])
        d_col_b.append(db_p[0, :d_out])
    return (tuple(dWs), tuple(dbs), tuple(d_col_w), tuple(d_col_b),
            dx, d_dirs, d_a)


# --------------------------- custom_vjp API ---------------------------


@lru_cache(maxsize=None)
def _make_field_custom(cfg_static, tile, interpret, n_groups):
    @jax.custom_vjp
    def f(sdf_w, sdf_b, col_w, col_b, pts, dirs, a):
        return field_fwd_pallas(sdf_w, sdf_b, col_w, col_b, cfg_static,
                                pts, dirs, a, tile, interpret)

    def fwd(sdf_w, sdf_b, col_w, col_b, pts, dirs, a):
        return (f(sdf_w, sdf_b, col_w, col_b, pts, dirs, a),
                (sdf_w, sdf_b, col_w, col_b, pts, dirs, a))

    def bwd(resid, cots):
        sdf_w, sdf_b, col_w, col_b, pts, dirs, a = resid
        c_rgb, c_sdf, c_grad = cots
        dWs, dbs, d_cw, d_cb, dx, d_dirs, d_a = field_bwd_pallas(
            sdf_w, sdf_b, col_w, col_b, cfg_static, pts, dirs, a,
            c_rgb, c_sdf, c_grad, tile, interpret, n_groups,
        )
        return dWs, dbs, d_cw, d_cb, dx, d_dirs, d_a

    f.defvjp(fwd, bwd)
    return f


def field_rgb_sdf_grad_pallas(params, fc, pts, dirs, a, tile=None,
                              interpret=False, n_groups=1):
    """(rgb, sdf, grad) with the fully-fused field VJP. Differentiable
    w.r.t. params (through the XLA weight-norm chain), pts, dirs and a.

    Drop-in for the non-inv_s part of models.neuconw.field_forward."""
    from ..models.sdf import _layer_weight, sdf_layer_dims

    sdf_cfg = dict(fc.sdf)
    dims = tuple(sdf_layer_dims(sdf_cfg))
    skip = tuple(sdf_cfg["skip_in"])
    L = len(dims) - 1
    p_sdf = params["neuconw"]["sdf"]
    sdf_w = tuple(_layer_weight(p_sdf[f"lin{l}"]) for l in range(L))
    sdf_b = tuple(p_sdf[f"lin{l}"]["b"] for l in range(L))
    col_w, col_b, meta = color_effective_weights(params["neuconw"]["color"])
    multires_view = int(dict(fc.color)["multires_view"])

    if tile is None:
        # measured on v5e at the flagship 8x512 config (131k pts):
        # t128/n_groups=1 = 45.4ms vs t64/n_groups=2 = 87.1ms
        tile = 128
    cfg_static = (dims, skip, int(sdf_cfg["multires"]),
                  float(sdf_cfg["scale"]), fc.act_dtype, meta,
                  multires_view, fc.n_a)
    f = _make_field_custom(cfg_static, tile, interpret, n_groups)
    rgb, sdf, grad = f(sdf_w, sdf_b, col_w, col_b, pts, dirs, a)
    return rgb, sdf, grad
