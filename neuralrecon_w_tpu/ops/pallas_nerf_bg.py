"""Fused background-NeRF forward+backward as Pallas TPU kernels.

The NeRF++ background pass (reference rendering/renderer.py:157-228,
models/nerf.py:86-182) evaluates an 8x256 MLP + appearance head at every
sorted sample of every ray (fg samples + N_OUTSIDE tail), ~38 points/ray
at the flagship config. Profiling (BENCHMARKS.md) shows it costs
~23 ms/step of HBM activation traffic at 311k points — all first-order
(the bg pass sits under the sampler's stop_gradient, so only parameter
and appearance-embedding gradients flow).

These kernels keep the whole evaluation per point-tile in VMEM:

  forward kernel  -> one (tile, 128) output [density | rgb]; residuals
                     are just the raw inputs,
  backward kernel -> recomputes the forward in VMEM, backprops the
                     (d_density, d_rgb) cotangents through the
                     appearance head, the feature/alpha heads and the
                     skip MLP, and emits d_pts4 / d_dirs / d_a plus
                     dW/db for every layer, accumulated across the
                     sequential grid in a SINGLE call (the net is small
                     enough that all accumulators fit in VMEM — unlike
                     the SDF field kernels in ops/pallas_field_vjp.py).

MEASURED RESULT (v5e, 311k pts, bf16): the kernel LOSES to XLA — fwd
24.1 ms vs 8.1 ms, fwd+bwd 40.9 ms vs 26.6 ms. The bg pass turns out
to be MXU-shape-bound, not HBM-bound: W=256 layers at tile 256 give
(256, 256) per-tile GEMMs with poor MXU utilization, while XLA runs
one 311k-row GEMM per layer at ~49 TF/s effective. Same lesson as the
SDF-field kernels (BENCHMARKS.md): at these widths XLA's giant batched
GEMMs beat VMEM-resident tiling. Kept as a verified, tested alternative
mode (``TPU.FUSED_BG``, default False).

Exposed as ``nerf_bg_pallas`` — a custom-VJP drop-in for
models.nerf_bg.apply_nerf_bg.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mlp import LANE, _round_up

D = 8          # pts-MLP depth (models/nerf_bg.py)
W = 256        # pts-MLP width
SKIPS = (4,)   # concat [pe, h] AFTER this layer's ReLU
MULTIRES = 10  # positional encoding frequencies for pts4
MULTIRES_VIEW = 4
D_IN = 4       # [xyz/r, 1/r]


def _pe_dims(n_a: int, encode_a: bool):
    d_pe = D_IN * (1 + 2 * MULTIRES)            # 84
    d_pe_view = 3 * (1 + 2 * MULTIRES_VIEW)     # 27
    d_pe_pad = _round_up(d_pe, LANE)            # 128
    d_pev_pad = _round_up(d_pe_view, LANE)      # 128
    n_a_pad = _round_up(max(n_a, 1), LANE) if encode_a else 0
    return d_pe, d_pe_view, d_pe_pad, d_pev_pad, n_a_pad


def bg_layer_names(encode_a: bool):
    names = [f"pts{i}" for i in range(D)] + ["alpha", "feature"]
    if encode_a:
        names += [f"app{s}" for s in range(D // 2)]
    else:
        names += ["views0"]
    return names + ["rgb"]


def _pack_bg_weights(params, encode_a: bool, n_a: int, act_dtype: str):
    """Zero-padded (w, b) list in bg_layer_names order.

    Concat inputs are padded per-segment so the packed rows line up with
    the in-kernel concatenation of lane-padded segments:
      pts5 input  = [pe_pad(128) | h(256)]               -> (384, 256)
      app0 input  = [feat(256) | pev_pad(128) | a_pad]   -> (256+128+n_a_pad, 128)
      views0 input= [feat(256) | pev_pad(128)]           -> (384, 128)
    """
    d_pe, d_pe_view, d_pe_pad, d_pev_pad, n_a_pad = _pe_dims(n_a, encode_a)
    wdt = jnp.bfloat16 if act_dtype == "bfloat16" else jnp.float32
    packed = []
    for nm in bg_layer_names(encode_a):
        w = params[nm]["w"]
        b = params[nm]["b"]
        d_in, d_out = w.shape
        out_pad = _round_up(d_out, LANE)
        if nm == "pts0":
            w_p = jnp.zeros((d_pe_pad, out_pad), jnp.float32)
            w_p = w_p.at[:d_in, :d_out].set(w)
        elif nm == f"pts{SKIPS[0] + 1}":
            # torch layout: rows [pe(84) | h(256)]
            w_p = jnp.zeros((d_pe_pad + W, out_pad), jnp.float32)
            w_p = w_p.at[:d_pe, :d_out].set(w[:d_pe])
            w_p = w_p.at[d_pe_pad:, :d_out].set(w[d_pe:])
        elif nm in ("app0", "views0"):
            # rows [feature(256) | pe_view(27) | a(n_a)]
            rows = W + d_pev_pad + (n_a_pad if nm == "app0" else 0)
            w_p = jnp.zeros((rows, out_pad), jnp.float32)
            w_p = w_p.at[:W, :d_out].set(w[:W])
            w_p = w_p.at[W:W + d_pe_view, :d_out].set(w[W:W + d_pe_view])
            if nm == "app0":
                w_p = w_p.at[W + d_pev_pad:W + d_pev_pad + n_a, :d_out].set(
                    w[W + d_pe_view:]
                )
        else:
            w_p = jnp.zeros((_round_up(d_in, LANE), out_pad), jnp.float32)
            w_p = w_p.at[:d_in, :d_out].set(w)
        b_p = jnp.zeros((1, out_pad), jnp.float32).at[0, :d_out].set(b)
        packed.append((w_p.astype(wdt), b_p))
    return packed


# --------------------------- in-kernel math ---------------------------


def _pe_pad(v, multires, width):
    """Positional encoding [v, sin(2^i v), cos(2^i v)] zero-padded to
    `width` lanes (models/layers.py:positional_encoding layout)."""
    feats = [v]
    for i in range(multires):
        f = np.float32(2.0**i)
        feats.append(jnp.sin(f * v))
        feats.append(jnp.cos(f * v))
    pe = jnp.concatenate(feats, axis=-1)
    pad = width - pe.shape[-1]
    if pad:
        pe = jnp.concatenate(
            [pe, jnp.zeros((pe.shape[0], pad), pe.dtype)], axis=-1
        )
    return pe


def _pe_transpose(d_pe, v, multires, d):
    """(d_v)-dim input cotangent from a padded PE cotangent d_pe."""
    dv = d_pe[:, :d]
    for i in range(multires):
        f = np.float32(2.0**i)
        s_off = d * (1 + 2 * i)
        c_off = d * (2 + 2 * i)
        dv = dv + d_pe[:, s_off:s_off + d] * f * jnp.cos(f * v)
        dv = dv - d_pe[:, c_off:c_off + d] * f * jnp.sin(f * v)
    return dv


def _bg_forward(encode_a, n_a, act, refs, p4, dirs, a):
    """Forward on padded buffers; returns residual dict (pre-ReLU zs)."""
    names = bg_layer_names(encode_a)
    nmap = {nm: i for i, nm in enumerate(names)}

    def lin(name, inp):
        w = refs[2 * nmap[name]][:]
        b = refs[2 * nmap[name] + 1][:]
        return jnp.dot(inp.astype(act), w.astype(act),
                       preferred_element_type=jnp.float32) + b

    pe = _pe_pad(p4, MULTIRES, LANE)
    pev = _pe_pad(dirs, MULTIRES_VIEW, LANE)

    zs = []
    h = pe
    for i in range(D):
        z = lin(f"pts{i}", h)
        zs.append(z)
        h = jnp.maximum(z, 0.0)
        if i in SKIPS:
            h = jnp.concatenate([pe, h], axis=-1)
    density = lin("alpha", h)
    feat = lin("feature", h)
    segs = [feat, pev] + ([a] if encode_a else [])
    hv = jnp.concatenate(segs, axis=-1)
    zs_head = []
    head = [f"app{s}" for s in range(D // 2)] if encode_a else ["views0"]
    for nm in head:
        z = lin(nm, hv)
        zs_head.append(z)
        hv = jnp.maximum(z, 0.0)
    rgb_z = lin("rgb", hv)
    return dict(pe=pe, pev=pev, zs=zs, feat=feat, zs_head=zs_head,
                density=density, rgb_z=rgb_z, head=head)


def _bg_fwd_kernel(encode_a, n_a, act, p4_ref, dirs_ref, a_ref, *refs):
    out_ref = refs[-1]
    p4 = p4_ref[:, :D_IN]
    dirs = dirs_ref[:, :3]
    a = a_ref[:, :] if encode_a else None
    res = _bg_forward(encode_a, n_a, act, refs[:-1], p4, dirs, a)
    # [density | rgb | zeros]: col 0 density, cols 1:4 rgb
    out = pltpu.roll(res["rgb_z"], 1, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    out = jnp.where(col == 0, res["density"][:, :1], out)
    out_ref[:, :] = jnp.where(col < 4, out, 0.0)


def _bg_bwd_kernel(encode_a, n_a, act, p4_ref, dirs_ref, a_ref, cot_ref,
                   *refs):
    names = bg_layer_names(encode_a)
    nmap = {nm: i for i, nm in enumerate(names)}
    w_refs = refs[: 2 * len(names)]
    it = 2 * len(names)
    din_ref = refs[it]
    da_ref = refs[it + 1] if encode_a else None
    it += 2 if encode_a else 1
    dW = {}
    for nm in names:
        dW[nm] = (refs[it], refs[it + 1])
        it += 2

    tile = p4_ref.shape[0]
    p4 = p4_ref[:, :D_IN]
    dirs = dirs_ref[:, :3]
    a = a_ref[:, :] if encode_a else None
    first = pl.program_id(0) == 0

    res = _bg_forward(encode_a, n_a, act, w_refs, p4, dirs, a)

    def emit(name, inp, g):
        dw = jax.lax.dot_general(
            inp.astype(act), g.astype(act),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db = jnp.sum(g, axis=0, keepdims=True)
        wr, br = dW[name]

        @pl.when(first)
        def _init(wr=wr, br=br, dw=dw, db=db):
            wr[:, :] = dw
            br[:, :] = db

        @pl.when(jnp.logical_not(first))
        def _acc(wr=wr, br=br, dw=dw, db=db):
            wr[:, :] = wr[:, :] + dw
            br[:, :] = br[:, :] + db

    def back(name, g):
        w = w_refs[2 * nmap[name]][:]
        return jax.lax.dot_general(
            g.astype(act), w.astype(act),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # cotangents: col 0 density, cols 1:4 rgb (both heads are linear)
    col = jax.lax.broadcasted_iota(jnp.int32, cot_ref.shape, 1)
    c_rgb = jnp.where(col < 3, pltpu.roll(cot_ref[:, :], LANE - 1, axis=1),
                      0.0)
    c_den = jnp.where(col == 0, cot_ref[:, :], 0.0)

    # appearance / view head
    pre_rgb = jnp.maximum(res["zs_head"][-1], 0.0)
    emit("rgb", pre_rgb, c_rgb)
    g = back("rgb", c_rgb)
    for s in range(len(res["head"]) - 1, -1, -1):
        nm = res["head"][s]
        g = g * (res["zs_head"][s] > 0)
        if s > 0:
            inp = jnp.maximum(res["zs_head"][s - 1], 0.0)
            emit(nm, inp, g)
            g = back(nm, g)
        else:
            segs = [res["feat"], res["pev"]] + ([a] if encode_a else [])
            emit(nm, jnp.concatenate(segs, axis=-1), g)
            g = back(nm, g)
    d_feat = g[:, :W]
    d_pev = g[:, W:W + LANE]
    if encode_a:
        da_ref[:, :] = g[:, W + LANE:]

    # feature + alpha heads join on the last hidden state
    h_last = jnp.maximum(res["zs"][D - 1], 0.0)
    emit("feature", h_last, d_feat)
    emit("alpha", h_last, c_den)
    g = back("feature", d_feat) + back("alpha", c_den)

    # pts MLP reverse sweep; collect PE cotangent from skip + layer 0
    d_pe = jnp.zeros((tile, LANE), jnp.float32)
    for i in range(D - 1, -1, -1):
        g = g * (res["zs"][i] > 0)
        if i == 0:
            inp = res["pe"]
        elif (i - 1) in SKIPS:
            h_prev = jnp.concatenate(
                [res["pe"], jnp.maximum(res["zs"][i - 1], 0.0)], axis=-1
            )
            inp = h_prev
        else:
            inp = jnp.maximum(res["zs"][i - 1], 0.0)
        emit(f"pts{i}", inp, g)
        g = back(f"pts{i}", g)
        if i == 0:
            d_pe = d_pe + g
        elif (i - 1) in SKIPS:
            d_pe = d_pe + g[:, :LANE]
            g = g[:, LANE:]

    d_p4 = _pe_transpose(d_pe, p4, MULTIRES, D_IN)
    d_dirs = _pe_transpose(d_pev, dirs, MULTIRES_VIEW, 3)
    din_ref[:, :] = jnp.concatenate(
        [d_p4, d_dirs, jnp.zeros((tile, LANE - D_IN - 3), jnp.float32)],
        axis=-1,
    )


@lru_cache(maxsize=None)
def _fwd_kernel_for(encode_a, n_a, act_dtype):
    act = jnp.bfloat16 if act_dtype == "bfloat16" else jnp.float32

    def k(*args):
        return _bg_fwd_kernel(encode_a, n_a, act, *args)
    return k


@lru_cache(maxsize=None)
def _bwd_kernel_for(encode_a, n_a, act_dtype):
    act = jnp.bfloat16 if act_dtype == "bfloat16" else jnp.float32

    def k(*args):
        return _bg_bwd_kernel(encode_a, n_a, act, *args)
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


def _prep(params, encode_a, n_a, act_dtype, pts4, dirs, a, tile):
    n = pts4.shape[0]
    n_pad = _round_up(max(n, tile), tile)
    _, _, _, _, n_a_pad = _pe_dims(n_a, encode_a)
    packed = _pack_bg_weights(params, encode_a, n_a, act_dtype)
    w_ops, w_specs = [], []
    for w, b in packed:
        w_ops += [w, b]
        w_specs += [_const_spec(w.shape), _const_spec(b.shape)]
    ops = [_pad_rows(pts4, n_pad, LANE), _pad_rows(dirs, n_pad, LANE)]
    specs = [_row_spec(tile, LANE), _row_spec(tile, LANE)]
    if encode_a:
        ops.append(_pad_rows(a, n_pad, n_a_pad))
        specs.append(_row_spec(tile, n_a_pad))
    else:
        ops.append(jnp.zeros((n_pad, LANE), jnp.float32))
        specs.append(_row_spec(tile, LANE))
    return n, n_pad, packed, ops + w_ops, specs + w_specs


def bg_fwd_pallas(params, encode_a, n_a, act_dtype, pts4, dirs, a, tile,
                  interpret=False):
    n, n_pad, _, ops, specs = _prep(params, encode_a, n_a, act_dtype,
                                    pts4, dirs, a, tile)
    kernel = _fwd_kernel_for(encode_a, n_a, act_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=specs,
        out_specs=_row_spec(tile, LANE),
        out_shape=jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32),
        interpret=interpret,
    )(*ops)
    return out[:n, 0:1], out[:n, 1:4]


def bg_bwd_pallas(params, encode_a, n_a, act_dtype, pts4, dirs, a,
                  c_density, c_rgb, tile, interpret=False):
    n, n_pad, packed, ops, specs = _prep(params, encode_a, n_a, act_dtype,
                                         pts4, dirs, a, tile)
    cot = jnp.zeros((n_pad, LANE), jnp.float32)
    cot = cot.at[:n, 0:1].set(c_density).at[:n, 1:4].set(c_rgb)
    ops.insert(3, cot)
    specs.insert(3, _row_spec(tile, LANE))

    names = bg_layer_names(encode_a)
    out_specs = [_row_spec(tile, LANE)]
    out_shapes = [jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32)]
    if encode_a:
        _, _, _, _, n_a_pad = _pe_dims(n_a, encode_a)
        out_specs.append(_row_spec(tile, n_a_pad))
        out_shapes.append(jax.ShapeDtypeStruct((n_pad, n_a_pad), jnp.float32))
    for w, b in packed:
        out_specs += [_const_spec(w.shape), _const_spec(b.shape)]
        out_shapes += [jax.ShapeDtypeStruct(w.shape, jnp.float32),
                       jax.ShapeDtypeStruct(b.shape, jnp.float32)]

    kernel = _bwd_kernel_for(encode_a, n_a, act_dtype)
    results = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(*ops)
    din = results[0]
    d_p4 = din[:n, :D_IN]
    d_dirs = din[:n, D_IN:D_IN + 3]
    off = 1
    d_a = None
    if encode_a:
        d_a = results[1][:n, :n_a]
        off = 2
    d_params = {}
    for j, nm in enumerate(names):
        w = params[nm]["w"]
        d_in, d_out = w.shape
        dw_p = results[off + 2 * j]
        db_p = results[off + 2 * j + 1]
        if nm == "pts0":
            dw = dw_p[:d_in, :d_out]
        elif nm == f"pts{SKIPS[0] + 1}":
            d_pe = D_IN * (1 + 2 * MULTIRES)
            dw = jnp.concatenate(
                [dw_p[:d_pe, :d_out], dw_p[LANE:LANE + W, :d_out]], axis=0
            )
        elif nm in ("app0", "views0"):
            d_pe_view = 3 * (1 + 2 * MULTIRES_VIEW)
            segs = [dw_p[:W, :d_out], dw_p[W:W + d_pe_view, :d_out]]
            if nm == "app0":
                segs.append(dw_p[W + LANE:W + LANE + n_a, :d_out])
            dw = jnp.concatenate(segs, axis=0)
        else:
            dw = dw_p[:d_in, :d_out]
        d_params[nm] = {"w": dw, "b": db_p[0, :d_out]}
    return d_params, d_p4, d_dirs, d_a


# --------------------------- custom_vjp API ---------------------------


@lru_cache(maxsize=None)
def _make_bg_custom(encode_a, n_a, act_dtype, tile, interpret):
    @jax.custom_vjp
    def f(params, pts4, dirs, a):
        return bg_fwd_pallas(params, encode_a, n_a, act_dtype, pts4, dirs,
                             a, tile, interpret)

    def fwd(params, pts4, dirs, a):
        return f(params, pts4, dirs, a), (params, pts4, dirs, a)

    def bwd(resid, cots):
        params, pts4, dirs, a = resid
        c_density, c_rgb = cots
        d_params, d_p4, d_dirs, d_a = bg_bwd_pallas(
            params, encode_a, n_a, act_dtype, pts4, dirs, a,
            c_density, c_rgb, tile, interpret,
        )
        if not encode_a:
            d_a = None if a is None else jnp.zeros_like(a)
        return d_params, d_p4, d_dirs, d_a

    f.defvjp(fwd, bwd)
    return f


def nerf_bg_pallas(params, encode_appearance, pts4, view_dirs,
                   a_embedded=None, act_dtype="float32", tile=256,
                   interpret=False):
    """Drop-in for models.nerf_bg.apply_nerf_bg with a fused Pallas
    forward + single-call custom-VJP backward. Differentiable w.r.t.
    params, pts4, view_dirs and a_embedded."""
    n_a = a_embedded.shape[-1] if (encode_appearance and a_embedded
                                   is not None) else 0
    f = _make_bg_custom(bool(encode_appearance), n_a, str(act_dtype),
                        int(tile), bool(interpret))
    a = a_embedded if encode_appearance else None
    density, rgb = f(params, pts4, view_dirs, a)
    return density, rgb
