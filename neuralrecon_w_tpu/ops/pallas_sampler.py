"""Fully-fused NeuS importance sampler as one Pallas TPU kernel.

Step ablation (BENCHMARKS.md) shows the iterative importance sampler —
which runs entirely under stop_gradient — costs ~40 ms of tiny-op VPU
logic plus its SDF evals per training step at batch 8192, dwarfing its
~8 ms of actual MLP math. This kernel fuses the whole sampler per ray
tile: SDF MLP evals (VMEM-resident weights, MXU), the two NeuS
up-sampling rounds (sigmoid-CDF section weights), deterministic
inverse-CDF draws, and the sorted merges — one kernel launch instead of
~100 small XLA ops on (R, ~24) arrays padded to lane 128.

Gradient-free by construction (the torch reference wraps the same logic
in no_grad, reference rendering/renderer.py:458-568), so no custom VJP
is needed. All gathers are expressed as one-hot reductions (row widths
are <= 32, so O(n^2) compares are cheap and Mosaic-safe).

Matches rendering/sampling.py's jnp math exactly; tested in interpret
mode against sparse_sampler's importance stage.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mlp import LANE, _round_up, _sdf_static, pack_sdf_weights


def _mlp_sdf(pe_pad, w_refs, dims, skip, scale, act_dtype=jnp.float32):
    """Padded-PE rows -> SDF values (rows,). Mirrors pallas_mlp's body.
    act_dtype=bfloat16 runs the matmuls at the MXU's native bf16 rate
    (f32 accumulate via preferred_element_type)."""
    n_layers = len(dims) - 1
    inv_sqrt2 = np.float32(1.0 / np.sqrt(2))
    h = pe_pad.astype(act_dtype)
    pe_a = h
    for l in range(n_layers):
        w = w_refs[2 * l][:].astype(act_dtype)
        b = w_refs[2 * l + 1][:]
        if l in skip:
            h = (jnp.concatenate([h, pe_a], axis=-1) * inv_sqrt2).astype(act_dtype)
        z = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if l < n_layers - 1:
            zb = z * 100.0
            h = jnp.where(
                zb > 20.0, z, jnp.log1p(jnp.exp(jnp.minimum(zb, 20.0))) / 100.0
            ).astype(act_dtype)
        else:
            h = z
    return h[:, 0] / scale


def _pe_rows(x, multires, d_pe_pad):
    """(rows, 3) -> (rows, d_pe_pad) padded positional encoding."""
    feats = [x]
    for i in range(multires):
        feats.append(jnp.sin((2.0**i) * x))
        feats.append(jnp.cos((2.0**i) * x))
    pe = jnp.concatenate(feats, axis=-1)
    pad = d_pe_pad - pe.shape[-1]
    return jnp.concatenate(
        [pe, jnp.zeros((pe.shape[0], pad), jnp.float32)], axis=-1
    )


def _cumsum_rows(x):
    """Inclusive row cumsum via a triangular matmul (lax.cumsum has no
    Pallas TPU lowering; n <= 32 so the (n, n) matmul is free)."""
    n = x.shape[-1]
    tri = (jnp.arange(n)[:, None] <= jnp.arange(n)[None, :]).astype(x.dtype)
    return jnp.dot(x, tri, preferred_element_type=jnp.float32)


def _exclusive_cumprod_rows(x):
    """prod_{k<j} x_k for strictly-positive x (cumprod is not lowerable
    on Pallas TPU; exp/log round-trip is exact to f32 for these
    (0, 1+eps]-ranged transmittance factors)."""
    logs = jnp.log(x)
    inclusive = _cumsum_rows(logs)
    return jnp.exp(inclusive - logs)


def _one_hot_gather(values, idx):
    """values (R, n), idx (R, m) -> (R, m) without a gather op."""
    n = values.shape[-1]
    oh = idx[..., :, None] == jnp.arange(n)  # (R, m, n)
    return jnp.sum(jnp.where(oh, values[..., None, :], 0.0), axis=-1)


def _sample_pdf(bins, weights, n_samples: int):
    """Deterministic inverse-CDF (sampling.py:16-49, one-hot gathers)."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    # exclusive-cumsum CDF with the leading zero folded into the
    # triangular matmul (avoids a Mosaic-fragile shifted concat)
    n = pdf.shape[-1]
    tri = (jnp.arange(n)[:, None] < jnp.arange(n + 1)[None, :]).astype(pdf.dtype)
    cdf = jnp.dot(pdf, tri, preferred_element_type=jnp.float32)

    # int iota then cast: Pallas TPU has no float iota
    u = (jnp.arange(n_samples).astype(jnp.float32) + 0.5) / n_samples
    u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))

    inds = jnp.sum(
        (cdf[..., :, None] <= u[..., None, :]).astype(jnp.int32), axis=-2
    )
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_lo = _one_hot_gather(cdf, below)
    cdf_hi = _one_hot_gather(cdf, above)
    nb = bins.shape[-1] - 1
    bins_lo = _one_hot_gather(bins, jnp.minimum(below, nb))
    bins_hi = _one_hot_gather(bins, jnp.minimum(above, nb))

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_lo) / denom
    return bins_lo + t * (bins_hi - bins_lo)


def _up_weights(z_vals, sdf, pts_radius, inv_s: float):
    """Section weights of one NeuS round (sampling.py:52-86)."""
    batch = z_vals.shape[0]
    inside_sphere = (pts_radius[:, :-1] < 1.0) | (pts_radius[:, 1:] < 1.0)
    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
    # right-shift-by-one via roll + first-column mask (shifted concats
    # trip Mosaic layout verification)
    shifted = pltpu.roll(cos_val, shift=1, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, cos_val.shape, 1)
    prev_cos = jnp.where(col == 0, 0.0, shifted)
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside_sphere
    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    # alpha <= 1 by construction; clamp the floor so logs stay finite
    trans = _exclusive_cumprod_rows(jnp.maximum(1.0 - alpha + 1e-7, 1e-30))
    return alpha * trans


def _merge_sorted(a, b, pa=None, pb=None):
    """Sort-free merge (sampling.py merge_sorted, one-hot inversion)."""
    na, nb = a.shape[-1], b.shape[-1]
    n = na + nb
    pos_a = jnp.sum(
        (b[..., None, :] < a[..., :, None]).astype(jnp.int32), axis=-1
    ) + jnp.arange(na)
    pos_b = jnp.sum(
        (a[..., None, :] <= b[..., :, None]).astype(jnp.int32), axis=-1
    ) + jnp.arange(nb)
    perm = jnp.concatenate([pos_a, pos_b], axis=-1)
    oh = perm[..., :, None] == jnp.arange(n)
    inv = jnp.sum(
        oh * jnp.arange(n, dtype=jnp.int32)[..., :, None], axis=-2
    )
    cat = jnp.concatenate([a, b], axis=-1)
    merged = _one_hot_gather(cat, inv)
    if pa is None:
        return merged
    return merged, _one_hot_gather(jnp.concatenate([pa, pb], axis=-1), inv)


# ---------------- column-major (rays-on-lanes) helpers ----------------
#
# The row-major kernel keeps rays on the sublane axis and z-samples on
# the LANE axis — at n <= 32 samples that uses < 25% of the VPU's 128
# lanes, and the O(n^2) one-hot logic dominates the kernel (profiled
# 9.3 ms/step at batch 8192). These mirrors put z on sublanes and a
# full 128-ray tile on lanes; the MLP evals stay row-major by building
# the point rows with a flipped broadcast (no transposes needed).


def _cumsum_cols(x):
    """Inclusive cumsum along axis 0 via a lower-triangular matmul."""
    n = x.shape[0]
    tri = (jnp.arange(n)[:, None] >= jnp.arange(n)[None, :]).astype(x.dtype)
    return jax.lax.dot_general(
        tri, x, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _exclusive_cumprod_cols(x):
    logs = jnp.log(x)
    return jnp.exp(_cumsum_cols(logs) - logs)


def _one_hot_gather_cols(values, idx):
    """values (n, R), idx (m, R) -> (m, R). Statically-unrolled rank-2
    one-hot accumulation: Mosaic has no 3D / axis-0 reductions, and at
    n <= 33 the unrolled (m, R) selects run at full lane width."""
    n = values.shape[0]
    out = jnp.zeros(idx.shape, values.dtype)
    for k in range(n):
        out = out + jnp.where(idx == k, values[k : k + 1, :], 0.0)
    return out


def _sum0(x):
    """sum over axis 0 as a (1, n) @ (n, R) MXU contraction (axis-0
    vector reductions don't lower)."""
    ones = jnp.ones((1, x.shape[0]), x.dtype)
    return jax.lax.dot_general(
        ones, x, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _sample_pdf_cols(bins, weights, n_samples: int):
    """Column mirror of _sample_pdf: bins (n, R), weights (n-?, R)."""
    weights = weights + 1e-5
    pdf = weights / _sum0(weights)
    n = pdf.shape[0]
    # exclusive-cumsum CDF with the leading zero folded in: (n+1, R)
    tri = (jnp.arange(n + 1)[:, None] > jnp.arange(n)[None, :]).astype(pdf.dtype)
    cdf = jax.lax.dot_general(
        tri, pdf, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # int iota then cast: Pallas TPU has no float iota
    u = (jax.lax.broadcasted_iota(jnp.int32, (n_samples, cdf.shape[1]), 0)
         .astype(jnp.float32) + 0.5) / n_samples

    inds = jnp.zeros(u.shape, jnp.int32)
    for k in range(n + 1):
        inds = inds + (cdf[k : k + 1, :] <= u).astype(jnp.int32)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, n)

    cdf_lo = _one_hot_gather_cols(cdf, below)
    cdf_hi = _one_hot_gather_cols(cdf, above)
    nb = bins.shape[0] - 1
    bins_lo = _one_hot_gather_cols(bins, jnp.minimum(below, nb))
    bins_hi = _one_hot_gather_cols(bins, jnp.minimum(above, nb))

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_lo) / denom
    return bins_lo + t * (bins_hi - bins_lo)


def _up_weights_cols(z_vals, sdf, pts_radius, inv_s: float):
    """Column mirror of _up_weights: all inputs (n, R)."""
    inside_sphere = (pts_radius[:-1] < 1.0) | (pts_radius[1:] < 1.0)
    prev_sdf, next_sdf = sdf[:-1], sdf[1:]
    prev_z, next_z = z_vals[:-1], z_vals[1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
    shifted = pltpu.roll(cos_val, shift=1, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, cos_val.shape, 0)
    prev_cos = jnp.where(row == 0, 0.0, shifted)
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside_sphere
    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    trans = _exclusive_cumprod_cols(jnp.maximum(1.0 - alpha + 1e-7, 1e-30))
    return alpha * trans


def _merge_sorted_cols(a, b, pa=None, pb=None):
    """Column mirror of _merge_sorted: a (na, R), b (nb, R). All rank-2
    ops (statically unrolled over the <=33 sample rows)."""
    na, nb = a.shape[0], b.shape[0]
    n = na + nb
    pos_a = jnp.broadcast_to(jnp.arange(na)[:, None], a.shape).astype(jnp.int32)
    for j in range(nb):
        pos_a = pos_a + (b[j : j + 1, :] < a).astype(jnp.int32)
    pos_b = jnp.broadcast_to(jnp.arange(nb)[:, None], b.shape).astype(jnp.int32)
    for j in range(na):
        pos_b = pos_b + (a[j : j + 1, :] <= b).astype(jnp.int32)
    perm = jnp.concatenate([pos_a, pos_b], axis=0)  # (n, R): src -> dst
    # invert the permutation: inv[d, r] = s with perm[s, r] == d
    dst = jax.lax.broadcasted_iota(jnp.int32, perm.shape, 0)
    inv = jnp.zeros(perm.shape, jnp.int32)
    for s in range(n):
        inv = inv + jnp.where(perm[s : s + 1, :] == dst, s, 0)
    cat = jnp.concatenate([a, b], axis=0)
    merged = _one_hot_gather_cols(cat, inv)
    if pa is None:
        return merged
    return merged, _one_hot_gather_cols(jnp.concatenate([pa, pb], axis=0), inv)


def _sampler_kernel_lanes(dims, skip, multires, scale, n_importance,
                          up_steps, s_val_base, act, o_ref, d_ref, z_ref,
                          *refs):
    """Rays-on-lanes variant: all per-ray logic on (n_z, tile) arrays."""
    n_layers = len(dims) - 1
    w_refs = refs[: 2 * n_layers]
    out_ref = refs[2 * n_layers]

    tile = o_ref.shape[0]
    d_pe_pad = _round_up(dims[0], LANE)

    o = o_ref[:, :3]  # (tile, 3)
    d = d_ref[:, :3]
    z_vals = z_ref[:, :].T  # (n0, tile)

    def eval_sdf(z):  # z (s, tile) -> sdf (s, tile)
        s = z.shape[0]
        pts = o[None, :, :] + d[None, :, :] * z[:, :, None]  # (s, tile, 3)
        rows = pts.reshape(-1, 3) * scale
        pe = _pe_rows(rows, multires, d_pe_pad)
        return _mlp_sdf(pe, w_refs, dims, skip, scale, act).reshape(s, tile)

    def radius(z):
        pts = o[None, :, :] + d[None, :, :] * z[:, :, None]
        return jnp.sqrt(jnp.sum(pts * pts, axis=-1))

    sdf = eval_sdf(z_vals)
    n_per = n_importance // up_steps
    for i in range(up_steps):
        w = _up_weights_cols(z_vals, sdf, radius(z_vals),
                             64.0 * 2 ** (s_val_base + i))
        new_z = _sample_pdf_cols(z_vals, w, n_per)
        if i + 1 == up_steps:
            z_vals = _merge_sorted_cols(z_vals, new_z)
        else:
            new_sdf = eval_sdf(new_z)
            z_vals, sdf = _merge_sorted_cols(z_vals, new_z, sdf, new_sdf)

    out_ref[:, :] = z_vals.T


def _sampler_kernel(dims, skip, multires, scale, n_importance, up_steps,
                    s_val_base, act, o_ref, d_ref, z_ref, *refs):
    n_layers = len(dims) - 1
    w_refs = refs[: 2 * n_layers]
    out_ref = refs[2 * n_layers]

    tile = o_ref.shape[0]
    d_pe_pad = _round_up(dims[0], LANE)
    n0 = z_ref.shape[1]

    o = o_ref[:, :3]
    d = d_ref[:, :3]
    z_vals = z_ref[:, :]

    def eval_sdf(z):
        pts = o[:, None, :] + d[:, None, :] * z[..., None]  # (tile, s, 3)
        rows = pts.reshape(-1, 3) * scale
        pe = _pe_rows(rows, multires, d_pe_pad)
        return _mlp_sdf(pe, w_refs, dims, skip, scale, act).reshape(tile, -1)

    def radius(z):
        pts = o[:, None, :] + d[:, None, :] * z[..., None]
        return jnp.sqrt(jnp.sum(pts * pts, axis=-1))

    sdf = eval_sdf(z_vals)
    n_per = n_importance // up_steps
    for i in range(up_steps):
        w = _up_weights(z_vals, sdf, radius(z_vals), 64.0 * 2 ** (s_val_base + i))
        new_z = _sample_pdf(z_vals, w, n_per)
        if i + 1 == up_steps:
            z_vals = _merge_sorted(z_vals, new_z)
        else:
            new_sdf = eval_sdf(new_z)
            z_vals, sdf = _merge_sorted(z_vals, new_z, sdf, new_sdf)

    out_ref[:, :] = z_vals


@lru_cache(maxsize=None)
def _kernel_for(dims, skip, multires, scale, n_importance, up_steps,
                s_val_base, act_dtype, layout="rows"):
    act = jnp.bfloat16 if act_dtype == "bfloat16" else jnp.float32
    body = _sampler_kernel_lanes if layout == "lanes" else _sampler_kernel
    return partial(body, dims, skip, multires, scale,
                   n_importance, up_steps, s_val_base, act)


def fused_importance_sampler(
    params_sdf: dict,
    sdf_cfg_items: tuple,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_base: jnp.ndarray,
    n_importance: int,
    up_steps: int,
    s_val_base: int,
    tile: int = 64,
    interpret: bool = False,
    act_dtype: str = "float32",
    layout: str = "rows",
) -> jnp.ndarray:
    """z_base (R, n0) sorted -> (R, n0 + n_importance) sorted samples.

    rays in unit-sphere coordinates (the sampler's working frame).
    layout="lanes" runs the per-ray VPU logic with rays on the lane
    axis (tile should be 128 there; see _sampler_kernel_lanes)."""
    dims, skip, multires, scale = _sdf_static(sdf_cfg_items)
    r = rays_o.shape[0]
    r_pad = _round_up(max(r, tile), tile)
    n0 = z_base.shape[1]

    def pad_rows(x, width):
        out = jnp.zeros((r_pad, width), jnp.float32)
        return out.at[:r, : x.shape[1]].set(x)

    o_p = pad_rows(rays_o, 128)
    d_p = jnp.zeros((r_pad, 128), jnp.float32)
    # padding rays get d=z-hat so the DDA/geometry math stays finite
    d_p = d_p.at[:, 2].set(1.0).at[:r, :3].set(rays_d)
    z_p = jnp.zeros((r_pad, n0), jnp.float32)
    z_p = z_p.at[:, :].set(
        jnp.broadcast_to(jnp.arange(n0, dtype=jnp.float32)[None, :], (r_pad, n0))
    ).at[:r, :].set(z_base)

    packed = pack_sdf_weights(params_sdf, sdf_cfg_items)
    in_specs = [
        pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, n0), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [o_p, d_p, z_p]
    for w, b in packed:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(w)
        operands.append(b[None, :])

    n_out = n0 + n_importance
    kernel = _kernel_for(tuple(dims), tuple(skip), multires, scale,
                         n_importance, up_steps, s_val_base, act_dtype,
                         layout)
    out = pl.pallas_call(
        kernel,
        grid=(r_pad // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, n_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, n_out), jnp.float32),
        interpret=interpret,
    )(*operands)
    return out[:r]
