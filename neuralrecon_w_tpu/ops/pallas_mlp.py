"""Fused SDF-MLP forward as a Pallas TPU kernel.

The gradient-free SDF evaluations dominate three paths: the iterative
importance sampler (2 extra sweeps per train step, under stop_gradient,
reference rendering/renderer.py:517-540), the periodic surface
refinement over millions of voxels (reference
lightning_modules/neuconw_system.py:186-266), and mesh-extraction grid
sweeps. For all of them this kernel keeps the entire weight set
(~8.5 MB for the production 8x512 net) resident in VMEM and streams
point blocks through the whole MLP — one HBM round-trip per block
instead of one per layer.

Design notes (see /opt/skills/guides/pallas_guide.md):
  * effective (weight-normed) weights are materialized outside the
    kernel (cheap: O(params)) and zero-padded to lane width 128,
  * the positional encoding is computed in-kernel on the VPU, written
    into a 128-wide zero-padded input tile that matches the padded
    first-layer weight,
  * the skip concat divides by sqrt(2) and re-uses the PE tile,
  * every matmul sets preferred_element_type=f32 for the MXU,
  * the grid loops over point tiles; weights use constant index maps so
    Mosaic keeps a single VMEM copy across grid steps.

Falls back transparently to the jnp path off-TPU (interpret mode in
tests).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _effective_weight(p):
    if "v" in p:
        norm = jnp.linalg.norm(p["v"], axis=0, keepdims=True)
        return p["v"] * (p["g"][None, :] / jnp.maximum(norm, 1e-12))
    return p["w"]


@lru_cache(maxsize=None)
def _sdf_static(sdf_cfg_items: tuple):
    """Static layer geometry for the kernel, derived from SDF_CONFIG."""
    cfg = dict(sdf_cfg_items)
    from ..models.layers import pe_dim

    d_pe = pe_dim(cfg["d_in"], cfg["multires"]) if cfg["multires"] > 0 else cfg["d_in"]
    dims = [d_pe] + [cfg["d_hidden"]] * cfg["n_layers"] + [cfg["d_out"]]
    skip = tuple(cfg["skip_in"])
    return dims, skip, int(cfg["multires"]), float(cfg["scale"])


def pack_sdf_weights(params_sdf: dict, sdf_cfg_items: tuple):
    """Materialize + pad the effective weights for the kernel.

    Returns a list of (w_padded, b_padded) with input dims padded to the
    layer's expected padded width and output dims padded to 128.
    """
    dims, skip, multires, scale = _sdf_static(sdf_cfg_items)
    n_layers = len(dims) - 1
    d_pe_pad = _round_up(dims[0], LANE)

    packed = []
    for l in range(n_layers):
        p = params_sdf[f"lin{l}"]
        w = _effective_weight(p)
        b = p["b"]
        d_in, d_out = w.shape
        if l in skip:
            # the pre-skip layer shrinks its output to dims[l] - dims[0]
            # (models/sdf.py:53), so this weight's rows are
            # [h (dims[l]-dims[0]) | pe (dims[0])]; pad each part
            d_h = dims[l] - dims[0]
            in_pad = _round_up(d_h, LANE) + d_pe_pad
            w_p = jnp.zeros((in_pad, _round_up(d_out, LANE)), w.dtype)
            w_p = w_p.at[:d_h, :d_out].set(w[:d_h])
            w_p = w_p.at[_round_up(d_h, LANE):_round_up(d_h, LANE) + dims[0], :d_out].set(
                w[d_h:]
            )
        else:
            in_pad = d_pe_pad if l == 0 else _round_up(d_in, LANE)
            w_p = jnp.zeros((in_pad, _round_up(d_out, LANE)), w.dtype)
            w_p = w_p.at[:d_in, :d_out].set(w)
        b_p = jnp.zeros((_round_up(d_out, LANE),), b.dtype).at[:d_out].set(b)
        packed.append((w_p, b_p))
    return packed


def fused_sdf_head(params_sdf: dict, sdf_cfg_items: tuple, pts: jnp.ndarray,
                   tile: int = 1024, interpret: bool = False) -> jnp.ndarray:
    """SDF at (N, 3) points via the fused kernel. N must be a multiple
    of `tile`. Returns (N,) float32 (channel 0 of the padded head)."""
    dims, skip, multires, scale = _sdf_static(sdf_cfg_items)
    n = pts.shape[0]
    assert n % tile == 0, (n, tile)
    packed = pack_sdf_weights(params_sdf, sdf_cfg_items)

    n_layers = len(dims) - 1
    grid = (n // tile,)

    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [jnp.array([[n]], jnp.int32)]
    pts_pad = jnp.zeros((n, 128), jnp.float32).at[:, :3].set(pts)
    operands.append(pts_pad)
    for w, b in packed:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(w)
        operands.append(b[None, :])

    kernel = partial(_kernel_entry, tuple(dims), tuple(skip), multires, scale)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, LANE), jnp.float32),
        interpret=interpret,
    )(*operands)
    return out[:, 0]


def _kernel_entry(dims, skip, multires, scale, n_ref, pts_ref, *refs):
    n_layers = len(dims) - 1
    w_refs = refs[: 2 * n_layers]
    out_ref = refs[2 * n_layers]

    tile = pts_ref.shape[0]
    d_pe_pad = _round_up(dims[0], LANE)

    x = pts_ref[:, :3] * scale

    feats = [x]
    for i in range(multires):
        feats.append(jnp.sin((2.0**i) * x))
        feats.append(jnp.cos((2.0**i) * x))
    pe = jnp.concatenate(feats, axis=-1)
    pad_cols = d_pe_pad - pe.shape[1]
    pe_pad = jnp.concatenate(
        [pe, jnp.zeros((tile, pad_cols), jnp.float32)], axis=-1
    )

    inv_sqrt2 = np.float32(1.0 / np.sqrt(2))
    h = pe_pad
    for l in range(n_layers):
        w = w_refs[2 * l][:]
        b = w_refs[2 * l + 1][:]
        if l in skip:
            h = jnp.concatenate([h, pe_pad], axis=-1) * inv_sqrt2
        z = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if l < n_layers - 1:
            zb = z * 100.0
            h = jnp.where(
                zb > 20.0, z, jnp.log1p(jnp.exp(jnp.minimum(zb, 20.0))) / 100.0
            )
        else:
            h = z
    first_col = jax.lax.broadcasted_iota(jnp.int32, (tile, LANE), 1) == 0
    out_ref[:, :] = jnp.where(first_col, h[:, :LANE] / scale, h[:, :LANE])


def supports_fused(fc) -> bool:
    """The kernel handles any multires/skip config whose hidden width
    exceeds the PE width (same constraint as init_sdf)."""
    cfg = fc.sdf_cfg
    return cfg.get("d_in", 3) == 3 and cfg["d_hidden"] >= 64


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def fused_field_sdf(params, fc, pts: jnp.ndarray, tile: int = 1024,
                    interpret: bool = False) -> jnp.ndarray:
    """Drop-in for models.neuconw.field_sdf on the gradient-free paths:
    (..., 3) -> (...) via the fused kernel, padding to the tile size."""
    shape = pts.shape[:-1]
    flat = pts.reshape(-1, 3)
    n = flat.shape[0]
    n_pad = _round_up(max(n, tile), tile)
    if n_pad != n:
        flat = jnp.concatenate(
            [flat, jnp.zeros((n_pad - n, 3), flat.dtype)], axis=0
        )
    out = fused_sdf_head(
        params["neuconw"]["sdf"], fc.sdf, flat, tile=tile, interpret=interpret
    )
    return out[:n].reshape(shape)
