"""Background NeRF (NeRF++ inverted-sphere parameterization).

Behavioral spec from the reference NeRF (reference models/nerf.py:86-182),
as constructed by the training system (reference
lightning_modules/neuconw_system.py:90-103): D=8, W=256, d_in=4
(unit-sphere xyz + 1/r), PE multires 10 / view 4, skip after layer 4
(concat [pe_input, h] AFTER that layer's ReLU), use_viewdirs=True,
appearance head = MLP([feature(256), PE(view)(27), a(48)] -> 128 x4) -> rgb.
Plain (torch-default) linear init throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import (
    apply_linear,
    apply_linear_parts,
    init_linear,
    pe_dim,
    positional_encoding,
)

D = 8
W = 256
SKIPS = (4,)


def init_nerf_bg(key, encode_appearance: bool, in_channels_a: int = 48, dtype=jnp.float32):
    d_pe = pe_dim(4, 10)
    d_pe_view = pe_dim(3, 4)
    keys = jax.random.split(key, D + 8)
    params = {}
    params["pts0"] = init_linear(keys[0], d_pe, W, dtype)
    for i in range(1, D):
        d_in = W + d_pe if (i - 1) in SKIPS else W
        params[f"pts{i}"] = init_linear(keys[i], d_in, W, dtype)
    params["alpha"] = init_linear(keys[D], W, 1, dtype)
    params["feature"] = init_linear(keys[D + 1], W, W, dtype)
    if encode_appearance:
        params["app0"] = init_linear(keys[D + 2], W + d_pe_view + in_channels_a, W // 2, dtype)
        for s in range(1, D // 2):
            params[f"app{s}"] = init_linear(keys[D + 2 + s], W // 2, W // 2, dtype)
    else:
        params["views0"] = init_linear(keys[D + 2], W + d_pe_view, W // 2, dtype)
    params["rgb"] = init_linear(keys[D + 7], W // 2, 3, dtype)
    return params


def apply_nerf_bg(params, encode_appearance: bool, pts4, view_dirs,
                  a_embedded=None, act_dtype=None, n_samples=None):
    """pts4 (N, 4) = [xyz/r, 1/r]; returns (density (N,1), rgb (N,3)).

    act_dtype: optional hidden-activation dtype (see models/sdf.py);
    outputs are cast back to f32. n_samples: view_dirs / a_embedded are
    per-ray (N // n_samples, ·) — their appearance-head contribution is
    computed at ray granularity (see models/color.py)."""
    if act_dtype is not None and act_dtype != jnp.float32:
        params = jax.tree.map(lambda l: l.astype(act_dtype), params)
        pts4 = pts4.astype(act_dtype)
        view_dirs = view_dirs.astype(act_dtype)
        if a_embedded is not None:
            a_embedded = a_embedded.astype(act_dtype)
    pe = positional_encoding(pts4, 10)
    pe_view = positional_encoding(view_dirs, 4)

    h = pe
    skipped = False
    for i in range(D):
        if skipped:
            # nerf-pytorch skip: concat [pe, h] feeds this layer; run it
            # as two row-block GEMMs instead of materializing the concat
            h = jax.nn.relu(apply_linear_parts(params[f"pts{i}"], (pe, h)))
        else:
            h = jax.nn.relu(apply_linear(params[f"pts{i}"], h))
        skipped = i in SKIPS

    alpha = apply_linear(params["alpha"], h)
    feature = apply_linear(params["feature"], h)

    def head(p, ray_parts):
        # per-sample feature contribution + per-ray (view, a) part
        # broadcast after its R-row GEMM
        w = p["w"]
        d_f = feature.shape[-1]
        z = feature @ w[:d_f]
        if n_samples is None:
            z = z + apply_linear_parts({"w": w[d_f:], "b": p["b"]}, ray_parts)
        else:
            z_ray = apply_linear_parts({"w": w[d_f:], "b": p["b"]}, ray_parts)
            z = (z.reshape(-1, n_samples, z.shape[-1])
                 + z_ray[:, None, :]).reshape(z.shape)
        return jax.nn.relu(z)

    if encode_appearance:
        h = head(params["app0"], (pe_view, a_embedded))
        for s in range(1, D // 2):
            h = jax.nn.relu(apply_linear(params[f"app{s}"], h))
    else:
        h = head(params["views0"], (pe_view,))
    rgb = apply_linear(params["rgb"], h)
    return alpha.astype(jnp.float32), rgb.astype(jnp.float32)
