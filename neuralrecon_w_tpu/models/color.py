"""IDR-style radiance (color) network with NeRF-W appearance head.

Behavioral spec from the reference RenderingNetwork
(reference models/neuconw.py:59-170), encode_apperence=True, mode="idr":
  * static head: xyz_encoding_final = Linear(512, 512) over the geometry
    feature; dir_encoding = MLP([512 + PE(view,27) + a(48)] -> 128 -> 128)
    with ReLU (static_head_layers=2); both plain (un-normed) linears,
  * main branch input = [points(3), normals(3), dir_encoding(128)] = 134
    -> 4 hidden x 256 -> 3, weight-normed, ReLU between, sigmoid output.
Without appearance encoding the main branch consumes
[points, PE(view), normals, feature] directly (indoor variant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import (
    apply_linear,
    apply_linear_parts,
    apply_wn_linear,
    init_linear,
    init_wn_linear,
    pe_dim,
    positional_encoding,
)


def color_dims(cfg, in_channels_a: int, encode_a: bool):
    d_view_pe = pe_dim(3, cfg["multires_view"]) if cfg["multires_view"] > 0 else 3
    if encode_a:
        d0 = cfg["d_in"] + cfg["head_channels"] - 3
    else:
        d0 = cfg["d_in"] + cfg["d_feature"] + (d_view_pe - 3 if cfg["multires_view"] > 0 else 0)
    dims = [d0] + [cfg["d_hidden"]] * cfg["n_layers"] + [cfg["d_out"]]
    d_head_in = cfg["d_feature"] + in_channels_a + d_view_pe
    return dims, d_head_in, d_view_pe


def init_color(key, cfg, in_channels_a: int, encode_a: bool, dtype=jnp.float32):
    dims, d_head_in, _ = color_dims(cfg, in_channels_a, encode_a)
    n_layers = len(dims) - 1
    keys = jax.random.split(key, n_layers + cfg["static_head_layers"] + 1)
    init_main = init_wn_linear if cfg["weight_norm"] else init_linear

    params = {}
    for l in range(n_layers):
        params[f"lin{l}"] = init_main(keys[l], dims[l], dims[l + 1], dtype)
    if encode_a:
        params["xyz_final"] = init_linear(keys[n_layers], cfg["d_feature"], cfg["d_feature"], dtype)
        params["static0"] = init_linear(keys[n_layers + 1], d_head_in, cfg["head_channels"], dtype)
        for s in range(1, cfg["static_head_layers"]):
            params[f"static{s}"] = init_linear(
                keys[n_layers + 1 + s], cfg["head_channels"], cfg["head_channels"], dtype
            )
    return params


def apply_color(params, cfg, encode_a: bool, points, normals, view_dirs, feature, a_embedded=None, act_dtype=None, n_samples=None):
    """All inputs (N, d); returns rgb (N, 3) in [0, 1]. act_dtype casts
    the hidden activations (see models/sdf.py).

    n_samples: when set, view_dirs and a_embedded are PER-RAY
    (N // n_samples, d) — their static-head GEMM contribution is
    computed at ray granularity and broadcast, instead of broadcasting
    the inputs to every sample first (the broadcasts are pure HBM cost
    and the per-ray GEMM is n_samples x smaller)."""
    import jax.numpy as _jnp

    if act_dtype is not None and act_dtype != _jnp.float32:
        cast = lambda t: None if t is None else t.astype(act_dtype)
        points, normals, view_dirs = cast(points), cast(normals), cast(view_dirs)
        feature, a_embedded = cast(feature), cast(a_embedded)
        params = __import__("jax").tree.map(lambda l: l.astype(act_dtype), params)
    apply_main = apply_wn_linear if cfg["weight_norm"] else apply_linear
    n_layers = cfg["n_layers"] + 1

    if cfg["multires_view"] > 0:
        view_dirs = positional_encoding(view_dirs, cfg["multires_view"])

    if encode_a:
        xyz_final = apply_linear(params["xyz_final"], feature)
        # concat-fed layers run as row-block partial GEMMs (see
        # apply_linear_parts) — the materialized concats are pure HBM
        # cost at training batch sizes
        if n_samples is not None:
            # per-ray (view, a) contribution computed once per ray
            p0 = params["static0"]
            w = p0["w"] if "w" in p0 else None
            assert w is not None, "static head layers are plain linears"
            d_f = xyz_final.shape[-1]
            z_pt = xyz_final @ w[:d_f]
            z_ray = apply_linear_parts(
                {"w": w[d_f:], "b": p0["b"]}, (view_dirs, a_embedded)
            )
            z = (z_pt.reshape(-1, n_samples, z_pt.shape[-1])
                 + z_ray[:, None, :]).reshape(z_pt.shape)
            h = jax.nn.relu(z)
        else:
            h = jax.nn.relu(
                apply_linear_parts(params["static0"], (xyz_final, view_dirs, a_embedded))
            )
        for s in range(1, cfg["static_head_layers"]):
            h = jax.nn.relu(apply_linear(params[f"static{s}"], h))
        first_parts = (points, normals, h)
    else:
        if n_samples is not None:
            # no static head to ride: broadcast per-ray inputs up front
            def up(t):
                return jnp.broadcast_to(
                    t[:, None, :], (t.shape[0], n_samples, t.shape[-1])
                ).reshape(-1, t.shape[-1])

            view_dirs = up(view_dirs)
            if a_embedded is not None:
                a_embedded = up(a_embedded)
        if cfg["mode"] == "idr":
            first_parts = (points, view_dirs, normals, feature)
        elif cfg["mode"] == "no_view_dir":
            first_parts = (points, normals, feature)
        else:  # no_normal
            first_parts = (points, view_dirs, feature)

    x = apply_linear_parts(params["lin0"], first_parts)
    for l in range(1, n_layers):
        x = jax.nn.relu(x)
        x = apply_main(params[f"lin{l}"], x)
    return jax.nn.sigmoid(x.astype(jnp.float32))
