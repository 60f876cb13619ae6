"""SDF geometry network: 8x512 weight-normed MLP with skip + geometric init.

Behavioral spec from the reference SDFNetwork
(reference models/neuconw.py:183-296):
  * input xyz -> PE(multires=6, include_input) = 39 dims,
  * skip at layer index 4: the layer *before* the skip shrinks its output
    so that concat([h, pe_input]) is exactly d_hidden wide; the concat is
    divided by sqrt(2),
  * Softplus(beta=100) activations, last layer linear,
  * output channel 0 is the signed distance (divided by ``scale``),
    channels 1: are the 512-d geometry feature,
  * geometric (sphere) initialization so sdf(x) ~ |x| - bias at init,
  * weight norm on every layer.

Gradients: ``sdf_value_feat_grad`` computes (sdf, feat, d sdf/d x) with a
single forward + one reverse pass via jax.vjp, fully differentiable (the
double-backprop the torch reference gets from create_graph=True,
reference models/neuconw.py:284-296, falls out of composing jax.grad).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    pe_dim,
    positional_encoding,
    softplus_beta,
    wn_from_weight,
)


def sdf_layer_dims(cfg) -> list:
    d_pe = pe_dim(cfg["d_in"], cfg["multires"]) if cfg["multires"] > 0 else cfg["d_in"]
    return [d_pe] + [cfg["d_hidden"]] * cfg["n_layers"] + [cfg["d_out"]]


def init_sdf(key, cfg, dtype=jnp.float32):
    """Initialize SDF MLP params: {'lin{i}': {'v','g','b'}}."""
    dims = sdf_layer_dims(cfg)
    skip_in = tuple(cfg["skip_in"])
    n_layers = len(dims) - 1
    bias = float(cfg["bias"])
    inside_outside = bool(cfg["inside_outside"])
    multires = int(cfg["multires"])

    for s in skip_in:
        if dims[s] - dims[0] <= 0:
            raise ValueError(
                f"d_hidden ({dims[s]}) must exceed the PE input width "
                f"({dims[0]}) for the skip concat at layer {s}"
            )

    params = {}
    keys = jax.random.split(key, n_layers)
    for l in range(n_layers):
        d_in = dims[l]
        d_out = dims[l + 1] - dims[0] if (l + 1) in skip_in else dims[l + 1]
        k = keys[l]
        if cfg["geometric_init"]:
            if l == n_layers - 1:
                mean = np.sqrt(np.pi) / np.sqrt(d_in)
                if inside_outside:
                    mean = -mean
                w = mean + 0.0001 * jax.random.normal(k, (d_in, d_out), dtype)
                b = jnp.full((d_out,), bias if inside_outside else -bias, dtype)
            elif multires > 0 and l == 0:
                w = jnp.zeros((d_in, d_out), dtype)
                w = w.at[:3, :].set(
                    jax.random.normal(k, (3, d_out), dtype) * np.sqrt(2) / np.sqrt(d_out)
                )
                b = jnp.zeros((d_out,), dtype)
            elif multires > 0 and l in skip_in:
                w = jax.random.normal(k, (d_in, d_out), dtype) * np.sqrt(2) / np.sqrt(d_out)
                # zero the PE tail of the concatenated skip input (all PE
                # channels beyond raw xyz), reference models/neuconw.py:244-249
                w = w.at[-(dims[0] - 3):, :].set(0.0)
                b = jnp.zeros((d_out,), dtype)
            else:
                w = jax.random.normal(k, (d_in, d_out), dtype) * np.sqrt(2) / np.sqrt(d_out)
                b = jnp.zeros((d_out,), dtype)
        else:
            bound = 1.0 / np.sqrt(d_in)
            kw, kb = jax.random.split(k)
            w = jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound)
            b = jax.random.uniform(kb, (d_out,), dtype, -bound, bound)
        params[f"lin{l}"] = wn_from_weight(w, b) if cfg["weight_norm"] else {"w": w, "b": b}
    return params


def _layer_weight(p):
    if "v" in p:
        norm = jnp.linalg.norm(p["v"], axis=0, keepdims=True)
        return p["v"] * (p["g"][None, :] / jnp.maximum(norm, 1e-12))
    return p["w"]


def apply_sdf_split(params, cfg, x: jnp.ndarray, act_dtype=jnp.float32,
                    with_feature: bool = True):
    """SDF forward with split outputs: (..., 3) -> (sdf (..., 1),
    feature (..., d_out-1) or None).

    act_dtype: dtype the hidden activations flow in. bfloat16 halves the
    dominant HBM traffic of training (activations stored for backward);
    weights stay f32 and are cast per-matmul, so weight-norm precision
    is unaffected. The sdf output is always f32 (it feeds compositing /
    eikonal math); the feature output stays in act_dtype — its only
    consumer is the color head, which runs in act_dtype anyway, so an
    f32 round-trip would be pure HBM traffic in both the forward and
    the cotangent chain (bf16->f32->bf16 is value-exact; dtype-bytes
    audit: scripts/exp_dtype_audit.py).
    """
    dims = sdf_layer_dims(cfg)
    skip_in = tuple(cfg["skip_in"])
    n_layers = len(dims) - 1
    scale = float(cfg["scale"])

    x = x * scale
    shape = x.shape[:-1]
    x = x.reshape(-1, cfg["d_in"])
    inputs = positional_encoding(x, cfg["multires"]) if cfg["multires"] > 0 else x
    inputs = inputs.astype(act_dtype)

    h = inputs
    inv_sqrt2 = np.asarray(1.0 / np.sqrt(2), act_dtype)
    for l in range(n_layers - 1):
        p = params[f"lin{l}"]
        w = _layer_weight(p).astype(act_dtype)
        if l in skip_in:
            # skip concat [h, pe]/sqrt(2) feeds this layer: run it as
            # two row-block GEMMs instead of materializing the 640-wide
            # concat (same rewrite as layers.apply_linear_parts; the
            # 1/sqrt(2) distributes over the sum)
            d_h = h.shape[-1]
            h = (h @ w[:d_h] + inputs @ w[d_h:]) * inv_sqrt2 + p["b"].astype(act_dtype)
        else:
            h = h @ w + p["b"].astype(act_dtype)
        h = softplus_beta(h, 100.0)
    # last layer split by OUTPUT column blocks: [sdf | feature]. The
    # fused 513-wide output forces a d_out-wide materialization plus a
    # profiled 1.2 ms/step re-tiling slice downstream; two GEMMs emit
    # the consumers' shapes directly (and sdf-only sweeps skip the
    # feature GEMM entirely).
    p = params[f"lin{n_layers - 1}"]
    w = _layer_weight(p).astype(act_dtype)
    b = p["b"].astype(act_dtype)
    sdf = (h @ w[:, :1] + b[:1]).astype(jnp.float32) / scale
    feat = None
    if with_feature:
        feat = h @ w[:, 1:] + b[1:]
    return sdf.reshape(*shape, 1), (
        feat.reshape(*shape, dims[-1] - 1) if with_feature else None
    )


def apply_sdf(params, cfg, x: jnp.ndarray, act_dtype=jnp.float32) -> jnp.ndarray:
    """Full SDF forward: (..., 3) -> (..., d_out) = [sdf | feature]
    (concat convenience wrapper over apply_sdf_split; hot paths consume
    the split outputs directly)."""
    sdf, feat = apply_sdf_split(params, cfg, x, act_dtype)
    return jnp.concatenate([sdf, feat.astype(sdf.dtype)], axis=-1)


def sdf_value(params, cfg, x: jnp.ndarray, act_dtype=jnp.float32) -> jnp.ndarray:
    """Signed distance only: (..., 3) -> (...,). Skips the feature-head
    GEMM entirely (refresh / mesh-extraction / sampler sweeps)."""
    sdf, _ = apply_sdf_split(params, cfg, x, act_dtype, with_feature=False)
    return sdf[..., 0]


def sdf_value_feat_grad(params, cfg, x: jnp.ndarray, act_dtype=jnp.float32):
    """(sdf, feature, grad) in one forward + one reverse pass.

    Returns sdf (...,), feat (..., d_out-1), grad (..., 3). Differentiable
    w.r.t. params and x (higher-order AD for the eikonal term)."""
    (sdf, feat), pullback = jax.vjp(
        lambda pts: apply_sdf_split(params, cfg, pts, act_dtype), x
    )
    (grad,) = pullback((jnp.ones_like(sdf), jnp.zeros_like(feat)))
    return sdf[..., 0], feat, grad


def sdf_value_feat_grad_fwdmode(params, cfg, x: jnp.ndarray):
    """(sdf, feature, grad) via forward-mode: one primal evaluation +
    three linearized tangent passes (jax.linearize). The training
    backward then differentiates reverse-over-forward, which can have a
    cheaper AD structure than the double-reverse of the vjp variant for
    the eikonal term. Numerically identical to sdf_value_feat_grad."""
    out, lin = jax.linearize(lambda pts: apply_sdf(params, cfg, pts), x)
    zeros = jnp.zeros_like(x)
    grad = jnp.stack(
        [lin(zeros.at[..., i].set(1.0))[..., 0] for i in range(3)], axis=-1
    )
    return out[..., 0], out[..., 1:], grad


def sdf_grad(params, cfg, x: jnp.ndarray) -> jnp.ndarray:
    """d sdf / d x, shape (..., 3)."""
    return sdf_value_feat_grad(params, cfg, x)[2]
