"""Shared building blocks: positional encoding, (weight-normed) linear layers.

Pure functions over explicit parameter pytrees — no module framework. All
layers store weights as (d_in, d_out) so application is ``x @ w + b``
(row-major, MXU-friendly).

Weight normalization is stored factorized (v, g) and re-materialized per
application: ``w = v * (g / ||v||_col)`` with the norm taken over the
input axis per output unit — equivalent to torch's
``nn.utils.weight_norm(lin)`` with dim=0 on a (d_out, d_in) weight
(reference models/neuconw.py:256-257).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def positional_encoding(x: jnp.ndarray, n_freqs: int, include_input: bool = True) -> jnp.ndarray:
    """NeRF positional encoding.

    Layout: [x, sin(2^0 x), cos(2^0 x), ..., sin(2^{n-1} x), cos(2^{n-1} x)]
    over the last axis — matching the reference Embedder's fn order
    (reference models/neuconw.py:12-37).
    """
    if n_freqs <= 0:
        return x
    feats = [x] if include_input else []
    for i in range(n_freqs):
        freq = jnp.asarray(2.0**i, dtype=x.dtype)
        feats.append(jnp.sin(x * freq))
        feats.append(jnp.cos(x * freq))
    return jnp.concatenate(feats, axis=-1)


def pe_dim(d_in: int, n_freqs: int, include_input: bool = True) -> int:
    return d_in * ((1 if include_input else 0) + 2 * n_freqs)


# --------------------------- plain linear ---------------------------


def init_linear(key, d_in: int, d_out: int, dtype=jnp.float32):
    """Torch-default Linear init: U(-1/sqrt(d_in), 1/sqrt(d_in)) for both
    weight and bias (kaiming_uniform(a=sqrt(5)) reduces to this bound)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(d_in)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (d_out,), dtype, -bound, bound),
    }


def apply_linear(p, x):
    return x @ p["w"] + p["b"]


# ------------------------ weight-normed linear ------------------------


def wn_from_weight(w: jnp.ndarray, b: jnp.ndarray):
    """Factorize an explicit (d_in, d_out) weight into weight-norm params.

    At init the effective weight equals ``w`` exactly (g = column norm)."""
    g = jnp.linalg.norm(w, axis=0)
    return {"v": w, "g": g, "b": b}


def init_wn_linear(key, d_in: int, d_out: int, dtype=jnp.float32):
    p = init_linear(key, d_in, d_out, dtype)
    return wn_from_weight(p["w"], p["b"])


def wn_weight(p):
    norm = jnp.linalg.norm(p["v"], axis=0, keepdims=True)
    return p["v"] * (p["g"][None, :] / jnp.maximum(norm, 1e-12))


def apply_wn_linear(p, x):
    return x @ wn_weight(p) + p["b"]


def apply_linear_parts(p, parts):
    """Linear layer over concat(parts, axis=-1) WITHOUT materializing
    the concatenation: row-block partial GEMMs summed. XLA does not do
    this rewrite itself, and the materialized concat of a wide GEMM
    input is a measurable HBM cost (profiled 2.2 ms/step on the bg-NeRF
    appearance head at batch 8192, BENCHMARKS.md). Supports plain and
    weight-normed params; numerically equal to the concat form up to
    f32 summation order."""
    w = wn_weight(p) if "v" in p else p["w"]
    acc = p["b"]
    off = 0
    for x in parts:
        k = x.shape[-1]
        acc = acc + x @ w[off:off + k]
        off += k
    assert off == w.shape[0], (off, w.shape)
    return acc


# ------------------------------ misc ------------------------------


@partial(jax.custom_jvp, nondiff_argnums=(1,))
def softplus_beta(x: jnp.ndarray, beta: float = 100.0) -> jnp.ndarray:
    """Numerically-stable softplus with sharpness beta (SDF activation,
    reference models/neuconw.py:261).

    The derivative is declared in terms of the OUTPUT:
    sigma(beta*x) = 1 - exp(-beta*y) = -expm1(-beta*y). The post-
    activation y is a stored residual anyway (it is the next layer's
    GEMM input and the dW contraction operand), so autodiff never needs
    to keep the pre-activation alive for the backward — one less
    (N, width) residual per layer in the HBM-bound training step.
    -expm1 keeps full accuracy where 1-exp cancels (beta*y -> 0);
    identical values, derivative exact in infinite precision and within
    one ulp of sigmoid(beta*x) in f32.
    """
    return jnp.logaddexp(x * beta, 0.0) / beta


@softplus_beta.defjvp
def _softplus_beta_jvp(beta, primals, tangents):
    (x,), (t,) = primals, tangents
    y = jnp.logaddexp(x * beta, 0.0) / beta
    return y, t * (-jnp.expm1(-beta * y))
