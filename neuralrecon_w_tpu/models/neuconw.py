"""The complete NeuconW field: SDF + color + variance + appearance + bg NeRF.

Parameter pytree layout (checkpoint schema):
  params = {
    "embedding_a": (N_VOCAB, N_A),          # NeRF-W appearance table
    "neuconw": {"sdf": ..., "color": ..., "variance": scalar},
    "nerf_bg": {...},
  }
Mirrors the reference module split so name-prefix checkpoint surgery has a
direct equivalent (reference utils/__init__.py:64-99, models named
embedding_a / neuconw / nerf at lightning_modules/neuconw_system.py:74-135).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .color import apply_color, init_color
from .nerf_bg import apply_nerf_bg, init_nerf_bg
from .sdf import (
    init_sdf,
    sdf_value,
    sdf_value_feat_grad,
    sdf_value_feat_grad_fwdmode,
)


class FieldConfig(NamedTuple):
    """Static model hyperparameters (hashable; safe as a jit closure)."""

    sdf: tuple  # sorted (key, value) items of SDF_CONFIG
    color: tuple  # sorted items of COLOR_CONFIG
    s_init: float
    n_vocab: int
    n_a: int
    encode_a: bool
    encode_a_bg: bool
    # 'vjp' (one fused reverse pass) or 'fwd' (linearize + 3 tangents)
    # for the per-sample SDF gradients; numerically identical
    grad_mode: str = "vjp"
    # 'float32' | 'bfloat16' — dtype the hidden activations flow in
    # (weights stay f32; halves the HBM-bound activation traffic)
    act_dtype: str = "float32"
    # 'xla' | 'pallas' — background-NeRF evaluation path; 'pallas' is
    # the fused forward + single-call custom-VJP kernel
    # (ops/pallas_nerf_bg.py)
    bg_mode: str = "xla"
    # point-tile override for the fused field kernels (-1 = per-width
    # defaults measured in ops/pallas_field_vjp.py); larger tiles give
    # better MXU pipelining but need a raised
    # --xla_tpu_scoped_vmem_limit_kib to fit the recompute stacks
    kernel_tile: int = -1

    @property
    def sdf_cfg(self) -> dict:
        return dict(self.sdf)

    @property
    def color_cfg(self) -> dict:
        return dict(self.color)


def field_config_from_cfg(cfg) -> FieldConfig:
    """Build a FieldConfig from the NEUCONW config node."""
    n = cfg.NEUCONW
    fused_bg = getattr(cfg.TPU, "FUSED_BG", False)
    if fused_bg == "auto":
        from ..ops.pallas_mlp import on_tpu

        fused_bg = on_tpu()
    return FieldConfig(
        sdf=tuple(sorted(dict(n.SDF_CONFIG).items())),
        color=tuple(sorted(dict(n.COLOR_CONFIG).items())),
        s_init=float(n.S_CONFIG.init_val),
        n_vocab=int(n.N_VOCAB),
        n_a=int(n.N_A),
        encode_a=bool(n.ENCODE_A),
        encode_a_bg=bool(n.ENCODE_A_BG),
        grad_mode=str(getattr(cfg.TPU, "SDF_GRAD_MODE", "vjp")),
        act_dtype=str(getattr(cfg.TPU, "FIELD_DTYPE", "float32")),
        bg_mode="pallas" if fused_bg else "xla",
        kernel_tile=int(getattr(cfg.TPU, "KERNEL_TILE", -1)),
    )


def init_field(key, fc: FieldConfig, dtype=jnp.float32):
    k_emb, k_sdf, k_color, k_bg = jax.random.split(key, 4)
    return {
        "embedding_a": jax.random.normal(k_emb, (fc.n_vocab, fc.n_a), dtype),
        "neuconw": {
            "sdf": init_sdf(k_sdf, fc.sdf_cfg, dtype),
            "color": init_color(k_color, fc.color_cfg, fc.n_a, fc.encode_a, dtype),
            "variance": jnp.asarray(fc.s_init, dtype),
        },
        "nerf_bg": init_nerf_bg(k_bg, fc.encode_a_bg, fc.n_a, dtype),
    }


def inv_s(params) -> jnp.ndarray:
    """Learned inverse standard deviation, exp(10 * variance), clamped
    (reference models/neuconw.py:179, 363-367)."""
    return jnp.clip(jnp.exp(params["neuconw"]["variance"] * 10.0), 1e-6, 1e6)


def _act(fc) -> jnp.dtype:
    return jnp.bfloat16 if fc.act_dtype == "bfloat16" else jnp.float32


def field_sdf(params, fc: FieldConfig, pts: jnp.ndarray) -> jnp.ndarray:
    """SDF probe, (..., 3) -> (...,). Mesh/octree sweeps use this."""
    return sdf_value(params["neuconw"]["sdf"], fc.sdf_cfg, pts, _act(fc))


def field_forward(params, fc: FieldConfig, pts, dirs, a_embedded,
                  n_samples=None):
    """Foreground field evaluation at flattened sample points.

    Args:
        pts: (N, 3); dirs, a_embedded: (N, ·), or (N // n_samples, ·)
            PER-RAY when n_samples is set (they are constant along a
            ray — the color head then computes their contribution at
            ray granularity, see models/color.py).
    Returns:
        rgb (N, 3), inv_s scalar, sdf (N,), gradients (N, 3).
    Matches NeuconW.forward semantics (reference models/neuconw.py:339-376)
    with the gradient from one fused vjp instead of a second autograd pass.
    """
    sdf_cfg = fc.sdf_cfg
    if n_samples is not None and fc.grad_mode == "pallas_field":
        # the fused kernel consumes flat per-sample inputs
        def up(t):
            return jnp.broadcast_to(
                t[:, None, :], (t.shape[0], n_samples, t.shape[-1])
            ).reshape(-1, t.shape[-1])

        dirs, a_embedded, n_samples = up(dirs), up(a_embedded), None
    if fc.grad_mode == "pallas_field":
        # fully-fused field: SDF + gradient + color head, forward AND
        # backward as Pallas kernels (ops/pallas_field_train.py)
        from ..ops.pallas_field_train import field_rgb_sdf_grad_pallas

        rgb, sdf, grad = field_rgb_sdf_grad_pallas(
            params, fc, pts, dirs, a_embedded,
            **({"tile": fc.kernel_tile} if fc.kernel_tile > 0 else {}),
        )
        return rgb, inv_s(params), sdf, grad
    if fc.grad_mode == "fwd":
        sdf, feat, grad = sdf_value_feat_grad_fwdmode(
            params["neuconw"]["sdf"], sdf_cfg, pts
        )
    elif fc.grad_mode in ("pallas", "pallas_hybrid"):
        # fused forward/backward kernels with the hand-derived VJP
        # (ops/pallas_field_vjp.py) — activations never leave VMEM.
        # "pallas_hybrid" keeps the primal in XLA (fusable into the
        # color head) and uses the kernel only for the backward.
        from ..ops.pallas_field_vjp import sdf_value_feat_grad_pallas

        sdf, feat, grad = sdf_value_feat_grad_pallas(
            params["neuconw"]["sdf"], sdf_cfg, pts, act_dtype=fc.act_dtype,
            fwd_impl="xla" if fc.grad_mode == "pallas_hybrid" else "pallas",
            **({"tile": fc.kernel_tile} if fc.kernel_tile > 0 else {}),
        )
    else:
        sdf, feat, grad = sdf_value_feat_grad(
            params["neuconw"]["sdf"], sdf_cfg, pts, _act(fc)
        )
    rgb = apply_color(
        params["neuconw"]["color"],
        fc.color_cfg,
        fc.encode_a,
        pts,
        grad,
        dirs,
        feat,
        a_embedded,
        act_dtype=_act(fc),
        n_samples=n_samples,
    )
    return rgb, inv_s(params), sdf, grad


def field_rgb(params, fc: FieldConfig, pts, dirs, a_embedded):
    """Color probe for mesh vertex coloring (reference
    rendering/renderer.py:951-961)."""
    rgb, _, _, _ = field_forward(params, fc, pts, dirs, a_embedded)
    return rgb


def field_background(params, fc: FieldConfig, pts4, dirs, a_embedded,
                     n_samples=None):
    """Background NeRF evaluation; pts4 (N, 4) inverted-sphere coords.
    dirs / a_embedded may be per-ray with n_samples set (see
    apply_nerf_bg)."""
    a = a_embedded if fc.encode_a_bg else None
    if fc.bg_mode == "pallas":
        if n_samples is not None:
            def up(t):
                return None if t is None else jnp.broadcast_to(
                    t[:, None, :], (t.shape[0], n_samples, t.shape[-1])
                ).reshape(-1, t.shape[-1])

            dirs, a = up(dirs), up(a)
        from ..ops.pallas_nerf_bg import nerf_bg_pallas

        return nerf_bg_pallas(params["nerf_bg"], fc.encode_a_bg, pts4,
                              dirs, a, act_dtype=fc.act_dtype,
                              **({"tile": fc.kernel_tile}
                                 if fc.kernel_tile > 0 else {}))
    return apply_nerf_bg(params["nerf_bg"], fc.encode_a_bg, pts4, dirs, a,
                         act_dtype=_act(fc), n_samples=n_samples)
