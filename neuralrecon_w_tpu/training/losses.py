"""NeuS-W training loss, pure-jnp and fixed-shape.

Behavioral parity with the reference NeuconWLoss (reference losses.py:3-43):
  * masked L1 color loss, summed over elements / number of valid rays,
  * eikonal (gradient) error * igr_weight,
  * semantic mask BCE * mask_weight (only when MESH_MASK_LIST configured),
  * SFM depth MSE * depth_weight (only when DEPTH_LOSS),
  * floor normal error * floor_weight — NOTE the reference assigns
    ``self.floor_weight = depth_weight`` (reference losses.py:17), silently
    ignoring the configured floor_weight; we replicate that behind
    ``replicate_floor_weight_bug`` (default True) for parity runs.

Unlike the reference, masked rays are kept in the batch with zero weight
(fixed shapes for XLA) — the divisor is the mask sum, so values match.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class LossConfig(NamedTuple):
    coef: float = 1.0
    igr_weight: float = 0.1
    mask_weight: float = 0.1
    depth_weight: float = 0.1
    floor_weight: float = 0.01
    use_mesh_mask: bool = False
    use_depth_loss: bool = False
    use_floor_normal: bool = False
    replicate_floor_weight_bug: bool = True


def loss_config_from_cfg(cfg) -> LossConfig:
    n = cfg.NEUCONW
    w = n.LOSS
    return LossConfig(
        coef=float(w.coef),
        igr_weight=float(w.igr_weight),
        mask_weight=float(w.mask_weight),
        depth_weight=float(w.depth_weight),
        floor_weight=float(w.floor_weight),
        use_mesh_mask=n.MESH_MASK_LIST is not None,
        use_depth_loss=bool(n.DEPTH_LOSS),
        use_floor_normal=bool(n.FLOOR_NORMAL),
        replicate_floor_weight_bug=bool(w.replicate_floor_weight_bug),
    )


def loss_terms(lcfg: LossConfig, results: dict, rgbs: jnp.ndarray) -> dict:
    """Per-term losses; 'loss' is the weighted total.

    Args:
        results: render_rays output dict (includes 'ray_mask').
        rgbs: (R, 3) target colors.
    """
    masks = results["ray_mask"][:, None]
    mask_sum = jnp.sum(masks) + 1e-5

    color_error = (results["color"] - rgbs) * masks
    ret = {"color_loss": jnp.sum(jnp.abs(color_error)) / mask_sum}

    ret["normal_loss"] = lcfg.igr_weight * results["gradient_error"]

    if lcfg.use_mesh_mask:
        ret["mask_error"] = lcfg.mask_weight * jnp.mean(results["mask_error"])

    if lcfg.use_depth_loss:
        # mean over rays with valid SFM depth (reference renderer.py:892-897
        # computes the masked-select mean; fixed-shape equivalent)
        valid = results["sfm_depth_valid"]
        sfm = jnp.sum(results["sfm_depth_sq"] * valid) / (jnp.sum(valid) + 1e-5)
        ret["sfm_depth_loss"] = lcfg.depth_weight * sfm

    if lcfg.use_floor_normal:
        fw = lcfg.depth_weight if lcfg.replicate_floor_weight_bug else lcfg.floor_weight
        cnt = jnp.maximum(results["floor_count"] * 3.0, 1.0)
        ret["floor_normal_error"] = fw * jnp.sum(results["floor_normal_error"]) / cnt

    ret = {k: lcfg.coef * v for k, v in ret.items()}
    ret["loss"] = sum(ret.values())
    return ret
