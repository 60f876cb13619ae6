"""Optimizer + LR schedule construction (optax).

Replaces reference utils/__init__.py:12-62 (get_optimizer/get_scheduler)
and the LR linear-scaling rule of reference train.py:21-25:
    LR = CANONICAL_LR * world_batch / CANONICAL_BS.
Gradient clipping is global-norm 0.99 (reference train.py:61 — Lightning's
gradient_clip_val semantics are clip-by-global-norm).
"""

from __future__ import annotations

import optax


def scaled_lr(cfg, world_batch_size: int) -> float:
    t = cfg.TRAINER
    if t.LR is not None:
        return float(t.LR)
    return float(t.CANONICAL_LR) * world_batch_size / float(t.CANONICAL_BS)


def make_lr_schedule(cfg, base_lr: float, total_steps: int):
    name = (cfg.TRAINER.LR_SCHEDULER or "none").lower()
    if name == "none" or total_steps <= 0:
        return base_lr
    if name == "cosine":
        return optax.cosine_decay_schedule(base_lr, max(total_steps, 1))
    if name == "steplr":
        steps = list(cfg.TRAINER.DECAY_STEP or [])
        gamma = float(cfg.TRAINER.DECAY_GAMMA)
        return optax.piecewise_constant_schedule(
            base_lr, {int(s): gamma for s in steps}
        )
    if name == "poly":
        exp = float(cfg.TRAINER.POLY_EXP)
        return optax.polynomial_schedule(
            base_lr, 0.0, power=exp, transition_steps=max(total_steps, 1)
        )
    raise ValueError(f"unknown scheduler {name!r}")


def make_optimizer(cfg, world_batch_size: int, total_steps: int = 0):
    """optax chain: global-norm clip -> optimizer(schedule)."""
    base_lr = scaled_lr(cfg, world_batch_size)
    schedule = make_lr_schedule(cfg, base_lr, total_steps)
    name = (cfg.TRAINER.OPTIMIZER or "adam").lower()
    wd = float(cfg.TRAINER.WEIGHT_DECAY or 0.0)
    # eps=1e-7 is the reference's Adam epsilon (reference
    # utils/__init__.py:24), not optax's 1e-8 default — pinned by the
    # twin-dynamics parity test (tests/test_reference_twin_dynamics.py)
    eps = 1e-7
    if name == "adam":
        opt = (
            optax.adamw(schedule, eps=eps, weight_decay=wd) if wd > 0
            else optax.adam(schedule, eps=eps)
        )
    elif name == "sgd":
        opt = optax.sgd(schedule, momentum=0.9)
    elif name == "radam":
        opt = optax.radam(schedule, eps=eps)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    clip = float(cfg.TRAINER.GRAD_CLIP or 0.0)
    if clip > 0:
        return optax.chain(optax.clip_by_global_norm(clip), opt), schedule
    return opt, schedule
