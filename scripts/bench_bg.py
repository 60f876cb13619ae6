"""Micro + in-context benchmark of the fused bg-NeRF kernel on TPU.

Usage: python scripts/bench_bg.py [micro|step]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def micro():
    from neuralrecon_w_tpu.models.nerf_bg import apply_nerf_bg, init_nerf_bg
    from neuralrecon_w_tpu.ops.pallas_nerf_bg import nerf_bg_pallas

    n = 311_296  # 8192 rays x 38 samples
    rs = np.random.RandomState(0)
    xyz = rs.randn(n, 3).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    pts4 = jnp.asarray(np.concatenate(
        [xyz, rs.uniform(0.05, 1, (n, 1)).astype(np.float32)], axis=-1))
    d0 = rs.randn(n, 3).astype(np.float32)
    dirs = jnp.asarray(d0 / np.linalg.norm(d0, axis=-1, keepdims=True))
    a = jnp.asarray(rs.randn(n, 48).astype(np.float32)) * 0.3
    params = init_nerf_bg(jax.random.PRNGKey(0), True, 48)
    c_den = jnp.ones((n, 1)) * 0.1
    c_rgb = jnp.ones((n, 3)) * 0.1

    for act in ("float32", "bfloat16"):
        for mode in ("xla", "pallas", "pallas_t128", "pallas_t512"):
            tile = {"pallas_t128": 128, "pallas_t512": 512}.get(mode, 256)

            if mode == "xla":
                def fwd_fn(p, x, d, aa):
                    return apply_nerf_bg(p, True, x, d, aa,
                                         act_dtype=jnp.bfloat16 if act == "bfloat16" else None)
            else:
                def fwd_fn(p, x, d, aa, tile=tile):
                    return nerf_bg_pallas(p, True, x, d, aa, act_dtype=act,
                                          tile=tile)

            def loss(p, x, d, aa):
                den, rgb = fwd_fn(p, x, d, aa)
                return jnp.sum(den * c_den) + jnp.sum(rgb * c_rgb)

            fwd_j = jax.jit(fwd_fn)
            grad_j = jax.jit(jax.grad(loss, argnums=(0, 3)))
            try:
                t_f = timeit(fwd_j, params, pts4, dirs, a)
                t_g = timeit(grad_j, params, pts4, dirs, a)
                print(f"{act:9s} {mode:12s} fwd {t_f:7.2f} ms   fwd+bwd {t_g:7.2f} ms", flush=True)
            except Exception as e:
                print(f"{act:9s} {mode:12s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


def step(fused_bg):
    from __graft_entry__ import _make_batch, _scene_cfg, _scene_info
    from neuralrecon_w_tpu.config import get_cfg_defaults
    from neuralrecon_w_tpu.models import field_config_from_cfg
    from neuralrecon_w_tpu.rendering import render_config_from_cfg
    from neuralrecon_w_tpu.training import (
        init_state, loss_config_from_cfg, make_optimizer, make_train_step,
    )

    BATCH = 8192
    cfg = _scene_cfg(get_cfg_defaults(), flagship=True)
    cfg.TPU.FIELD_DTYPE = "bfloat16"
    cfg.TPU.FUSED_BG = fused_bg
    fc = field_config_from_cfg(cfg)
    rcfg = render_config_from_cfg(cfg)
    lcfg = loss_config_from_cfg(cfg)
    opt, _ = make_optimizer(cfg, BATCH)
    stepf = jax.jit(make_train_step(fc, rcfg, lcfg, opt, anneal_end=50000),
                    donate_argnums=(0,))
    state = init_state(jax.random.PRNGKey(0), fc, opt)
    scene = _scene_info()
    batch = _make_batch(BATCH, fc.n_vocab)
    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        state, aux = stepf(state, scene, batch, rng)
    float(aux["loss"])
    t0 = time.perf_counter()
    ITERS = 30
    for _ in range(ITERS):
        state, aux = stepf(state, scene, batch, rng)
    loss = float(aux["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"FUSED_BG={fused_bg}: {dt*1e3:.1f} ms/step, "
          f"{BATCH/dt:,.0f} rays/s, loss {loss:.4f}", flush=True)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "micro"
    if what == "micro":
        micro()
    elif what == "step":
        step(False)
        step(True)
