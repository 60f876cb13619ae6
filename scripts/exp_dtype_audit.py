"""Audit intermediate-tensor bytes by dtype in the jitted training step.

The step is HBM-bound (BENCHMARKS.md round-1 profile: large fusions at
~710 GB/s, matmuls only 16.6 ms of ~100 ms), so the remaining perf
lever is BYTES. With TPU.FIELD_DTYPE=bfloat16 the activations flow
bf16, but the second-order eikonal chain (reverse-over-reverse through
sdf_value_feat_grad) and the renderer/compositing consumers may still
materialize large f32 intermediates. This audit walks the step's jaxpr
(backend-independent; no chip needed) and tabulates per-dtype bytes,
listing the largest f32 intermediates and the primitive that produced
each — candidate leaks for a bf16-second-order flag.

Jaxpr bytes OVERCOUNT real HBM traffic (XLA fuses most elementwise
chains to registers), so treat the output as a leak FINDER, not a
traffic model: a big f32 tensor made by convert_element_type/mul in the
middle of the bwd chain is a real suspect; thousands of tiny ones are
fusion fodder.

Run (CPU, tiny or flagship shapes — tracing only, no compile):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/exp_dtype_audit.py --batch 1024 [--steady]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def _subjaxprs(eqn):
    for v in eqn.params.values():
        if hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns"):  # ClosedJaxpr
            yield v.jaxpr
        elif hasattr(v, "eqns"):  # raw Jaxpr
            yield v
        elif isinstance(v, (list, tuple)):
            for item in v:
                if hasattr(item, "jaxpr") and hasattr(item.jaxpr, "eqns"):
                    yield item.jaxpr
                elif hasattr(item, "eqns"):
                    yield item


def walk(jaxpr, on_eqn, depth=0):
    for eqn in jaxpr.eqns:
        on_eqn(eqn, depth)
        for sub in _subjaxprs(eqn):
            walk(sub, on_eqn, depth + 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--min_mb", type=float, default=0.0,
                    help="only list f32 intermediates above this size")
    args = ap.parse_args()

    from __graft_entry__ import _make_batch, _scene_cfg, _scene_info
    from neuralrecon_w_tpu.config import get_cfg_defaults
    from neuralrecon_w_tpu.models import field_config_from_cfg
    from neuralrecon_w_tpu.rendering import render_config_from_cfg
    from neuralrecon_w_tpu.training import (
        init_state, loss_config_from_cfg, make_optimizer, make_train_step,
    )

    cfg = _scene_cfg(get_cfg_defaults(), flagship=True)
    cfg.TPU.FIELD_DTYPE = args.dtype
    # shipped operating point (config/train_brandenburg_gate_tpu.yaml)
    cfg.TPU.BG_SAMPLES = 4
    cfg.TPU.BOUNDARY_SAMPLES = 4
    fc = field_config_from_cfg(cfg)
    rcfg = render_config_from_cfg(cfg)
    lcfg = loss_config_from_cfg(cfg)
    opt, _ = make_optimizer(cfg, args.batch)
    step_fn = make_train_step(fc, rcfg, lcfg, opt, anneal_end=50000)

    state = init_state(jax.random.PRNGKey(0), fc, opt)
    scene = _scene_info()
    batch = _make_batch(args.batch, fc.n_vocab)
    rng = jax.random.PRNGKey(1)

    closed = jax.make_jaxpr(step_fn)(state, scene, batch, rng)

    by_dtype = collections.Counter()
    f32_list = []

    def on_eqn(eqn, depth):
        for v in eqn.outvars:
            aval = v.aval
            if not hasattr(aval, "shape") or not hasattr(aval, "dtype"):
                continue
            n = int(np.prod(aval.shape)) if aval.shape else 1
            b = n * aval.dtype.itemsize
            by_dtype[str(aval.dtype)] += b
            if aval.dtype == np.float32 and b >= args.min_mb * 2**20:
                src = ""
                tb = eqn.source_info.traceback
                if tb is not None:
                    for fr in tb.frames:
                        if "neuralrecon_w_tpu" in fr.file_name:
                            src = f"{os.path.basename(fr.file_name)}:{fr.line_num}"
                            break
                f32_list.append((b, tuple(aval.shape), eqn.primitive.name, src))

    walk(closed.jaxpr, on_eqn)

    total = sum(by_dtype.values())
    print(f"batch={args.batch} dtype={args.dtype} "
          f"total jaxpr intermediate bytes: {total/2**20:.1f} MB")
    for dt, b in by_dtype.most_common():
        print(f"  {dt:10s} {b/2**20:9.1f} MB  ({100*b/total:.1f}%)")

    # aggregate identical (shape, primitive) f32 intermediates
    agg = collections.Counter()
    for b, shape, prim, src in f32_list:
        agg[(shape, prim, src)] += b
    print(f"\ntop f32 intermediates (aggregated by shape+primitive+src):")
    for (shape, prim, src), b in agg.most_common(args.top):
        print(f"  {b/2**20:9.1f} MB  {str(shape):24s} {prim:22s} {src}")


if __name__ == "__main__":
    main()
