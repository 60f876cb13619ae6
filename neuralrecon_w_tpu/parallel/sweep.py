"""Sharded chunked field sweeps over large point sets.

Covers the reference's three SPMD grid-evaluation paths — surface
selection (reference lightning_modules/neuconw_system.py:186-266), mesh
SDF eval and vertex coloring (reference utils/visualization.py:27-156) —
as one primitive: pad the point list, split the leading axis over the
mesh ``data`` axis with shard_map so every device loops fixed-size
chunks locally (lax.map), then gather. This replaces the reference's
hand-rolled pad + dist.all_gather + trim dance
(reference neuconw_system.py:39-57,253-258).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.neuconw import FieldConfig, field_rgb, field_sdf
from .mesh import DATA_AXIS, MODEL_AXIS

try:  # jax>=0.6 exposes shard_map at top level
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _pad(pts: np.ndarray, multiple: int):
    n = pts.shape[0]
    target = ((max(n, 1) + multiple - 1) // multiple) * multiple
    if target != n:
        pad = np.zeros((target - n,) + pts.shape[1:], pts.dtype)
        pts = np.concatenate([pts, pad], axis=0)
    return pts, n


@partial(jax.jit, static_argnames=("fn", "chunk", "mesh"))
def _sweep_jit(params, arrays, fn, chunk: int, mesh):
    """params replicated, arrays sharded on the data axis; fn(params, *chunk)."""

    def local(params, *xs):
        blocks = tuple(a.reshape(-1, chunk, *a.shape[1:]) for a in xs)
        return jax.lax.map(lambda b: fn(params, *b), blocks).reshape(
            -1, *jax.eval_shape(partial(fn, params), *(b[0] for b in blocks)).shape[1:]
        )

    if mesh is None or mesh.shape[DATA_AXIS] == 1:
        return local(params, *arrays)
    try:
        # check_vma must be off when the local fn contains a pallas_call
        # (its ShapeDtypeStruct carries no varying-mesh-axes annotation)
        smapped = shard_map(
            local, mesh=mesh,
            in_specs=(P(),) + tuple(P(DATA_AXIS) for _ in arrays),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
    except TypeError:  # older jax without check_vma
        smapped = shard_map(
            local, mesh=mesh,
            in_specs=(P(),) + tuple(P(DATA_AXIS) for _ in arrays),
            out_specs=P(DATA_AXIS),
        )
    return smapped(params, *arrays)


def _local_mesh() -> Mesh:
    """A (local_devices, 1) mesh over THIS process's devices only."""
    import numpy as _np

    devs = jax.local_devices()
    return Mesh(_np.asarray(devs).reshape(len(devs), 1),
                (DATA_AXIS, MODEL_AXIS))


def _sweep_multihost(fn, params, chunk: int, host_arrays, macro: int):
    """Multi-process sweep, the reference's rank-sharded pattern
    (reference lightning_modules/neuconw_system.py:239-258 and
    utils/visualization.py:67-90): every process holds the SAME host
    point set, evaluates a contiguous block on its local devices, and a
    cross-process all-gather rebuilds the full result on every host.

    The single-process path's device_put/np.asarray round trip cannot
    run on a mesh that spans processes (non-addressable shards), so the
    global mesh dispatches here instead. `params` must be host-side
    (process-replicated) values — both callers pass jax.device_get'd
    params."""
    from jax.experimental import multihost_utils

    nproc, pid = jax.process_count(), jax.process_index()
    n = host_arrays[0].shape[0]
    per = -(-max(n, 1) // nproc)  # equal blocks so gather shapes agree
    lo = min(pid * per, n)
    local = []
    for a in host_arrays:
        blk = np.asarray(a[lo:lo + per])
        if blk.shape[0] < per:
            pad = np.zeros((per - blk.shape[0],) + blk.shape[1:], blk.dtype)
            blk = np.concatenate([blk, pad], axis=0)
        local.append(blk)
    out = _sweep(fn, params, _local_mesh(), chunk, *local, macro=macro)
    gathered = multihost_utils.process_allgather(out)  # (nproc, per, ...)
    return np.asarray(gathered).reshape((nproc * per,) + out.shape[1:])[:n]


def _sweep(fn, params, mesh: Mesh | None, chunk: int, *host_arrays,
           macro: int = 1 << 22):
    """Pad, shard, chunk-map fn over the arrays' leading axis; gather.

    The point set streams to the device in host-side macro-batches
    (~4M points) — level-10 extraction sweeps reach hundreds of
    millions of candidates, far past HBM if shipped whole (observed:
    a 233M-point level-10 sweep exceeding the 16 GB HBM). Every macro
    except the last has an identical shape, so at most two programs
    compile."""
    if mesh is not None and getattr(mesh, "is_multi_process", False):
        return _sweep_multihost(fn, params, chunk, host_arrays, macro)
    n_shards = mesh.shape[DATA_AXIS] if mesh is not None else 1
    block = chunk * n_shards
    macro = max(block, (macro // block) * block)
    n = host_arrays[0].shape[0]
    arrays = [np.asarray(a) for a in host_arrays]

    outs = []
    for s in range(0, max(n, 1), macro):
        piece_n = min(macro, n - s) if n else 0
        padded = []
        for a in arrays:
            p, _ = _pad(a[s : s + macro], block)
            x = jnp.asarray(p)
            if mesh is not None:
                x = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))
            padded.append(x)
        out = _sweep_jit(params, tuple(padded), fn, chunk, mesh)
        outs.append(np.asarray(out)[:piece_n])
    return np.concatenate(outs) if len(outs) > 1 else outs[0]


def _sdf_eval(fc, params, b):
    return field_sdf(params, fc, b)[:, None]


def _sdf_eval_fused(fc, params, b):
    from ..ops.pallas_mlp import fused_field_sdf

    return fused_field_sdf(params, fc, b)[:, None]


def _rgb_eval(fc, params, p, d, e):
    return field_rgb(params, fc, p, d, e)


def _rgb_eval_fused(fc, params, p, d, e):
    from ..ops.pallas_field import fused_field_forward

    rgb, _, _ = fused_field_forward(params, fc, p, d, e)
    return rgb


@lru_cache(maxsize=None)
def _cached_partial(base, fc):
    """Stable (hash-equal) fn objects per FieldConfig so _sweep_jit's
    static `fn` argument doesn't force a recompile on every call."""
    return partial(base, fc)


def sharded_sdf_sweep(
    params, fc: FieldConfig, pts: np.ndarray, mesh: Mesh | None = None,
    chunk: int = 65536, use_fused: bool | None = None,
) -> np.ndarray:
    """SDF at every point, any count; returns host float32 (N,).

    chunk matches the reference's 65536-point sweeps
    (reference neuconw_system.py:186,245). On TPU the per-chunk eval
    routes through the fused Pallas MLP kernel by default.
    """
    if use_fused is None:
        from ..ops.pallas_mlp import on_tpu, supports_fused

        use_fused = on_tpu() and supports_fused(fc)
    fn = _cached_partial(_sdf_eval_fused if use_fused else _sdf_eval, fc)
    out = _sweep(fn, params, mesh, chunk, np.asarray(pts, np.float32))
    return out[:, 0]


def sharded_rgb_sweep(
    params, fc: FieldConfig, pts: np.ndarray, view_dir, a_index: int,
    mesh: Mesh | None = None, chunk: int = 65536,
    use_fused: bool | None = None,
) -> np.ndarray:
    """Vertex-color probe at fixed view dir + appearance index
    (reference utils/visualization.py:124-156, tools/extract_mesh.py:157).
    On TPU the eval routes through the fused field kernel
    (ops/pallas_field.py, ~30% faster than the XLA path)."""
    pts = np.asarray(pts, np.float32)
    dirs = np.broadcast_to(np.asarray(view_dir, np.float32), pts.shape).copy()
    n_vocab = int(np.asarray(params["embedding_a"]).shape[0])
    if a_index >= n_vocab:
        # the reference CLI hardcodes index 1123 (tools/extract_mesh.py:157)
        # which small scenes' vocab cannot cover
        import logging

        logging.getLogger(__name__).warning(
            "appearance index %d >= N_VOCAB %d; clamping", a_index, n_vocab
        )
        a_index = n_vocab - 1
    a_vec = np.asarray(params["embedding_a"][a_index])
    a = np.broadcast_to(a_vec, (pts.shape[0], a_vec.shape[-1])).copy()
    if use_fused is None:
        from ..ops.pallas_mlp import on_tpu, supports_fused

        use_fused = on_tpu() and supports_fused(fc) and fc.encode_a
    fn = _cached_partial(_rgb_eval_fused if use_fused else _rgb_eval, fc)
    return _sweep(fn, params, mesh, chunk, pts, dirs, a)
