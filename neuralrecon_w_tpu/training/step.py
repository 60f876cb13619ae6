"""The jitted training step: render -> loss -> grad -> optax update.

TPU-native redesign of NeuconWSystem.training_step (reference
lightning_modules/neuconw_system.py:337-402):
  * one pure function over (state, batch, rng) — jitted once, no Python
    in the hot loop,
  * data parallelism by sharding the ray batch over the mesh ``data``
    axis; gradient allreduce is the psum XLA inserts from the sharding
    annotations (replaces Lightning DDP / NCCL, reference train.py:55),
  * cos-anneal ratio and LR schedule are functions of the carried step
    counter (reference neuconw_system.py:148-152),
  * semantic ray masking is a weight, not a ray drop, keeping shapes
    static (reference neuconw_system.py:348-355 drops rays).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.neuconw import FieldConfig, init_field
from ..ops.ray_voxel import DeviceGrid
from ..parallel.mesh import DATA_AXIS
from ..rendering.renderer import RenderConfig, SceneInfo, render_rays
from .losses import LossConfig, loss_terms
from .metrics import psnr


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # () int32


def init_state(key, fc: FieldConfig, optimizer) -> TrainState:
    params = init_field(key, fc)
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def ray_mask_from_labels(labels: jnp.ndarray, ray_mask_ids, dtype=jnp.float32):
    """1.0 for supervised rays, 0.0 for transient classes
    (reference neuconw_system.py:348-355)."""
    mask = jnp.ones(labels.shape, dtype)
    if ray_mask_ids:
        for mid in ray_mask_ids:
            mask = jnp.where(labels == mid, 0.0, mask)
    return mask


def make_train_step(
    fc: FieldConfig,
    rcfg: RenderConfig,
    lcfg: LossConfig,
    optimizer,
    anneal_end: int,
    ray_mask_ids: tuple = (),
):
    """Build the pure step function.

    Returns step_fn(state, scene, batch, rng, fine_grid, sfm_grid)
      -> (new_state, metrics dict).
    batch = {"rays": (R, >=8), "ts": (R,), "labels": (R,), "rgbs": (R, 3)}.
    """

    def loss_fn(params, scene, batch, rng, cos_anneal, fine_grid, sfm_grid):
        ray_mask = ray_mask_from_labels(batch["labels"], ray_mask_ids)
        # surface-band cache: precomputed first-hit per pool row
        # (DeviceRayPool.attach_surface) — skips the per-step grid query
        surf_cache = None
        if fine_grid is not None and "surf_t" in batch:
            surf_cache = (batch["surf_t"], batch["surf_hit"])
        results = render_rays(
            params, fc, rcfg, scene,
            batch["rays"], batch["ts"], batch["labels"], rng,
            cos_anneal, fine_grid=fine_grid, sfm_grid=sfm_grid,
            ray_mask=ray_mask, surf_cache=surf_cache,
        )
        terms = loss_terms(lcfg, results, batch["rgbs"])
        aux = {
            "psnr": psnr(results["color"], batch["rgbs"], results["ray_mask"][:, None]),
            "s_val": jnp.mean(results["s_val"]),
            **terms,
        }
        return terms["loss"], aux

    def step_fn(
        state: TrainState,
        scene: SceneInfo,
        batch: dict,
        rng: jax.Array,
        fine_grid: Optional[DeviceGrid] = None,
        sfm_grid: Optional[DeviceGrid] = None,
    ):
        cos_anneal = (
            jnp.minimum(1.0, state.step.astype(jnp.float32) / anneal_end)
            if anneal_end > 0
            else jnp.float32(1.0)
        )
        rng = jax.random.fold_in(rng, state.step)
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, scene, batch, rng, cos_anneal, fine_grid, sfm_grid
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return TrainState(params, opt_state, state.step + 1), aux

    return step_fn


def jit_train_step(step_fn, mesh, donate: bool = True, param_specs=None):
    """Jit with mesh shardings: batch sharded on ``data``, params either
    replicated (pure DP) or tensor-sharded over ``model`` when
    param_specs (a PartitionSpec pytree from parallel.field_param_specs)
    is given.

    XLA turns the sharding annotations into the ICI collectives — the
    entire distributed runtime of the reference (NCCL DDP) is these
    annotation lines.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    # prefix sharding: every leaf of the batch dict is a per-ray array
    # sharded on data — including the optional surf_t/surf_hit band
    # cache a DeviceRayPool attaches after octree_update (a fixed key
    # set here would reject those batches)
    batch_shard = data
    if param_specs is None:
        state_shard = repl
    else:
        to_shard = lambda tree: jax.tree.map(
            lambda spec: NamedSharding(mesh, spec), tree,
            is_leaf=lambda x: isinstance(x, P),
        )
        try:
            opt_shard = to_shard(_adam_state_specs(param_specs))
        except Exception:  # non-canonical optimizer chain: replicate
            opt_shard = repl
        # TrainState(params, opt_state, step): adam moments mirror params
        state_shard = TrainState(to_shard(param_specs), opt_shard, repl)
    return jax.jit(
        step_fn,
        in_shardings=(state_shard, repl, batch_shard, repl, repl, repl),
        out_shardings=(state_shard, repl),
        donate_argnums=(0,) if donate else (),
        static_argnames=(),
    )


def _adam_state_specs(param_specs):
    """optax chain(clip, adam) state: (EmptyState, (ScaleByAdamState(count,
    mu, nu), EmptyState)) — mirror the param specs onto mu/nu."""
    import optax

    return (
        optax.EmptyState(),
        (
            optax.ScaleByAdamState(
                count=P(), mu=param_specs, nu=param_specs
            ),
            optax.EmptyState(),
        ),
    )


def make_scan_train_fn(
    fc: FieldConfig,
    rcfg: RenderConfig,
    lcfg,
    optimizer,
    anneal_end: int,
    ray_mask_ids: tuple,
    batch_size: int,
    n_inner: int,
):
    """Train n_inner steps per device dispatch with on-device batch
    gathering from an HBM-resident ray pool (lax.scan over the step).

    This amortizes host->device dispatch latency — essential when the
    host drives the chip over a network tunnel, and still a win locally.
    Single-data-shard pools only (the sharded pool path gathers via
    shard_map outside; see datasets.cache.DeviceRayPool).

    Returns run(state, scene, pool_data, data_rng, rng, fine_grid,
    sfm_grid, perm, start) -> (state, last_aux).

    Batch selection: with (perm, start) operands — a device-resident
    epoch permutation and a cursor from DeviceRayPool.take_scan_window —
    inner step i consumes the contiguous permutation window
    [start + i*batch, ...), i.e. the same shuffled without-replacement
    epoch semantics as the host RayPool / the reference's
    DataLoader(shuffle=True). With perm=None, a stateless
    with-replacement randint gather keyed on the step counter.
    """
    step_fn = make_train_step(fc, rcfg, lcfg, optimizer, anneal_end,
                              ray_mask_ids)

    def run(state, scene, pool_data, data_rng, rng,
            fine_grid=None, sfm_grid=None, perm=None, start=None):
        n_rows = pool_data["rays"].shape[0]

        def body(carry, i):
            st = carry
            if perm is None:
                k = jax.random.fold_in(data_rng, st.step)
                idx = jax.random.randint(k, (batch_size,), 0, n_rows)
            else:
                idx = jax.lax.dynamic_slice_in_dim(
                    perm, start + i * batch_size, batch_size)
            batch = {key: v[idx] for key, v in pool_data.items()}
            st, aux = step_fn(st, scene, batch, rng, fine_grid, sfm_grid)
            return st, aux

        state, auxs = jax.lax.scan(body, state, jnp.arange(n_inner))
        last = jax.tree.map(lambda x: x[-1], auxs)
        return state, last

    return jax.jit(run, donate_argnums=(0,))


def make_render_fn(fc: FieldConfig, rcfg: RenderConfig):
    """Deterministic chunked render for validation / image synthesis
    (reference neuconw_system.py:404-430). perturb=0, no ray mask."""

    @partial(jax.jit, static_argnames=())
    def render_chunk(params, scene, rays, ts, labels, rng, fine_grid=None, sfm_grid=None):
        return render_rays(
            params, fc, rcfg, scene, rays, ts, labels, rng,
            cos_anneal_ratio=1.0, fine_grid=fine_grid, sfm_grid=sfm_grid,
            perturb_overwrite=0.0,
        )

    return render_chunk


def make_scan_render_fn(fc: FieldConfig, rcfg: RenderConfig, chunk: int):
    """Whole-frame render as ONE device dispatch: ``lax.scan`` over
    chunk-sized ray tiles, the inference analogue of
    ``make_scan_train_fn``. The reference renders eval images as a
    host-side chunk loop (reference lightning_modules/
    neuconw_system.py:415-422) and so does ``render_image``'s fallback;
    over a high-latency transport (the axon tunnel pays ~90 ms per
    dispatch) that loop costs ceil(H*W/chunk) round-trips per frame.
    Here the loop is a device-side scan, so a frame is one dispatch and
    one result fetch regardless of size.

    Only the images render_image consumes are emitted (color, depth,
    weighted normal) — the normal is reduced inside the scan body so
    the stacked carry stays O(n_rays * 3), not O(n_rays * n_samples).
    Rays must be pre-padded to a multiple of ``chunk``; the jit
    re-traces per distinct ray count (one compile per frame size)."""

    def run(params, scene, rays, ts, labels, rng, fine_grid=None,
            sfm_grid=None):
        n_chunks = rays.shape[0] // chunk

        def body(carry, xs):
            r, t, l = xs
            out = render_rays(
                params, fc, rcfg, scene, r, t, l, rng,
                cos_anneal_ratio=1.0, fine_grid=fine_grid,
                sfm_grid=sfm_grid, perturb_overwrite=0.0,
            )
            g = out["gradients"]
            wgt = out["weights"][:, : g.shape[1], None]
            return carry, (out["color"], out["depth"], (g * wgt).sum(axis=1))

        _, (color, depth, normal) = jax.lax.scan(
            body, None,
            (rays.reshape(n_chunks, chunk, rays.shape[-1]),
             ts.reshape(n_chunks, chunk),
             labels.reshape(n_chunks, chunk)))
        return {
            "color": color.reshape(n_chunks * chunk, 3),
            "depth": depth.reshape(n_chunks * chunk),
            "normal": normal.reshape(n_chunks * chunk, 3),
        }

    return jax.jit(run)
