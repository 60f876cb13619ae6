"""NeuS-W volume renderer as a pure, fixed-shape, jittable function.

Behavioral spec from the reference NeuconWRenderer
(reference rendering/renderer.py:51-961), re-designed for XLA:
  * static sample counts (8 uniform + 16 importance + 10 boundary + bg),
  * masked reductions instead of ray dropping,
  * the sampler runs under stop_gradient (the torch no_grad block),
  * voxel intersections via the DDA bitfield traversal (ops/ray_voxel.py)
    instead of kaolin SPC CUDA raytrace,
  * single batched field evaluation per pass; SDF gradients from a fused
    vjp (one forward + one reverse), differentiable for the eikonal term.

Coordinates: rays arrive in SFM units; everything renders inside the unit
training sphere ((x - origin) / radius).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.neuconw import (
    FieldConfig,
    field_background,
    field_forward,
    field_sdf,
)
from ..ops.ray_voxel import DeviceGrid, grid_near_far
from .sampling import cat_z_vals, merge_sorted, up_sample


class RenderConfig(NamedTuple):
    """Static rendering hyperparameters (hashable jit closure)."""

    n_samples: int = 8
    n_importance: int = 16
    up_sample_steps: int = 2
    n_outside: int = 4
    s_val_base: int = 0
    boundary_samples: int = 10
    sample_range: int = 16
    perturb: float = 1.0
    render_bg: bool = True
    trim_sphere: bool = True
    mesh_mask_ids: Optional[tuple] = None  # label ids whose weight_sum -> 0
    floor_normal: bool = False
    floor_label_ids: tuple = ()
    depth_loss: bool = False
    # static levels of the attached voxel grids (-1 = absent)
    sfm_level: int = -1  # SFM octree for near/far override (validation)
    fine_level: int = -1  # online SDF-surface grid (training after warmup)
    nerf_far_override: bool = False
    # route the sampler's gradient-free SDF evals through the fused
    # Pallas VMEM-resident MLP kernel (ops/pallas_mlp.py); TPU only
    fused_sampler_sdf: bool = False
    # rematerialize the field evaluation in the backward pass. False |
    # True (save nothing: trades ~1/3 more FLOPs for activation memory,
    # unlocks ray batches past the HBM ceiling) | a
    # jax.checkpoint_policies name such as 'dots_saveable' (save MXU
    # outputs only, recompute the elementwise chain in backward —
    # narrower stored residuals at near-zero FLOP cost)
    remat_field: object = False
    # ray-tile of the fused importance sampler kernel (-1 = default 64;
    # 128 needs a raised device scoped-VMEM limit at width 512)
    sampler_tile: int = -1
    # 'lanes' | 'rows' — sampler kernel VPU-logic layout (see
    # ops/pallas_sampler.py)
    sampler_layout: str = "lanes"
    # fine-grid surface query: 'sampled' = loop-free dense occupancy
    # sampling of [near, far] (sub-voxel-accurate band placement, no
    # while_loop latency); 'dda' = exact traversal
    surface_query: str = "sampled"
    surface_query_samples: int = 1024
    # > 0: bg NeRF evaluated at this many coarse positions + the
    # n_outside tail, nearest-expanded to the full set (TPU.BG_SAMPLES)
    bg_samples: int = -1


class SceneInfo(NamedTuple):
    """Dynamic per-scene normalization (no recompile across scenes)."""

    origin: jnp.ndarray  # (3,)
    radius: jnp.ndarray  # ()
    sfm2gt: jnp.ndarray  # (4, 4)


def _check_remat(name):
    if not hasattr(jax.checkpoint_policies, name):
        raise ValueError(
            f"TPU.REMAT_FIELD={name!r} is not a jax.checkpoint_policies "
            "name (e.g. 'dots_saveable', 'nothing_saveable')"
        )
    return name


def _checked_bg_samples(bg: int) -> int:
    """TPU.BG_SAMPLES below 8 is rejected by the multi-seed quality
    ablation (docs/bg_boundary_ablation_r5.json: 5/17 BG4 clean-scene
    draws collapse geometry stochastically — healthy PSNR, detached SDF
    zero set — across every boundary budget incl. the reference's).
    The value stays configurable for experiments, but warn loudly."""
    if 0 < bg < 8:
        import logging

        logging.getLogger(__name__).warning(
            "TPU.BG_SAMPLES=%d is below the quality-validated minimum of "
            "8: the coarse-subset background at %d positions collapses "
            "clean-scene geometry on ~1/3 of training draws (multi-seed "
            "ablation, docs/bg_boundary_ablation_r5.json). Use 8+, or -1 "
            "for the reference behavior.", bg, bg)
    return bg


def render_config_from_cfg(cfg, sfm_level=-1, fine_level=-1, nerf_far_override=None, perturb=None):
    n = cfg.NEUCONW
    from ..datasets.mask_utils import get_label_id_mapping

    fused = getattr(cfg.TPU, "FUSED_SAMPLER_SDF", False)
    remat = getattr(cfg.TPU, "REMAT_FIELD", False)
    if fused == "auto" or remat == "auto":  # legacy configs
        from ..ops.pallas_mlp import on_tpu

        tpu = on_tpu()
        fused = tpu if fused == "auto" else fused
        remat = tpu if remat == "auto" else remat

    lid = get_label_id_mapping()
    mesh_ids = tuple(lid[x] for x in n.MESH_MASK_LIST) if n.MESH_MASK_LIST else None
    floor_ids = tuple(lid[x] for x in (n.FLOOR_LABELS or []))
    # TPU operating point: reduced band-boundary budget (see
    # config/defaults.py TPU.BOUNDARY_SAMPLES; quality-ablated)
    tpu_boundary = int(getattr(cfg.TPU, "BOUNDARY_SAMPLES", -1))
    boundary = tpu_boundary if tpu_boundary >= 0 else int(n.BOUNDARY_SAMPLES)
    return RenderConfig(
        n_samples=int(n.N_SAMPLES),
        n_importance=int(n.N_IMPORTANCE),
        up_sample_steps=int(n.UP_SAMPLE_STEP),
        n_outside=int(n.N_OUTSIDE),
        s_val_base=int(n.S_VAL_BASE),
        boundary_samples=boundary,
        sample_range=int(n.SAMPLE_RANGE),
        perturb=float(n.PERTURB if perturb is None else perturb),
        render_bg=bool(n.RENDER_BG),
        mesh_mask_ids=mesh_ids,
        floor_normal=bool(n.FLOOR_NORMAL),
        floor_label_ids=floor_ids,
        depth_loss=bool(n.DEPTH_LOSS),
        sfm_level=int(sfm_level),
        fine_level=int(fine_level),
        nerf_far_override=bool(
            n.NEAR_FAR_OVERRIDE if nerf_far_override is None else nerf_far_override
        ),
        fused_sampler_sdf=bool(fused),
        remat_field=_check_remat(remat) if isinstance(remat, str) else bool(remat),
        sampler_tile=int(getattr(cfg.TPU, "SAMPLER_TILE", -1)),
        sampler_layout=str(getattr(cfg.TPU, "SAMPLER_LAYOUT", "lanes")),
        surface_query=str(getattr(cfg.TPU, "SURFACE_QUERY", "sampled")),
        surface_query_samples=int(
            getattr(cfg.TPU, "SURFACE_QUERY_SAMPLES", 1024)
        ),
        bg_samples=_checked_bg_samples(int(getattr(cfg.TPU, "BG_SAMPLES", -1))),
    )


# --------------------------- voxel-guided near/far ---------------------------


def near_far_from_sfm_grid(rcfg, scene, grid: DeviceGrid, rays_o, rays_d, near, far):
    """Validation-time near/far override from the SFM octree
    (reference rendering/renderer.py:380-413). Inputs/outputs in
    unit-sphere units."""
    rays_o_sfm = rays_o * scene.radius + scene.origin
    v_near, v_far, hit = grid_near_far(grid, rcfg.sfm_level, rays_o_sfm, rays_d)
    v_near = v_near[:, None] / scene.radius
    v_far = (v_far[:, None] + grid.voxel_size) / scene.radius
    hit = hit[:, None]
    return jnp.where(hit, v_near, near), jnp.where(hit, v_far, far), hit


def near_far_from_fine_grid(rcfg, scene, grid: DeviceGrid, rays_o, rays_d,
                            near, far, surf_cache=None):
    """Surface-guided sampling band: first intersection with the online
    SDF-surface grid +- sample_range voxels, falling back to cached
    near/far for missed rays (reference rendering/renderer.py:415-456).

    ``surf_cache``, when given, is a per-ray ``(surf_t_sfm, hit)`` pair
    precomputed by the exact DDA (DeviceRayPool.attach_surface): the
    band is a pure function of (ray, grid), and the grid only changes at
    octree_update boundaries, so the training loop amortizes the query
    across the whole refresh interval instead of paying it per step (the
    reference re-traverses kaolin SPC every step,
    reference rendering/renderer.py:415-430).

    Without a cache, surface_query='sampled' places the band by dense
    occupancy sampling of the cached [near, far] interval instead of the
    exact DDA march — the while_loop's per-iteration latency dominates a
    per-step query, and the +-sample_range band absorbs the sub-step
    placement error (the 27-dilated surface shell is >= 3 voxels thick,
    well above the sampling step)."""
    rays_o_sfm = rays_o * scene.radius + scene.origin
    if surf_cache is not None:
        surf, hit = surf_cache
    elif rcfg.surface_query == "sampled":
        from ..ops.ray_voxel import sampled_first_hit

        o_norm = (rays_o_sfm - grid.origin) / grid.scale
        t_lo = near[:, 0] * scene.radius / grid.scale
        t_hi = far[:, 0] * scene.radius / grid.scale
        t_first, hit = sampled_first_hit(
            grid, rcfg.fine_level, o_norm, rays_d, t_lo, t_hi,
            rcfg.surface_query_samples,
        )
        surf = jnp.where(hit, t_first * grid.scale, 0.0)
    else:
        surf, _, hit = grid_near_far(
            grid, rcfg.fine_level, rays_o_sfm, rays_d, first_only=True
        )
    band = rcfg.sample_range * grid.voxel_size
    v_near = (surf - band)[:, None] / scene.radius
    v_far = (surf + band)[:, None] / scene.radius
    hit = hit[:, None]
    return jnp.where(hit, v_near, near), jnp.where(hit, v_far, far), hit


# ------------------------------- sampler -------------------------------


def sparse_sampler(
    params, fc: FieldConfig, rcfg: RenderConfig, scene: SceneInfo,
    rays_o, rays_d, near, far, rng,
    fine_grid: Optional[DeviceGrid], sfm_grid: Optional[DeviceGrid],
    perturb: float,
    surf_cache=None,
):
    """Produce foreground z values (R, S), background z values and the
    per-ray base section length (reference rendering/renderer.py:458-568).
    Runs conceptually under no_grad; callers stop_gradient the outputs."""
    batch = rays_o.shape[0]

    if rcfg.nerf_far_override and sfm_grid is not None:
        near, far, _ = near_far_from_sfm_grid(rcfg, scene, sfm_grid, rays_o, rays_d, near, far)

    sample_near, sample_far = near, far
    if fine_grid is not None:
        sample_near, sample_far, _ = near_far_from_fine_grid(
            rcfg, scene, fine_grid, rays_o, rays_d, near, far, surf_cache
        )

    sample_dist = (sample_far - sample_near) / rcfg.n_samples  # (R, 1)
    lin = jnp.linspace(0.0, 1.0, rcfg.n_samples)
    z_vals = sample_near + (sample_far - sample_near) * lin[None, :]

    z_vals_outside = None
    use_bg = rcfg.render_bg and rcfg.n_outside > 0
    if use_bg:
        z_out = jnp.linspace(1e-3, 1.0 - 1.0 / (rcfg.n_outside + 1.0), rcfg.n_outside)
        z_out = jnp.broadcast_to(z_out, (batch, rcfg.n_outside))

    if perturb > 0:
        k1, k2 = jax.random.split(rng)
        t_rand = jax.random.uniform(k1, (batch, 1)) - 0.5
        z_vals = z_vals + (sample_far - sample_near) * t_rand * 2.0 / rcfg.n_samples
        if use_bg:
            mids = 0.5 * (z_out[..., 1:] + z_out[..., :-1])
            upper = jnp.concatenate([mids, z_out[..., -1:]], axis=-1)
            lower = jnp.concatenate([z_out[..., :1], mids], axis=-1)
            t_rand2 = jax.random.uniform(k2, (batch, rcfg.n_outside))
            z_out = lower + (upper - lower) * t_rand2

    if use_bg:
        # inverse-depth spacing outside the sphere, from `far` outward
        z_vals_outside = far / jnp.flip(z_out, axis=-1) + 1.0 / rcfg.n_samples

    # iterative SDF importance sampling (fixed inv_s schedule)
    if rcfg.n_importance > 0:
        if rcfg.fused_sampler_sdf:
            # one Pallas kernel for the whole gradient-free stage
            # (ops/pallas_sampler.py): MLP evals + up-sampling + CDF
            # draws + merges, ~100 small XLA ops collapsed
            from ..ops.pallas_sampler import fused_importance_sampler

            tile = rcfg.sampler_tile
            if tile <= 0:
                tile = 128 if rcfg.sampler_layout == "lanes" else 64
            z_vals = fused_importance_sampler(
                params["neuconw"]["sdf"], fc.sdf, rays_o, rays_d, z_vals,
                rcfg.n_importance, rcfg.up_sample_steps, rcfg.s_val_base,
                act_dtype=fc.act_dtype, tile=tile,
                layout=rcfg.sampler_layout,
            )
        else:
            sdf_fn = lambda pts: field_sdf(params, fc, pts)
            pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
            sdf = sdf_fn(pts)
            n_per_step = rcfg.n_importance // rcfg.up_sample_steps
            for i in range(rcfg.up_sample_steps):
                new_z = up_sample(
                    rays_o, rays_d, z_vals, sdf, n_per_step,
                    64.0 * 2 ** (rcfg.s_val_base + i),
                )
                z_vals, sdf = cat_z_vals(
                    sdf_fn, rays_o, rays_d, z_vals, new_z, sdf,
                    last=(i + 1 == rcfg.up_sample_steps),
                )

    # boundary guards around the surface band (each piece is sorted, so
    # two sort-free merges replace the reference's row sort,
    # reference rendering/renderer.py:549-566)
    if fine_grid is not None and rcfg.boundary_samples > 0:
        bn = rcfg.boundary_samples // 2
        bf = rcfg.boundary_samples - bn
        near_lin = jnp.linspace(0.0, 1.0, bn + 1)[:-1]
        far_lin = jnp.linspace(0.0, 1.0, bf + 1)[1:]
        bound_near = near + (z_vals[:, :1] - near) * near_lin[None, :]
        bound_far = z_vals[:, -1:] + (far - z_vals[:, -1:]) * far_lin[None, :]
        # the fine-grid band may start before the cached near (or end
        # past far): those rows' linspaces run DESCENDING, which the
        # reference's torch.sort absorbs but a merge must not — flip
        # them so every block is ascending (same point set)
        bound_near = jnp.where(z_vals[:, :1] >= near, bound_near,
                               jnp.flip(bound_near, -1))
        bound_far = jnp.where(far >= z_vals[:, -1:], bound_far,
                              jnp.flip(bound_far, -1))
        z_vals = merge_sorted(merge_sorted(bound_near, z_vals), bound_far)

    return z_vals, z_vals_outside, sample_dist


# ----------------------------- core passes -----------------------------


def render_core_outside(params, fc, rcfg, rays_o, rays_d, z_vals, sample_dist, a_embedded,
                        eval_idx=None):
    """NeRF++ background pass (reference rendering/renderer.py:157-228).

    ``eval_idx`` (static tuple of sample indices, from
    RenderConfig.bg_samples) restricts the NeRF evaluation to a coarse
    subset of the sorted positions; density/color are expanded back to
    the full set by nearest-index piecewise-constant interpolation and
    composited with the exact full-resolution dists. The contribution of
    inside-sphere samples is masked to zero downstream (render_core), so
    only the coarse approximation of the genuinely-outside samples —
    whose tail indices are always in ``eval_idx`` exactly — is visible."""
    batch, n = z_vals.shape
    dists = jnp.diff(z_vals, axis=-1)
    dists = jnp.concatenate([dists, jnp.broadcast_to(sample_dist, (batch, 1))], axis=-1)
    mid_z = z_vals + dists * 0.5

    if eval_idx is not None and len(eval_idx) < n:
        import numpy as np

        ev = np.asarray(eval_idx)
        k = len(eval_idx)
        # static full-index -> nearest-evaluated-index map (free gather)
        fmap = tuple(np.argmin(np.abs(np.arange(n)[:, None] - ev[None, :]), axis=1))
        mid_eval = mid_z[:, ev]
    else:
        k, fmap, mid_eval = n, None, mid_z

    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_eval[..., None]
    r = jnp.clip(jnp.linalg.norm(pts, axis=-1, keepdims=True), 1.0, 1e10)
    pts4 = jnp.concatenate([pts / r, 1.0 / r], axis=-1).reshape(-1, 4)

    # dirs / appearance are per-ray constants (models/nerf_bg.py
    # n_samples path computes their head contribution at R rows)
    bg = _maybe_remat(field_background, getattr(rcfg, "remat_field", False))
    density, color = bg(params, fc, pts4, rays_d, a_embedded, k)
    if fmap is not None:
        density = density.reshape(batch, k)[:, jnp.asarray(fmap)].reshape(-1, 1)
        color = color.reshape(batch, k, 3)[:, jnp.asarray(fmap)].reshape(-1, 3)
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(density.reshape(batch, n)) * dists)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((batch, 1)), 1.0 - alpha + 1e-7], axis=-1), axis=-1
    )[:, :-1]
    weights = alpha * trans
    sampled_color = color.reshape(batch, n, 3)
    color_out = jnp.sum(weights[:, :, None] * sampled_color, axis=1)
    return {
        "color": color_out,
        "sampled_color": sampled_color,
        "alpha": alpha,
        "weights": weights,
    }


def _maybe_remat(field_fn, remat):
    """Wrap a field evaluation (field_forward / field_background — both
    take (params, fc, pts, dirs, a_embedded, n_samples)) in
    jax.checkpoint per RenderConfig.remat_field: False = store
    everything, True = store nothing, str = a jax.checkpoint_policies
    name (e.g. 'dots_saveable': keep MXU outputs, recompute the
    elementwise chain)."""
    if not remat:
        return field_fn
    policy = None
    if isinstance(remat, str):
        policy = getattr(jax.checkpoint_policies, remat)
    return jax.checkpoint(field_fn, static_argnums=(1, 5), policy=policy)


def _render_depth(alphas, z_vals):
    """Expected depth from alphas (reference rendering/renderer.py:365-378)."""
    batch = alphas.shape[0]
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((batch, 1)), 1.0 - alphas + 1e-7], axis=-1), axis=-1
    )[:, :-1]
    return jnp.sum(alphas * trans * z_vals, axis=-1)


def render_core(
    params, fc, rcfg, rays_o, rays_d, z_vals, sample_dist, a_embedded,
    cos_anneal_ratio, background_alpha, background_sampled_color,
    background_rgb, ray_mask,
):
    """Foreground SDF pass + fg/bg compositing
    (reference rendering/renderer.py:570-783)."""
    batch, n = z_vals.shape

    dists = jnp.diff(z_vals, axis=-1)
    dists = jnp.concatenate([dists, jnp.broadcast_to(sample_dist, (batch, 1))], axis=-1)
    mid_z = z_vals + dists * 0.5

    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., None]  # (R, S, 3)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)

    pts_flat = pts.reshape(-1, 3)
    dirs_flat = dirs.reshape(-1, 3)

    fwd = _maybe_remat(field_forward, rcfg.remat_field)
    # dirs / appearance are constant along a ray: pass them per-ray so
    # the color head computes their GEMM contribution at R rows instead
    # of R*S (models/color.py n_samples path)
    rgb_flat, inv_s, sdf_flat, grad_flat = fwd(
        params, fc, pts_flat, rays_d, a_embedded, n
    )
    rgb = rgb_flat.reshape(batch, n, 3)
    sdf = sdf_flat.reshape(batch, n)
    gradients = grad_flat.reshape(batch, n, 3)

    true_cos = jnp.sum(dirs_flat * grad_flat, axis=-1, keepdims=True)
    # annealed, always non-positive cos (reference rendering/renderer.py:617-620)
    iter_cos = -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
        + jax.nn.relu(-true_cos) * cos_anneal_ratio
    )

    d_flat = dists.reshape(-1, 1)
    est_next = sdf_flat[:, None] + iter_cos * d_flat * 0.5
    est_prev = sdf_flat[:, None] - iter_cos * d_flat * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    alpha = jnp.clip(
        ((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)).reshape(batch, n), 0.0, 1.0
    )

    pts_norm = jnp.linalg.norm(pts, axis=-1)
    inside_sphere = jax.lax.stop_gradient((pts_norm < 1.0).astype(alpha.dtype))
    relax_inside = jax.lax.stop_gradient((pts_norm < 1.2).astype(alpha.dtype))

    depth = _render_depth(alpha, mid_z)

    alpha = alpha * inside_sphere
    rgb = rgb * inside_sphere[:, :, None]
    alpha_in_sphere = alpha
    sphere_rgb = rgb

    color_bg = None
    if background_alpha is not None:
        # fg alpha inside the sphere, bg alpha outside; bg tail appended
        alpha = alpha * inside_sphere + background_alpha[:, :n] * (1.0 - inside_sphere)
        alpha = jnp.concatenate([alpha, background_alpha[:, n:]], axis=-1)
        rgb = (
            rgb * inside_sphere[:, :, None]
            + background_sampled_color[:, :n] * (1.0 - inside_sphere)[:, :, None]
        )
        rgb = jnp.concatenate([rgb, background_sampled_color[:, n:]], axis=1)

        bg_alpha_trim = background_alpha
        if rcfg.trim_sphere:
            bg_alpha_trim = jnp.concatenate(
                [background_alpha[:, :n] * (1.0 - inside_sphere), background_alpha[:, n:]],
                axis=-1,
            )
        trans_bg = jnp.cumprod(
            jnp.concatenate([jnp.ones((batch, 1)), 1.0 - bg_alpha_trim + 1e-7], axis=-1),
            axis=-1,
        )[:, :-1]
        weights_bg = bg_alpha_trim * trans_bg
        color_bg = jnp.sum(background_sampled_color * weights_bg[:, :, None], axis=1)

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((batch, 1)), 1.0 - alpha + 1e-7], axis=-1), axis=-1
    )[:, :-1]
    weights = alpha * trans
    weights_sum = jnp.sum(weights[:, :n] * inside_sphere, axis=-1, keepdims=True)

    trans_sphere = jnp.cumprod(
        jnp.concatenate([jnp.ones((batch, 1)), 1.0 - alpha_in_sphere + 1e-7], axis=-1),
        axis=-1,
    )[:, :-1]
    weights_sphere = alpha_in_sphere * trans_sphere
    color_sphere = jnp.sum(sphere_rgb * weights_sphere[:, :, None], axis=1)

    normals = jnp.sum(gradients * weights[:, :n, None], axis=1)
    color = jnp.sum(rgb * weights[:, :, None], axis=1)
    if background_rgb is not None:
        color = color + background_rgb * (1.0 - weights_sum)

    # eikonal error over the relaxed sphere, restricted to unmasked rays
    grad_norm_err = (jnp.linalg.norm(gradients, axis=-1) - 1.0) ** 2
    relax = relax_inside * ray_mask[:, None]
    gradient_error = jnp.sum(relax * grad_norm_err) / (jnp.sum(relax) + 1e-5)

    return {
        "color": color,
        "color_sphere": color_sphere,
        "color_bg": color_bg if color_bg is not None else jnp.zeros_like(color),
        "sdf": sdf,
        "dists": dists,
        "s_val": 1.0 / inv_s,
        "mid_z_vals": mid_z,
        "weights": weights,
        "weights_sum": weights_sum,
        "cdf": prev_cdf.reshape(batch, n),
        "inside_sphere": inside_sphere,
        "depth": depth,
        "gradient_error": gradient_error,
        "gradients": gradients,
        "normals": normals,
    }


# ------------------------------- top level -------------------------------


def render_rays(
    params,
    fc: FieldConfig,
    rcfg: RenderConfig,
    scene: SceneInfo,
    rays: jnp.ndarray,
    ts: jnp.ndarray,
    labels: jnp.ndarray,
    rng: jax.Array,
    cos_anneal_ratio,
    fine_grid: Optional[DeviceGrid] = None,
    sfm_grid: Optional[DeviceGrid] = None,
    ray_mask: Optional[jnp.ndarray] = None,
    background_rgb: Optional[jnp.ndarray] = None,
    perturb_overwrite: float = -1.0,
    surf_cache=None,
):
    """Render a ray batch (reference rendering/renderer.py:785-916).

    Args:
        rays: (R, >=8) [o(3), d(3), near, far, (depth, weight)] in SFM units.
        ts: (R,) int appearance/image ids.
        labels: (R,) int semantic labels.
        ray_mask: (R,) 1.0 = supervised ray (the reference instead drops
            masked rays; we keep shapes fixed and weight reductions).
        surf_cache: optional per-ray (surf_t_sfm, hit) from the pool's
            precomputed surface-band cache (see near_far_from_fine_grid).
    Returns dict of per-ray render outputs + scalar regularizers.
    """
    batch = rays.shape[0]
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    if rays.shape[1] >= 10:
        depth_gt, depth_weight = rays[:, 8], rays[:, 9]
    else:
        depth_gt = jnp.zeros((batch,), rays.dtype)
        depth_weight = jnp.zeros((batch,), rays.dtype)
    if ray_mask is None:
        ray_mask = jnp.ones((batch,), rays.dtype)

    # normalize into the unit training sphere
    rays_o = (rays_o - scene.origin) / scene.radius
    near = near / scene.radius
    far = far / scene.radius
    depth_gt = depth_gt / scene.radius

    a_embedded = params["embedding_a"][ts]

    perturb = rcfg.perturb if perturb_overwrite < 0 else perturb_overwrite
    z_vals, z_vals_outside, sample_dist = sparse_sampler(
        jax.lax.stop_gradient(params), fc, rcfg, scene,
        rays_o, rays_d, near, far, rng, fine_grid, sfm_grid, perturb,
        surf_cache=surf_cache,
    )
    z_vals = jax.lax.stop_gradient(z_vals)
    sample_dist = jax.lax.stop_gradient(sample_dist)

    background_alpha = None
    background_sampled_color = None
    if rcfg.render_bg and rcfg.n_outside > 0:
        z_feed = merge_sorted(
            z_vals, jax.lax.stop_gradient(z_vals_outside)
        )
        n_total = z_feed.shape[1]
        eval_idx = None
        if 0 < rcfg.bg_samples < n_total - rcfg.n_outside:
            import numpy as np

            # coarse static stride over all sorted positions + the
            # n_outside tail exact (where the unmasked bg contribution
            # composites); see TPU.BG_SAMPLES in config/defaults.py
            coarse = np.round(
                np.linspace(0, n_total - 1, rcfg.bg_samples)
            ).astype(int)
            tail = np.arange(n_total - rcfg.n_outside, n_total)
            eval_idx = tuple(sorted(set(coarse.tolist()) | set(tail.tolist())))
        ret_out = render_core_outside(
            params, fc, rcfg, rays_o, rays_d, z_feed, sample_dist, a_embedded,
            eval_idx=eval_idx,
        )
        background_sampled_color = ret_out["sampled_color"]
        background_alpha = ret_out["alpha"]

    ret = render_core(
        params, fc, rcfg, rays_o, rays_d, z_vals, sample_dist, a_embedded,
        cos_anneal_ratio, background_alpha, background_sampled_color,
        background_rgb, ray_mask,
    )

    weights_sum = ret["weights_sum"]
    # semantic mesh mask: labeled-away classes should render empty
    if rcfg.mesh_mask_ids is not None:
        mask = jnp.ones_like(weights_sum)
        for mid in rcfg.mesh_mask_ids:
            mask = jnp.where(labels[:, None] == mid, 0.0, mask)
        p = jnp.clip(weights_sum, 1e-3, 1.0 - 1e-3)
        mask_error = -(mask * jnp.log(p) + (1.0 - mask) * jnp.log(1.0 - p))
    else:
        mask_error = jnp.zeros_like(weights_sum)

    if rcfg.floor_normal:
        floor_normal_error, floor_y_error, floor_count = _floor_loss(
            rcfg, scene, labels, ret["normals"], rays_o, rays_d, ret["depth"], ray_mask
        )
    else:
        floor_normal_error = jnp.zeros_like(ret["normals"])
        floor_y_error = jnp.zeros_like(ret["normals"])
        floor_count = jnp.zeros(())

    sfm_depth_sq = (ret["depth"] - depth_gt) ** 2 * depth_weight
    sfm_depth_valid = (depth_weight > 0).astype(rays.dtype) * ray_mask

    return {
        "color": ret["color"],
        "color_sphere": ret["color_sphere"],
        "color_bg": ret["color_bg"],
        "s_val": ret["s_val"],
        "cdf_fine": ret["cdf"],
        "gradients": ret["gradients"],
        "mask_error": mask_error,
        "weights": ret["weights"],
        "weights_sum": weights_sum,
        "weights_max": jnp.max(ret["weights"], axis=-1, keepdims=True),
        "gradient_error": ret["gradient_error"],
        "inside_sphere": ret["inside_sphere"],
        "depth": ret["depth"],
        "floor_normal_error": floor_normal_error,
        "floor_y_error": floor_y_error,
        "floor_count": floor_count,
        "sfm_depth_sq": sfm_depth_sq,
        "sfm_depth_valid": sfm_depth_valid,
        "ray_mask": ray_mask,
    }


def _floor_loss(rcfg, scene, labels, normals, rays_o, rays_d, depth, ray_mask):
    """Floor-normal + floor-height-variance regularizer, masked fixed-shape
    (reference rendering/renderer.py:918-945)."""
    floor_mask = jnp.zeros_like(labels, dtype=bool)
    for fid in rcfg.floor_label_ids:
        floor_mask = floor_mask | (labels == fid)
    fm = floor_mask.astype(normals.dtype) * ray_mask
    count = jnp.sum(fm)

    # gt floor normal: +z in GT coords pulled back to SFM
    ez = jnp.array([0.0, 0.0, 1.0], normals.dtype)
    gt_n = scene.sfm2gt[:3, :3].T @ ez
    gt_n = gt_n / jnp.linalg.norm(gt_n)

    err = jnp.abs(normals - gt_n[None, :]) * fm[:, None]

    xyz = rays_o + rays_d * depth[:, None]
    n_el = count * 3
    mean = jnp.sum(xyz * fm[:, None]) / jnp.maximum(n_el, 1.0)
    var = jnp.sum(((xyz - mean) ** 2) * fm[:, None]) / jnp.maximum(n_el - 1.0, 1.0)
    y_err = jnp.where(count > 0, var, 0.0)
    return err, jnp.broadcast_to(y_err, err.shape), count
