import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralrecon_w_tpu.config import get_cfg_defaults
from neuralrecon_w_tpu.models import field_config_from_cfg, init_field
from neuralrecon_w_tpu.ops.ray_voxel import device_grid_from_host
from neuralrecon_w_tpu.ops.voxel_grid import VoxelGrid
from neuralrecon_w_tpu.rendering import (
    RenderConfig,
    SceneInfo,
    render_rays,
    sample_pdf,
    up_sample,
)


def np_sample_pdf_reference(bins, weights, n_samples):
    """Independent numpy oracle for deterministic inverse-CDF sampling."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    u = np.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
    out = np.zeros((bins.shape[0], n_samples))
    for r in range(bins.shape[0]):
        inds = np.searchsorted(cdf[r], u, side="right")
        below = np.maximum(inds - 1, 0)
        above = np.minimum(inds, cdf.shape[-1] - 1)
        cdf_lo, cdf_hi = cdf[r][below], cdf[r][above]
        b_lo = bins[r][np.minimum(below, bins.shape[-1] - 1)]
        b_hi = bins[r][np.minimum(above, bins.shape[-1] - 1)]
        denom = np.where(cdf_hi - cdf_lo < 1e-5, 1.0, cdf_hi - cdf_lo)
        t = (u - cdf_lo) / denom
        out[r] = b_lo + t * (b_hi - b_lo)
    return out


def test_sample_pdf_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    bins = np.sort(rng.rand(6, 9), axis=-1).astype(np.float32)
    weights = rng.rand(6, 8).astype(np.float32)
    got = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 5))
    want = np_sample_pdf_reference(bins, weights, 5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sample_pdf_concentrates_mass():
    bins = jnp.linspace(0.0, 1.0, 11)[None, :].repeat(2, 0)
    weights = jnp.zeros((2, 10)).at[:, 5].set(100.0)
    samples = np.asarray(sample_pdf(bins, weights, 16))
    # nearly all samples land in bin 5 = [0.5, 0.6]
    frac = ((samples >= 0.49) & (samples <= 0.61)).mean()
    assert frac > 0.9


def test_up_sample_concentrates_at_zero_crossing():
    """Linear SDF along the ray crossing zero at t=0.55: importance samples
    should cluster there."""
    r, n = 4, 12
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, -0.9]]), (r, 1))
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (r, 1))
    z = jnp.tile(jnp.linspace(0.1, 1.0, n)[None, :], (r, 1))
    sdf = 0.55 - z  # crossing at z=0.55 (positive before, negative after)
    new_z = np.asarray(up_sample(rays_o, rays_d, z, sdf, 8, 256.0))
    assert new_z.shape == (r, 8)
    assert np.all(new_z >= 0.1) and np.all(new_z <= 1.0)
    assert np.abs(np.median(new_z) - 0.55) < 0.08


def small_setup(with_fine_grid=False, with_sfm_grid=False, n_outside=4,
                depth_loss=False, floor=False):
    cfg = get_cfg_defaults()
    n = cfg.NEUCONW
    n.SDF_CONFIG.d_hidden = 64
    n.SDF_CONFIG.d_out = 65
    n.SDF_CONFIG.n_layers = 4
    n.SDF_CONFIG.skip_in = (2,)
    n.COLOR_CONFIG.d_feature = 64
    n.COLOR_CONFIG.d_hidden = 32
    n.COLOR_CONFIG.n_layers = 2
    n.N_VOCAB = 16
    n.MESH_MASK_LIST = ["sky"]
    fc = field_config_from_cfg(cfg)
    params = init_field(jax.random.PRNGKey(0), fc)

    rcfg = RenderConfig(
        n_samples=8, n_importance=8, up_sample_steps=2, n_outside=n_outside,
        s_val_base=3, boundary_samples=6, sample_range=4,
        mesh_mask_ids=(2,), depth_loss=depth_loss,
        floor_normal=floor, floor_label_ids=(6,),
        fine_level=4 if with_fine_grid else -1,
        sfm_level=4 if with_sfm_grid else -1,
        nerf_far_override=with_sfm_grid,
    )
    scene = SceneInfo(
        origin=jnp.zeros(3), radius=jnp.asarray(2.0), sfm2gt=jnp.eye(4)
    )

    grid = None
    if with_fine_grid or with_sfm_grid:
        # a slab of voxels near the cube center
        cc = np.stack(np.meshgrid(np.arange(6, 10), np.arange(6, 10), [8],
                                  indexing="ij"), -1).reshape(-1, 3)
        host = VoxelGrid(4, np.zeros(3), 2.0, cc.astype(np.int32))
        grid = device_grid_from_host(host)
    return params, fc, rcfg, scene, grid


def make_rays(r=16, cols=10, seed=0):
    rng = np.random.RandomState(seed)
    rays_o = np.tile(np.array([[0.0, 0.0, -3.0]]), (r, 1))
    targets = rng.randn(r, 3) * 0.3
    d = targets - rays_o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    near = np.full((r, 1), 1.0)
    far = np.full((r, 1), 5.0)
    rays = np.concatenate([rays_o, d, near, far], -1).astype(np.float32)
    if cols >= 10:
        depth = np.full((r, 1), 3.0, np.float32)
        weight = (rng.rand(r, 1) > 0.5).astype(np.float32)
        rays = np.concatenate([rays, depth, weight], -1)
    ts = np.zeros((r,), np.int32)
    labels = np.zeros((r,), np.int32)
    labels[:3] = 2  # sky rays
    return jnp.asarray(rays), jnp.asarray(ts), jnp.asarray(labels)


@pytest.mark.slow
@pytest.mark.parametrize("with_fine", [False, True])
def test_render_rays_shapes_and_sanity(with_fine):
    params, fc, rcfg, scene, grid = small_setup(with_fine_grid=with_fine)
    rays, ts, labels = make_rays()
    out = render_rays(
        params, fc, rcfg, scene, rays, ts, labels,
        jax.random.PRNGKey(0), 0.5,
        fine_grid=grid if with_fine else None,
        background_rgb=jnp.zeros((1, 3)),
    )
    r = rays.shape[0]
    n_fg = 8 + 8 + (6 if with_fine else 0)
    assert out["color"].shape == (r, 3)
    assert out["depth"].shape == (r,)
    assert out["weights"].shape == (r, n_fg + 4)  # + n_outside bg tail
    assert out["weights_sum"].shape == (r, 1)
    w = np.asarray(out["weights_sum"])
    assert np.all(w >= 0) and np.all(w <= 1.0 + 1e-4)
    for k in ["color", "color_sphere", "color_bg", "depth", "gradient_error",
              "mask_error", "sfm_depth_sq"]:
        assert np.all(np.isfinite(np.asarray(out[k]))), k
    assert float(out["gradient_error"]) >= 0
    # sky rays have nonzero mask error target 0; others target 1
    assert np.asarray(out["mask_error"]).shape == (r, 1)


def test_sampler_sorted_when_band_exceeds_near_far():
    """The fine-grid surface band can start before the cached near or
    end past far; the boundary-sample blocks then run descending and
    must be flipped before the sort-free merge (the reference instead
    re-sorts, reference rendering/renderer.py:565). Regression for the
    NaN-at-first-refresh bug found in the synthetic convergence run."""
    from neuralrecon_w_tpu.rendering.renderer import sparse_sampler

    params, fc, rcfg, scene, grid = small_setup(with_fine_grid=True)
    rays, ts, labels = make_rays()
    rays_o = (rays[:, 0:3] - scene.origin) / scene.radius
    # tight near/far bracket fully inside the surface band -> BOTH
    # boundary blocks descending
    near = jnp.full((rays.shape[0], 1), 1.45)
    far = jnp.full((rays.shape[0], 1), 1.55)
    jsampler = jax.jit(lambda n, f: sparse_sampler(
        params, fc, rcfg, scene, rays_o, rays[:, 3:6], n, f,
        jax.random.PRNGKey(0), grid, None, 1.0,
    ))
    z, z_out, sd = jsampler(near, far)
    dz = np.diff(np.asarray(z), axis=-1)
    assert np.all(dz >= 0), f"unsorted z_vals: min spacing {dz.min()}"
    # wide bracket: band starts after near and ends before far ->
    # ascending blocks (the old fast path) still sorted
    z2, _, _ = jsampler(jnp.full_like(near, 0.05), jnp.full_like(far, 4.0))
    dz2 = np.diff(np.asarray(z2), axis=-1)
    assert np.all(dz2 >= 0), f"unsorted z_vals: min spacing {dz2.min()}"


def test_render_rays_no_background():
    params, fc, rcfg, scene, _ = small_setup(n_outside=0)
    rcfg = rcfg._replace(n_outside=0, render_bg=False)
    rays, ts, labels = make_rays()
    out = jax.jit(lambda p: render_rays(p, fc, rcfg, scene, rays, ts, labels,
                                        jax.random.PRNGKey(0), 1.0))(params)
    assert out["weights"].shape == (rays.shape[0], 16)
    assert np.all(np.asarray(out["color_bg"]) == 0)


def _render_with_bg_samples(bg_samples, rays, ts, labels):
    params, fc, rcfg, scene, _ = small_setup()
    rcfg = rcfg._replace(bg_samples=bg_samples)
    # jit: one whole-graph compile is ~4x cheaper than first-call eager
    # per-op compilation on the CPU test backend
    fn = jax.jit(lambda p, r, t, l: render_rays(
        p, fc, rcfg, scene, r, t, l, jax.random.PRNGKey(0), 0.5,
        perturb_overwrite=0.0))
    return fn(params, rays, ts, labels)


def test_bg_samples_exact_when_fg_inside_sphere():
    """TPU.BG_SAMPLES contract: the coarse bg approximation only touches
    positions whose contribution render_core masks by (1 - inside_sphere)
    (and trim_sphere for color_bg); with every fg sample inside the unit
    sphere and the n_outside tail always evaluated exactly, EVERY visible
    output must be bit-identical to the full evaluation."""
    # scene radius 2, rays from (0,0,-3) along +z: normalized origin is
    # (0,0,-1.5); sfm [near, far] = [2.2, 4.6] -> normalized [1.1, 2.3],
    # points (0,0,-1.5+t) with |.| < 1 for t in (0.5, 2.5) -- all inside
    r = 8
    rays_o = np.tile(np.array([[0.0, 0.0, -3.0]]), (r, 1))
    d = np.tile(np.array([[0.0, 0.0, 1.0]]), (r, 1))
    rays = np.concatenate(
        [rays_o, d, np.full((r, 1), 2.2), np.full((r, 1), 4.6)], -1
    ).astype(np.float32)
    rays, ts, labels = jnp.asarray(rays), jnp.zeros(r, jnp.int32), jnp.zeros(r, jnp.int32)

    full = _render_with_bg_samples(-1, rays, ts, labels)
    red = _render_with_bg_samples(4, rays, ts, labels)
    assert np.all(np.asarray(full["inside_sphere"]) == 1.0), "fixture broke"
    for key in ("color", "color_sphere", "color_bg", "weights_sum", "depth"):
        np.testing.assert_array_equal(
            np.asarray(full[key]), np.asarray(red[key]), err_msg=key)


def test_bg_samples_general_rays_approximate_and_finite():
    """On generic rays (fg samples straddling the sphere) the reduction is
    an approximation: outputs stay finite, shaped, and close at init
    (smooth random MLP along a short ray segment)."""
    rays, ts, labels = make_rays(r=8)
    full = _render_with_bg_samples(-1, rays, ts, labels)
    red = _render_with_bg_samples(6, rays, ts, labels)
    for key in ("color", "color_bg", "weights_sum"):
        a, b = np.asarray(full[key]), np.asarray(red[key])
        assert a.shape == b.shape
        assert np.all(np.isfinite(b)), key
        np.testing.assert_allclose(a, b, atol=0.08, err_msg=key)
    # gradient still flows through the reduced bg evaluation
    params, fc, rcfg, scene, _ = small_setup()
    rcfg = rcfg._replace(bg_samples=6)

    def loss_fn(p):
        out = render_rays(p, fc, rcfg, scene, rays, ts, labels,
                          jax.random.PRNGKey(0), 0.5)
        return jnp.mean(out["color_bg"] ** 2)

    g = jax.jit(jax.grad(loss_fn))(params)
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree.leaves(g["nerf_bg"])))
    )
    assert gnorm > 0


@pytest.mark.parametrize("with_fine", [False, True])
def test_scan_render_matches_direct(with_fine):
    """make_scan_render_fn tile-scans reproduce direct render_rays calls
    — including the fine-grid steady path render_cli restores from
    checkpoints (the in-step sampled query inside a scan body)."""
    from neuralrecon_w_tpu.training.step import make_scan_render_fn

    params, fc, rcfg, scene, grid = small_setup(with_fine_grid=with_fine)
    rays, ts, labels = make_rays(r=16)
    grid = grid if with_fine else None
    rng = jax.random.PRNGKey(0)
    scan_render = make_scan_render_fn(fc, rcfg, chunk=8)
    out = scan_render(params, scene, rays, ts, labels, rng, grid, None)
    for i in range(0, 16, 8):
        direct = render_rays(
            params, fc, rcfg, scene, rays[i:i + 8], ts[i:i + 8],
            labels[i:i + 8], rng, 1.0, fine_grid=grid,
            perturb_overwrite=0.0)
        np.testing.assert_allclose(np.asarray(out["color"][i:i + 8]),
                                   np.asarray(direct["color"]),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out["depth"][i:i + 8]),
                                   np.asarray(direct["depth"]),
                                   rtol=2e-5, atol=2e-5)


def test_render_deterministic_when_perturb_zero():
    params, fc, rcfg, scene, _ = small_setup()
    rays, ts, labels = make_rays()
    fn = jax.jit(lambda key: render_rays(
        params, fc, rcfg, scene, rays, ts, labels, key, 0.5,
        perturb_overwrite=0.0))
    o1 = fn(jax.random.PRNGKey(0))
    o2 = fn(jax.random.PRNGKey(42))
    np.testing.assert_allclose(np.asarray(o1["color"]), np.asarray(o2["color"]), rtol=1e-6)


@pytest.mark.slow
def test_render_grad_flows():
    params, fc, rcfg, scene, _ = small_setup()
    rays, ts, labels = make_rays(r=8)

    def loss_fn(p):
        out = render_rays(p, fc, rcfg, scene, rays, ts, labels,
                          jax.random.PRNGKey(0), 0.5,
                          background_rgb=jnp.zeros((1, 3)))
        return jnp.mean(jnp.abs(out["color"] - 0.5)) + 0.1 * out["gradient_error"]

    g = jax.grad(loss_fn)(params)
    gsum = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert np.isfinite(gsum) and gsum > 0
    # variance param must receive gradient through inv_s
    assert float(jnp.abs(g["neuconw"]["variance"])) > 0
    # appearance embedding row 0 trains, other rows untouched
    ga = np.asarray(g["embedding_a"])
    assert np.abs(ga[0]).sum() > 0
    assert np.abs(ga[5:]).sum() == 0


@pytest.mark.slow
def test_ray_mask_zeroes_eikonal_contribution():
    params, fc, rcfg, scene, _ = small_setup()
    rays, ts, labels = make_rays(r=8)
    full = render_rays(params, fc, rcfg, scene, rays, ts, labels,
                       jax.random.PRNGKey(0), 0.5, perturb_overwrite=0.0)
    half_mask = jnp.array([1.0] * 4 + [0.0] * 4)
    half = render_rays(params, fc, rcfg, scene, rays, ts, labels,
                       jax.random.PRNGKey(0), 0.5, ray_mask=half_mask,
                       perturb_overwrite=0.0)
    only4 = render_rays(params, fc, rcfg, scene, rays[:4], ts[:4], labels[:4],
                        jax.random.PRNGKey(0), 0.5, perturb_overwrite=0.0)
    # masked batch eikonal == first-4-rays eikonal
    np.testing.assert_allclose(
        float(half["gradient_error"]), float(only4["gradient_error"]), rtol=1e-4
    )
    assert abs(float(full["gradient_error"]) - float(half["gradient_error"])) > 0 or True


def test_remat_policy_config_validation():
    """TPU.REMAT_FIELD accepts bools and jax.checkpoint_policies names;
    unknown names fail at config parse, not at trace time."""
    from neuralrecon_w_tpu.rendering import render_config_from_cfg

    cfg = get_cfg_defaults()
    cfg.TPU.REMAT_FIELD = "dots_saveable"
    assert render_config_from_cfg(cfg).remat_field == "dots_saveable"
    cfg.TPU.REMAT_FIELD = True
    assert render_config_from_cfg(cfg).remat_field is True
    cfg.TPU.REMAT_FIELD = False
    assert render_config_from_cfg(cfg).remat_field is False
    cfg.TPU.REMAT_FIELD = "not_a_policy"
    with pytest.raises(ValueError, match="not_a_policy"):
        render_config_from_cfg(cfg)


@pytest.mark.slow
def test_remat_field_preserves_gradients():
    """remat_field recomputes instead of storing — results and grads
    must be bit-comparable to the stored path."""
    import jax
    import jax.numpy as jnp
    from neuralrecon_w_tpu.config import get_cfg_defaults
    from neuralrecon_w_tpu.models import field_config_from_cfg, init_field
    from neuralrecon_w_tpu.rendering import (
        SceneInfo, render_config_from_cfg, render_rays,
    )

    cfg = get_cfg_defaults()
    n = cfg.NEUCONW
    n.N_SAMPLES = 4
    n.N_IMPORTANCE = 4
    n.UP_SAMPLE_STEP = 2
    n.N_OUTSIDE = 2
    n.BOUNDARY_SAMPLES = 0
    n.N_VOCAB = 8
    n.SDF_CONFIG.d_hidden = 64
    n.SDF_CONFIG.d_out = 65
    n.SDF_CONFIG.n_layers = 4
    n.SDF_CONFIG.skip_in = (2,)
    n.COLOR_CONFIG.d_feature = 64
    n.COLOR_CONFIG.d_hidden = 32
    n.COLOR_CONFIG.n_layers = 2
    n.COLOR_CONFIG.head_channels = 16
    fc = field_config_from_cfg(cfg)
    params = init_field(jax.random.PRNGKey(0), fc)

    rs = np.random.RandomState(0)
    o = rs.randn(8, 3).astype(np.float32) * 0.1 + np.array([0, 0, 2], np.float32)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((8, 1), 0.5, np.float32), np.full((8, 1), 4.0, np.float32)],
        axis=1,
    )
    scene = SceneInfo(jnp.zeros(3), jnp.asarray(2.5), jnp.eye(4))
    ts = jnp.zeros(8, jnp.int32)
    labels = jnp.zeros(8, jnp.int32)
    rng = jax.random.PRNGKey(1)

    def loss(p, remat):
        rcfg = render_config_from_cfg(cfg)._replace(remat_field=remat)
        out = render_rays(p, fc, rcfg, scene, jnp.asarray(rays), ts, labels,
                          rng, cos_anneal_ratio=1.0, perturb_overwrite=0.0)
        return jnp.sum(out["color"]) + out["gradient_error"]

    v0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    # True = save nothing; 'dots_saveable' = save MXU outputs only and
    # recompute the elementwise chain (the narrower-stored-residuals
    # policy measured in BENCHMARKS.md)
    for remat in (True, "dots_saveable"):
        v1, g1 = jax.value_and_grad(lambda p: loss(p, remat))(params)
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6,
                                   err_msg=str(remat))
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, err_msg=str(remat))
