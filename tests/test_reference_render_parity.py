"""Foreground/background compositing parity vs the reference renderer.

render_core / render_core_outside contain the NeuS alpha math, annealed
cos, fg/bg compositing and eikonal reduction — the hot-path numerics
F-score parity rides on. We call the reference methods with a stubbed
`self` and a deterministic analytic field (identical torch and jax
implementations), and require our render_core/render_core_outside to
reproduce color / weights / depth / gradient_error to f32 tolerance."""

import sys
import types
from unittest import mock

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

N_A = 8
INV_S = 24.0


@pytest.fixture(scope="module")
def ref_renderer():
    for name in ["open3d", "kaolin", "kaolin.ops", "kaolin.ops.spc",
                 "kaolin.render", "kaolin.render.spc", "trimesh", "cv2",
                 "torchvision", "yaml"]:
        sys.modules.setdefault(name, mock.MagicMock())
    dsets = types.ModuleType("datasets")
    dsets.__path__ = []
    mu = types.ModuleType("datasets.mask_utils")
    mu.get_label_id_mapping = lambda: {}
    sys.modules["datasets"] = dsets
    sys.modules["datasets.mask_utils"] = mu
    tools = types.ModuleType("tools")
    tools.__path__ = []
    tpd = types.ModuleType("tools.prepare_data")
    tpd.__path__ = []
    gv = types.ModuleType("tools.prepare_data.generate_voxel")
    gv.get_near_far = mock.MagicMock()
    gv.gen_octree_from_sfm = mock.MagicMock()
    gv.octree_to_spc = mock.MagicMock()
    sys.modules["tools"] = tools
    sys.modules["tools.prepare_data"] = tpd
    sys.modules["tools.prepare_data.generate_voxel"] = gv
    sys.path.insert(0, "/root/reference")
    from rendering import renderer as ref

    return ref


# ---- identical analytic field in torch and jax ----

def field_torch(pts, dirs, a):
    sdf = pts.norm(dim=-1) - 0.6
    grad = pts / pts.norm(dim=-1, keepdim=True).clamp_min(1e-9)
    rgb = torch.sigmoid(pts * 1.3 + dirs * 0.3 + a[:, :3])
    return rgb, sdf, grad


def field_jax(pts, dirs, a):
    n = jnp.maximum(jnp.linalg.norm(pts, axis=-1, keepdims=True), 1e-9)
    sdf = n[..., 0] - 0.6
    grad = pts / n
    rgb = jax.nn.sigmoid(pts * 1.3 + dirs * 0.3 + a[:, :3])
    return rgb, sdf, grad


def bg_torch(pts4, dirs, a):
    density = (pts4[:, :1] * 2 + pts4[:, 3:4]).sin() * 2.0
    rgb = torch.sigmoid(pts4[:, :3] + 0.2 * dirs + a[:, :3])
    return density, rgb


def bg_jax(pts4, dirs, a):
    density = jnp.sin(pts4[:, :1] * 2 + pts4[:, 3:4]) * 2.0
    rgb = jax.nn.sigmoid(pts4[:, :3] + 0.2 * dirs + a[:, :3])
    return density, rgb


def make_inputs(batch=12, n=9, n_bg=4, seed=0):
    rs = np.random.RandomState(seed)
    o = (rs.randn(batch, 3) * 0.15 + [0, 0, 0.9]).astype(np.float32)
    d = -o + rs.randn(batch, 3).astype(np.float32) * 0.1
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    z = np.sort(rs.rand(batch, n).astype(np.float32) * 1.8 + 0.05, axis=-1)
    z_out = np.sort(rs.rand(batch, n_bg).astype(np.float32) * 3 + 2.0, axis=-1)
    sample_dist = (rs.rand(batch, 1).astype(np.float32) * 0.1 + 0.05)
    a = rs.randn(batch, N_A).astype(np.float32)
    return o, d, z, z_out, sample_dist, a


class StubSelf:
    save_sample = False
    trim_sphere = True
    n_outside = 4


def test_render_core_outside_parity(ref_renderer):
    from neuralrecon_w_tpu.rendering import renderer as ours

    o, d, z, z_out, sd, a = make_inputs()
    z_feed = np.sort(np.concatenate([z, z_out], axis=-1), axis=-1)

    stub = StubSelf()

    def nerf(pts4, dirs, a_):
        return bg_torch(pts4, dirs, a_)

    ref_out = ref_renderer.NeuconWRenderer.render_core_outside(
        stub, torch.from_numpy(o), torch.from_numpy(d),
        torch.from_numpy(z_feed), torch.from_numpy(sd), nerf,
        a_embedded=torch.from_numpy(a),
    )

    orig = ours.field_background

    def bg_stub(params, fc, pts4, dirs, a_, n_samples=None):
        if n_samples is not None:
            def up(t):
                return jnp.broadcast_to(
                    t[:, None, :], (t.shape[0], n_samples, t.shape[-1])
                ).reshape(-1, t.shape[-1])

            dirs, a_ = up(dirs), up(a_)
        return bg_jax(pts4, dirs, a_)

    ours.field_background = bg_stub
    try:
        out = ours.render_core_outside(
            None, None, None, jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(z_feed), jnp.asarray(sd), jnp.asarray(a),
        )
    finally:
        ours.field_background = orig

    np.testing.assert_allclose(np.asarray(out["color"]),
                               ref_out["color"].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["alpha"]),
                               ref_out["alpha"].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["sampled_color"]),
                               ref_out["sampled_color"].numpy(), atol=2e-5)


# ---------------- full render() composition parity ----------------


class _AnalyticNeuconW:
    """Callable + .sdf, the two surfaces render_core / sparse_sampler use
    (reference rendering/renderer.py:610,947)."""

    def __call__(self, x):
        b, s, c = x.shape
        flat = x.reshape(-1, c)
        pts, dirs, a_ = flat[:, :3], flat[:, 3:6], flat[:, 6:]
        rgb, sdf, grad = field_torch(pts, dirs, a_)
        return (rgb.reshape(b, s, 3), torch.tensor([[INV_S]]),
                sdf.reshape(b, s), grad.reshape(b, s, 3))

    def sdf(self, pts):
        return pts.norm(dim=-1) - 0.6


def _analytic_surface(o_sfm, d):
    """Deterministic stand-in for the kaolin octree first-hit query:
    a smooth positive distance with every 5th ray missing (<= 0)."""
    s = 2.0 + 0.5 * np.sin(o_sfm[:, 0] * 3.0 + d[:, 1] * 5.0)
    s[::5] = -1.0
    return s.astype(np.float32)


@pytest.mark.parametrize("phase", ["warmup", "steady"])
def test_full_render_parity(ref_renderer, phase):
    """Every key of the reference NeuconWRenderer.render output dict
    (reference rendering/renderer.py:785-916) against our render_rays on
    the SAME analytic field and the SAME octree stub: normalization,
    appearance lookup, sparse_sampler (uniform + 2 importance rounds +
    boundary merge in 'steady'), bg/fg compositing, mask / floor /
    sfm-depth errors. The octree is stubbed at the kaolin-call boundary
    (reference get_near_far at renderer.py:430) so the reference's real
    get_near_far_sdf band math runs; our side consumes the identical
    (surf, hit) through the production surf_cache path."""
    import types as pytypes

    from neuralrecon_w_tpu.models import neuconw as nw_mod
    from neuralrecon_w_tpu.rendering import renderer as ours

    ref = ref_renderer
    steady = phase == "steady"
    batch, n_a = 20, N_A
    radius, vs, sample_range = 2.5, 0.02, 16
    rs = np.random.RandomState(11)

    origin = np.array([0.3, -0.2, 0.1], np.float32)
    # rays in SFM units aimed near the sphere center
    o = (rs.randn(batch, 3) * 0.3 + [0.3, -0.2, -2.3]).astype(np.float32)
    d = np.array([0.3, -0.2, 0.1], np.float32) - o + rs.randn(batch, 3).astype(np.float32) * 0.15
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    near = (rs.rand(batch, 1).astype(np.float32) * 0.4 + 1.0)
    far = near + 2.5 + rs.rand(batch, 1).astype(np.float32)
    depth = (near[:, 0] + 1.2).astype(np.float32)
    weight = (rs.rand(batch) > 0.4).astype(np.float32)
    rays = np.concatenate([o, d, near, far, depth[:, None], weight[:, None]], -1)
    ts = rs.randint(0, 12, size=batch).astype(np.int64)
    labels = np.zeros(batch, np.int64)
    labels[:4] = 2   # sky (mesh mask)
    labels[4:8] = 6  # floor
    emb = rs.randn(12, n_a).astype(np.float32) * 0.3

    rot = np.array([[0.36, 0.48, -0.8], [-0.8, 0.6, 0.0], [0.48, 0.64, 0.6]],
                   np.float32)  # a rotation matrix
    sfm2gt = np.eye(4, dtype=np.float32)
    sfm2gt[:3, :3] = rot

    # ---------------- reference ----------------
    stub = object.__new__(ref.NeuconWRenderer)
    stub.nerf = lambda pts4, dirs, a_: bg_torch(pts4, dirs, a_)
    stub.neuconw = _AnalyticNeuconW()
    stub.embeddings = {
        "a": torch.nn.Embedding.from_pretrained(torch.from_numpy(emb))
    }
    stub.n_samples, stub.n_importance, stub.up_sample_steps = 8, 16, 2
    stub.n_outside, stub.s_val_base = 4, 1
    stub.boundary_samples, stub.sample_range = 10, sample_range
    stub.perturb = 1.0
    stub.nerf_far_override = False
    stub.octree_data = None
    stub.render_bg = stub.trim_sphere = True
    stub.save_sample = stub.save_step_sample = False
    stub.save_step_itr = 0
    stub.mesh_mask_list = ["sky"]
    stub.floor_normal = steady
    stub.floor_labels = ["floor"]
    stub.depth_loss = True
    stub.origin = torch.from_numpy(origin)
    stub.radius = radius
    stub.sfm_to_gt = torch.from_numpy(sfm2gt)
    stub.fine_octree_data = (
        {"octree": None, "scene_origin": torch.zeros(3), "scale": 1.0,
         "level": 8, "voxel_size": vs, "spc_data": None}
        if steady else None
    )

    saved_gnf, saved_map = ref.get_near_far, ref.get_label_id_mapping
    ref.get_label_id_mapping = lambda: {"sky": 2, "floor": 6}
    ref.get_near_far = lambda rays_o, rays_d, octree, org, scale, level, \
        spc_data=None, visualize=False, ind=0: (
            torch.from_numpy(_analytic_surface(rays_o.numpy(), rays_d.numpy())),
            None,
        )
    try:
        ref_out = ref.NeuconWRenderer.render(
            stub, torch.from_numpy(rays), torch.from_numpy(ts),
            torch.from_numpy(labels), perturb_overwrite=0,
            cos_anneal_ratio=0.37,
        )
    finally:
        ref.get_near_far, ref.get_label_id_mapping = saved_gnf, saved_map

    # ---------------- ours ----------------
    rcfg = ours.RenderConfig(
        n_samples=8, n_importance=16, up_sample_steps=2, n_outside=4,
        s_val_base=1, boundary_samples=10, sample_range=sample_range,
        mesh_mask_ids=(2,), depth_loss=True,
        floor_normal=steady, floor_label_ids=(6,),
        fine_level=8 if steady else -1,
    )
    scene = ours.SceneInfo(origin=jnp.asarray(origin),
                           radius=jnp.asarray(radius),
                           sfm2gt=jnp.asarray(sfm2gt))
    params = {"embedding_a": jnp.asarray(emb)}

    surf_cache = fine_grid = None
    if steady:
        # identical analytic surface through the production surf_cache
        # path (DeviceRayPool.attach_surface's contract)
        o_unit = (o - origin) / radius
        o_sfm = o_unit * radius + origin
        surf = _analytic_surface(o_sfm.astype(np.float32), d)
        surf_cache = (jnp.asarray(surf), jnp.asarray(surf > 0))
        fine_grid = pytypes.SimpleNamespace(voxel_size=vs)

    def field_forward_stub(p, fc, pts, dirs, a_, n_samples=None):
        if n_samples is not None:
            def up(t):
                return jnp.broadcast_to(
                    t[:, None, :], (t.shape[0], n_samples, t.shape[-1])
                ).reshape(-1, t.shape[-1])

            dirs, a_ = up(dirs), up(a_)
        rgb, sdf, grad = field_jax(pts, dirs, a_)
        return rgb, jnp.asarray(INV_S), sdf, grad

    def field_sdf_stub(p, fc, pts):
        return jnp.linalg.norm(pts, axis=-1) - 0.6

    def bg_stub(p, fc, pts4, dirs, a_, n_samples=None):
        if n_samples is not None:
            def up(t):
                return jnp.broadcast_to(
                    t[:, None, :], (t.shape[0], n_samples, t.shape[-1])
                ).reshape(-1, t.shape[-1])

            dirs, a_ = up(dirs), up(a_)
        return bg_jax(pts4, dirs, a_)

    saved = (ours.field_forward, ours.field_sdf, ours.field_background)
    ours.field_forward, ours.field_sdf, ours.field_background = (
        field_forward_stub, field_sdf_stub, bg_stub)
    try:
        # jit: whole-graph compile beats first-call eager per-op
        # compilation on the CPU test backend (the analytic stubs are
        # jnp-traceable)
        out = jax.jit(lambda p: ours.render_rays(
            p, None, rcfg, scene, jnp.asarray(rays),
            jnp.asarray(ts.astype(np.int32)),
            jnp.asarray(labels.astype(np.int32)),
            jax.random.PRNGKey(0), 0.37,
            fine_grid=fine_grid, surf_cache=surf_cache,
            perturb_overwrite=0.0,
        ))(params)
    finally:
        ours.field_forward, ours.field_sdf, ours.field_background = saved

    def close(key, a, b, atol=1e-4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol,
                                   err_msg=key)

    close("color", out["color"], ref_out["color"].numpy())
    close("color_sphere", out["color_sphere"], ref_out["color_sphere"].numpy())
    close("color_bg", out["color_bg"], ref_out["color_bg"].numpy())
    close("s_val", out["s_val"], ref_out["s_val"].numpy().mean())
    close("cdf_fine", out["cdf_fine"], ref_out["cdf_fine"].numpy())
    close("gradients", out["gradients"], ref_out["gradients"].numpy())
    close("mask_error", out["mask_error"], ref_out["mask_error"].numpy())
    close("weights", out["weights"], ref_out["weights"].numpy())
    close("weights_sum", out["weights_sum"], ref_out["weights_sum"].numpy())
    close("weights_max", out["weights_max"], ref_out["weights_max"].numpy())
    close("gradient_error", out["gradient_error"],
          float(ref_out["gradient_error"]))
    close("inside_sphere", out["inside_sphere"],
          ref_out["inside_sphere"].numpy())
    close("depth", out["depth"], ref_out["depth"].numpy())
    # fixed-shape sfm depth loss vs the reference's boolean-indexed one
    ours_sfm = np.asarray(out["sfm_depth_sq"])[np.asarray(out["sfm_depth_valid"]) > 0]
    close("sfm_depth_loss", ours_sfm, ref_out["sfm_depth_loss"].numpy())
    if steady:
        fm = np.isin(labels, [6])
        close("floor_normal_error", np.asarray(out["floor_normal_error"])[fm],
              ref_out["floor_normal_error"].numpy())
        close("floor_y_error", np.asarray(out["floor_y_error"])[fm],
              ref_out["floor_y_error"].numpy())
    else:
        close("floor_normal_error", out["floor_normal_error"],
              ref_out["floor_normal_error"].numpy())


@pytest.mark.parametrize("cos_anneal", [0.0, 0.37, 1.0])
def test_render_core_parity(ref_renderer, cos_anneal):
    from neuralrecon_w_tpu.models import neuconw as nw_mod
    from neuralrecon_w_tpu.rendering import renderer as ours

    batch, n, n_bg = 12, 9, 4
    o, d, z, z_out, sd, a = make_inputs(batch, n, n_bg)
    rs = np.random.RandomState(7)
    bg_alpha = rs.rand(batch, n + n_bg).astype(np.float32) * 0.5
    bg_color = rs.rand(batch, n + n_bg, 3).astype(np.float32)

    # --- reference ---
    stub = StubSelf()
    stub.render_depth = lambda al, zz: ref_renderer.NeuconWRenderer.render_depth(
        stub, al, zz
    )

    def neuconw(x):
        b, s, c = x.shape
        flat = x.reshape(-1, c)
        pts, dirs, a_ = flat[:, :3], flat[:, 3:6], flat[:, 6:]
        rgb, sdf, grad = field_torch(pts, dirs, a_)
        return (rgb.reshape(b, s, 3), torch.tensor([[INV_S]]),
                sdf.reshape(b, s), grad.reshape(b, s, 3))

    stub.neuconw = neuconw
    ref_out = ref_renderer.NeuconWRenderer.render_core(
        stub, torch.from_numpy(o), torch.from_numpy(d), torch.from_numpy(z),
        torch.from_numpy(sd), torch.from_numpy(a),
        cos_anneal_ratio=cos_anneal,
        background_alpha=torch.from_numpy(bg_alpha),
        background_sampled_color=torch.from_numpy(bg_color),
        background_rgb=None,
    )

    # --- ours (field monkeypatched to the identical analytic field) ---
    def field_forward_stub(params, fc, pts, dirs, a_, n_samples=None):
        if n_samples is not None:
            # render_core passes per-ray dirs/appearance (renderer.py
            # n_samples path); the analytic stub wants per-sample rows
            def up(t):
                return jnp.broadcast_to(
                    t[:, None, :], (t.shape[0], n_samples, t.shape[-1])
                ).reshape(-1, t.shape[-1])

            dirs, a_ = up(dirs), up(a_)
        rgb, sdf, grad = field_jax(pts, dirs, a_)
        return rgb, jnp.asarray(INV_S), sdf, grad

    orig = ours.field_forward
    ours.field_forward = field_forward_stub
    try:
        rcfg = ours.RenderConfig(trim_sphere=True)
        out = ours.render_core(
            None, None, rcfg, jnp.asarray(o), jnp.asarray(d), jnp.asarray(z),
            jnp.asarray(sd), jnp.asarray(a), cos_anneal,
            jnp.asarray(bg_alpha), jnp.asarray(bg_color), None,
            jnp.ones((batch,), jnp.float32),
        )
    finally:
        ours.field_forward = orig

    np.testing.assert_allclose(np.asarray(out["color"]),
                               ref_out["color"].numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["weights"]),
                               ref_out["weights"].numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["weights_sum"]),
                               ref_out["weights_sum"].numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               ref_out["depth"].numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["color_sphere"]),
                               ref_out["color_sphere"].numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["s_val"]),
                               ref_out["s_val"].numpy().mean(), atol=1e-6)
    np.testing.assert_allclose(float(out["gradient_error"]),
                               float(ref_out["gradient_error"]), atol=3e-5)
