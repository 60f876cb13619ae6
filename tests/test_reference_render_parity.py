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
