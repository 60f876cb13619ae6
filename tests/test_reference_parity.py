"""Direct numerical parity against the reference torch models.

The reference's model files (reference models/neuconw.py, models/nerf.py)
import only torch/numpy, so we can instantiate them on CPU, transplant
their weights into our parameter pytrees, and require the forward passes
to agree to float32 tolerance. This pins down every architectural detail
F-score parity depends on (PE ordering, skip layout, weight-norm
semantics, activation placement)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from neuralrecon_w_tpu.models.color import apply_color
from neuralrecon_w_tpu.models.nerf_bg import apply_nerf_bg
from neuralrecon_w_tpu.models.sdf import apply_sdf


def wn_params(torch_lin):
    """torch weight_norm Linear -> our {'v','g','b'} (transposed)."""
    return {
        "v": jnp.asarray(torch_lin.weight_v.detach().numpy().T),
        "g": jnp.asarray(torch_lin.weight_g.detach().numpy()[:, 0]),
        "b": jnp.asarray(torch_lin.bias.detach().numpy()),
    }


def lin_params(torch_lin):
    return {
        "w": jnp.asarray(torch_lin.weight.detach().numpy().T),
        "b": jnp.asarray(torch_lin.bias.detach().numpy()),
    }


SDF_CFG = dict(
    d_in=3, d_out=129, d_hidden=128, n_layers=6, skip_in=(3,), multires=6,
    bias=0.5, scale=1.5, geometric_init=True, weight_norm=True,
    inside_outside=False,
)


def test_sdf_network_forward_parity():
    from models.neuconw import SDFNetwork

    torch.manual_seed(0)
    ref = SDFNetwork(**SDF_CFG)
    ref.eval()

    params = {
        f"lin{l}": wn_params(getattr(ref, f"lin{l}"))
        for l in range(SDF_CFG["n_layers"] + 1)
    }
    pts = np.random.RandomState(0).randn(64, 3).astype(np.float32) * 0.7
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(pts)).numpy()
    ours = np.asarray(apply_sdf(params, SDF_CFG, jnp.asarray(pts)))
    np.testing.assert_allclose(ours, ref_out, atol=2e-5)


def test_sdf_gradient_parity():
    from models.neuconw import SDFNetwork

    torch.manual_seed(1)
    ref = SDFNetwork(**SDF_CFG)
    params = {
        f"lin{l}": wn_params(getattr(ref, f"lin{l}"))
        for l in range(SDF_CFG["n_layers"] + 1)
    }
    pts = np.random.RandomState(1).randn(16, 3).astype(np.float32) * 0.5
    ref_grad = ref.gradient(torch.from_numpy(pts)).detach().numpy().reshape(16, 3)

    from neuralrecon_w_tpu.models.sdf import sdf_value_feat_grad

    _, _, ours = sdf_value_feat_grad(params, SDF_CFG, jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(ours), ref_grad, atol=5e-5)


def test_rendering_network_parity():
    from models.neuconw import RenderingNetwork

    torch.manual_seed(2)
    d_feature, head = 64, 32
    ref = RenderingNetwork(
        d_feature=d_feature, mode="idr", d_in=9, d_out=3, d_hidden=48,
        n_layers=3, head_channels=head, in_channels_dir_a=16,
        static_head_layers=2, weight_norm=True, multires_view=4,
        squeeze_out=True, encode_apperence=True,
    )
    ref.eval()

    cfg = dict(d_in=9, d_feature=d_feature, mode="idr", d_out=3, d_hidden=48,
               n_layers=3, head_channels=head, static_head_layers=2,
               weight_norm=True, multires_view=4)
    params = {f"lin{l}": wn_params(getattr(ref, f"lin{l}")) for l in range(4)}
    params["xyz_final"] = lin_params(ref.xyz_encoding_final)
    params["static0"] = lin_params(ref.static_encoding.static_linear_0)
    params["static1"] = lin_params(ref.static_encoding.static_linear_1)

    rs = np.random.RandomState(2)
    n = 32
    points = rs.randn(n, 3).astype(np.float32) * 0.4
    normals = rs.randn(n, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    views = rs.randn(n, 3).astype(np.float32)
    views /= np.linalg.norm(views, axis=-1, keepdims=True)
    feat = rs.randn(n, d_feature).astype(np.float32)
    a = rs.randn(n, 16).astype(np.float32)

    with torch.no_grad():
        ref_rgb, _, _ = ref(
            torch.from_numpy(points), torch.from_numpy(normals),
            torch.from_numpy(views), torch.from_numpy(feat),
            torch.from_numpy(a),
        )
    ours = apply_color(params, cfg, True, jnp.asarray(points),
                       jnp.asarray(normals), jnp.asarray(views),
                       jnp.asarray(feat), jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(ours), ref_rgb.numpy(), atol=2e-5)


def test_background_nerf_parity():
    from models.nerf import NeRF

    torch.manual_seed(3)
    ref = NeRF(D=8, W=256, d_in=4, d_in_view=3, multires=10, multires_view=4,
               skips=[4], in_channels_a=48, in_channels_dir=27,
               encode_appearance=True, use_viewdirs=True)
    ref.eval()

    params = {f"pts{i}": lin_params(ref.pts_linears[i]) for i in range(8)}
    params["alpha"] = lin_params(ref.alpha_linear)
    params["feature"] = lin_params(ref.feature_linear)
    for s in range(4):
        params[f"app{s}"] = lin_params(
            getattr(ref.apperence_encoding, f"static_linear_{s}")
        )
    params["rgb"] = lin_params(ref.rgb_linear)

    rs = np.random.RandomState(3)
    n = 32
    pts4 = rs.rand(n, 4).astype(np.float32)
    views = rs.randn(n, 3).astype(np.float32)
    views /= np.linalg.norm(views, axis=-1, keepdims=True)
    a = rs.randn(n, 48).astype(np.float32)

    with torch.no_grad():
        ref_alpha, ref_rgb = ref(torch.from_numpy(pts4), torch.from_numpy(views),
                                 torch.from_numpy(a))
    alpha, rgb = apply_nerf_bg(params, True, jnp.asarray(pts4),
                               jnp.asarray(views), jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(alpha), ref_alpha.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(rgb), ref_rgb.numpy(), atol=2e-5)


def test_positional_encoding_parity():
    from models.neuconw import get_embedder

    from neuralrecon_w_tpu.models.layers import positional_encoding

    embed_fn, ch = get_embedder(6, input_dims=3)
    x = np.random.RandomState(4).randn(16, 3).astype(np.float32)
    ref = embed_fn(torch.from_numpy(x)).numpy()
    ours = np.asarray(positional_encoding(jnp.asarray(x), 6))
    assert ours.shape[-1] == ch
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_variance_parity():
    from models.neuconw import SingleVarianceNetwork

    ref = SingleVarianceNetwork(0.3)
    with torch.no_grad():
        ref_s = float(ref(torch.zeros(5, 3))[0, 0])
    from neuralrecon_w_tpu.models.neuconw import inv_s

    params = {"neuconw": {"variance": jnp.asarray(0.3)}}
    np.testing.assert_allclose(float(inv_s(params)), ref_s, rtol=1e-6)


def test_ade20k_label_mapping_parity():
    """All 150 ADE20K class ids must match the reference exactly —
    semantic masks index by these ids."""
    import importlib.util

    from neuralrecon_w_tpu.datasets.mask_utils import get_label_id_mapping

    spec = importlib.util.spec_from_file_location(
        "ref_mask_utils", "/root/reference/datasets/mask_utils.py"
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    assert get_label_id_mapping() == ref.get_label_id_mapping()
