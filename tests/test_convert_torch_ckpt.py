"""Reference-checkpoint migration: build the reference's own torch
modules, save a Lightning-style .ckpt, convert it with
tools/convert_torch_ckpt, and require our forward passes on the
converted params to match the torch modules (the reference users'
"bring your trained model" path; reference tools/extract_mesh.py:132-134)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

import jax.numpy as jnp

from neuralrecon_w_tpu.models.color import apply_color
from neuralrecon_w_tpu.models.nerf_bg import apply_nerf_bg
from neuralrecon_w_tpu.models.sdf import apply_sdf

SDF_CFG = dict(
    d_in=3, d_out=65, d_hidden=64, n_layers=4, skip_in=(2,), multires=6,
    bias=0.5, scale=1.0, geometric_init=True, weight_norm=True,
    inside_outside=False,
)
COLOR_CFG = dict(d_in=9, d_feature=64, mode="idr", d_out=3, d_hidden=48,
                 n_layers=3, head_channels=32, static_head_layers=2,
                 weight_norm=True, multires_view=4)
N_A = 16


def _build_reference_ckpt(path):
    from models.neuconw import (
        NeuconW, RenderingNetwork, SDFNetwork, SingleVarianceNetwork,
    )
    from models.nerf import NeRF

    torch.manual_seed(11)
    neuconw = NeuconW(
        sdfNet_config=SDF_CFG,
        colorNet_config=dict(
            d_feature=COLOR_CFG["d_feature"], mode="idr", d_in=9, d_out=3,
            d_hidden=48, n_layers=3, head_channels=32,
            static_head_layers=2, weight_norm=True, multires_view=4,
            squeeze_out=True,
        ),
        SNet_config=dict(init_val=0.3),
        in_channels_a=N_A, encode_a=True,
    )
    nerf = NeRF(D=8, W=64, d_in=4, d_in_view=3, multires=10,
                multires_view=4, skips=[4], in_channels_a=N_A,
                in_channels_dir=27, encode_appearance=True,
                use_viewdirs=True)
    emb = torch.nn.Embedding(8, N_A)

    sd = {}
    for k, v in neuconw.state_dict().items():
        sd[f"neuconw.{k}"] = v
    for k, v in nerf.state_dict().items():
        sd[f"nerf.{k}"] = v
    sd["embedding_a.weight"] = emb.weight.detach()
    torch.save({"state_dict": sd, "global_step": 1234}, path)
    return neuconw, nerf, emb


def test_convert_roundtrip_matches_torch_forward(tmp_path):
    from neuralrecon_w_tpu.tools.convert_torch_ckpt import main as convert_main
    from neuralrecon_w_tpu.training.checkpoint import load_params_subtree

    ckpt_path = str(tmp_path / "ref.ckpt")
    neuconw, nerf, emb = _build_reference_ckpt(ckpt_path)
    neuconw.eval()
    nerf.eval()

    out_dir = str(tmp_path / "converted")
    saved = convert_main(["--ckpt_path", ckpt_path, "--out", out_dir])
    assert saved.endswith("step_1234")
    params = load_params_subtree(saved)

    assert np.allclose(np.asarray(params["embedding_a"]),
                       emb.weight.detach().numpy())

    rs = np.random.RandomState(4)
    pts = rs.randn(32, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_sdf_out = neuconw.sdf_net(torch.from_numpy(pts)).numpy()
    ours = np.asarray(
        apply_sdf(params["neuconw"]["sdf"], SDF_CFG, jnp.asarray(pts))
    )
    np.testing.assert_allclose(ours, ref_sdf_out, atol=2e-5)

    # variance scalar: inv_s = exp(10 * variance)
    assert np.allclose(float(params["neuconw"]["variance"]), 0.3)

    normals = rs.randn(32, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    views = rs.randn(32, 3).astype(np.float32)
    views /= np.linalg.norm(views, axis=-1, keepdims=True)
    feat = rs.randn(32, COLOR_CFG["d_feature"]).astype(np.float32)
    a = rs.randn(32, N_A).astype(np.float32)
    with torch.no_grad():
        ref_rgb, _, _ = neuconw.color_net(
            torch.from_numpy(pts), torch.from_numpy(normals),
            torch.from_numpy(views), torch.from_numpy(feat),
            torch.from_numpy(a),
        )
    ours_rgb = apply_color(params["neuconw"]["color"], COLOR_CFG, True,
                           jnp.asarray(pts), jnp.asarray(normals),
                           jnp.asarray(views), jnp.asarray(feat),
                           jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(ours_rgb), ref_rgb.numpy(),
                               atol=2e-5)

    pts4 = rs.rand(32, 4).astype(np.float32)
    with torch.no_grad():
        ref_alpha, ref_bg_rgb = nerf(torch.from_numpy(pts4),
                                     torch.from_numpy(views),
                                     torch.from_numpy(a))
    alpha, bg_rgb = apply_nerf_bg(params["nerf_bg"], True,
                                  jnp.asarray(pts4), jnp.asarray(views),
                                  jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(alpha), ref_alpha.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(bg_rgb), ref_bg_rgb.numpy(),
                               atol=2e-5)


def test_convert_no_appearance_bg_branch(tmp_path):
    """Indoor-config checkpoints (ENCODE_A_BG=False) use the plain
    view branch (reference config/train_indoor.yaml:30-44)."""
    from models.nerf import NeRF

    from neuralrecon_w_tpu.tools.convert_torch_ckpt import convert_state_dict

    torch.manual_seed(12)
    nerf = NeRF(D=8, W=64, d_in=4, d_in_view=3, multires=10,
                multires_view=4, skips=[4], in_channels_a=N_A,
                in_channels_dir=27, encode_appearance=False,
                use_viewdirs=True)
    nerf.eval()
    from models.neuconw import NeuconW

    torch.manual_seed(13)
    neuconw = NeuconW(
        sdfNet_config=SDF_CFG,
        colorNet_config=dict(
            d_feature=64, mode="idr", d_in=9, d_out=3, d_hidden=48,
            n_layers=3, head_channels=32, static_head_layers=2,
            weight_norm=True, multires_view=4, squeeze_out=True,
        ),
        SNet_config=dict(init_val=0.3), in_channels_a=N_A, encode_a=True,
    )
    sd = {f"neuconw.{k}": v for k, v in neuconw.state_dict().items()}
    sd.update({f"nerf.{k}": v for k, v in nerf.state_dict().items()})
    sd["embedding_a.weight"] = torch.randn(8, N_A)

    params = convert_state_dict(sd)
    assert "views0" in params["nerf_bg"] and "app0" not in params["nerf_bg"]

    rs = np.random.RandomState(5)
    pts4 = rs.rand(16, 4).astype(np.float32)
    views = rs.randn(16, 3).astype(np.float32)
    views /= np.linalg.norm(views, axis=-1, keepdims=True)
    with torch.no_grad():
        ref_alpha, ref_rgb = nerf(torch.from_numpy(pts4),
                                  torch.from_numpy(views), None)
    alpha, rgb = apply_nerf_bg(
        {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
         if isinstance(v, dict) else jnp.asarray(v)
         for k, v in params["nerf_bg"].items()},
        False, jnp.asarray(pts4), jnp.asarray(views), None,
    )
    np.testing.assert_allclose(np.asarray(alpha), ref_alpha.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(rgb), ref_rgb.numpy(), atol=2e-5)


def test_export_strict_loads_into_reference_modules(tmp_path):
    """Reverse conversion: our orbax params export to a Lightning-style
    .ckpt that the reference's torch modules STRICT-load (the dead
    wrapper/views layers are zero-filled to satisfy strict mode), and
    the loaded modules reproduce the original forwards."""
    from models.nerf import NeRF
    from models.neuconw import NeuconW

    from neuralrecon_w_tpu.tools.convert_torch_ckpt import main as convert_main

    ckpt_path = str(tmp_path / "ref.ckpt")
    neuconw, nerf, emb = _build_reference_ckpt(ckpt_path)
    neuconw.eval()
    nerf.eval()
    out_dir = str(tmp_path / "converted")
    saved = convert_main(["--ckpt_path", ckpt_path, "--out", out_dir])

    exported = str(tmp_path / "exported.ckpt")
    convert_main(["--reverse", "--orbax_path", saved,
                  "--ckpt_path", exported])
    ck = torch.load(exported, map_location="cpu", weights_only=False)
    assert ck["global_step"] == 1234
    sd = ck["state_dict"]

    # fresh modules, different seed -> strict load must fully overwrite
    torch.manual_seed(99)
    neuconw2 = NeuconW(
        sdfNet_config=SDF_CFG,
        colorNet_config=dict(
            d_feature=COLOR_CFG["d_feature"], mode="idr", d_in=9, d_out=3,
            d_hidden=48, n_layers=3, head_channels=32,
            static_head_layers=2, weight_norm=True, multires_view=4,
            squeeze_out=True,
        ),
        SNet_config=dict(init_val=0.0),
        in_channels_a=N_A, encode_a=True,
    )
    nerf2 = NeRF(D=8, W=64, d_in=4, d_in_view=3, multires=10,
                 multires_view=4, skips=[4], in_channels_a=N_A,
                 in_channels_dir=27, encode_appearance=True,
                 use_viewdirs=True)
    neuconw2.load_state_dict(
        {k[len("neuconw."):]: v for k, v in sd.items()
         if k.startswith("neuconw.")}, strict=True)
    nerf2.load_state_dict(
        {k[len("nerf."):]: v for k, v in sd.items()
         if k.startswith("nerf.")}, strict=True)
    neuconw2.eval()
    nerf2.eval()

    assert np.allclose(sd["embedding_a.weight"].numpy(),
                       emb.weight.detach().numpy())

    rs = np.random.RandomState(6)
    pts = rs.randn(24, 3).astype(np.float32) * 0.5
    views = rs.randn(24, 3).astype(np.float32)
    views /= np.linalg.norm(views, axis=-1, keepdims=True)
    a = rs.randn(24, N_A).astype(np.float32)
    pts4 = rs.rand(24, 4).astype(np.float32)
    with torch.no_grad():
        np.testing.assert_allclose(
            neuconw2.sdf_net(torch.from_numpy(pts)).numpy(),
            neuconw.sdf_net(torch.from_numpy(pts)).numpy(), atol=1e-6)
        a1, r1 = nerf(torch.from_numpy(pts4), torch.from_numpy(views),
                      torch.from_numpy(a))
        a2, r2 = nerf2(torch.from_numpy(pts4), torch.from_numpy(views),
                       torch.from_numpy(a))
        np.testing.assert_allclose(a2.numpy(), a1.numpy(), atol=1e-6)
        np.testing.assert_allclose(r2.numpy(), r1.numpy(), atol=1e-6)
        # deviation scalar survives the round trip
        assert float(neuconw2.deviation_network.variance) == pytest.approx(
            0.3)
