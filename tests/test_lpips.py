"""First-party LPIPS (training/lpips.py): structural properties plus a
cross-framework pin — the JAX graph evaluated on a synthetic state dict
in the lpips package's exact layout must match an independent torch
re-implementation of the published formula on the same weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralrecon_w_tpu.training.lpips import (
    init_lpips, load_torch_state_dict, lpips,
)


def test_lpips_identity_and_positivity():
    params = init_lpips(jax.random.PRNGKey(0), net="vgg", width_mult=0.125)
    rs = np.random.RandomState(1)
    a = rs.rand(32, 32, 3).astype(np.float32)
    b = rs.rand(32, 32, 3).astype(np.float32)
    # one jitted closure: a single whole-graph compile serves all four
    # distance evaluations (eager conv-by-conv compilation is ~4x slower
    # on the CPU test backend) and proves jit-compatibility
    fn = jax.jit(lambda x, y: lpips(params, x, y))
    assert float(fn(a, a)) == pytest.approx(0.0, abs=1e-6)
    d_ab = float(fn(a, b))
    d_ba = float(fn(b, a))
    assert d_ab > 0
    assert d_ab == pytest.approx(d_ba, rel=1e-5)


def test_lpips_alex_variant_runs():
    params = init_lpips(jax.random.PRNGKey(2), net="alex", width_mult=0.125)
    rs = np.random.RandomState(3)
    a = rs.rand(32, 32, 3).astype(np.float32)
    b = np.clip(a + 0.1 * rs.randn(32, 32, 3).astype(np.float32), 0, 1)
    assert float(jax.jit(lambda x, y: lpips(params, x, y))(a, b)) > 0


def _synthetic_vgg_state_dict(rs, slices=((8, 8), (12, 12), (16, 16, 16),
                                          (16, 16, 16), (16, 16, 16))):
    """A state dict with the lpips package's key layout (net.sliceK.I.*,
    linK.model.1.weight) at reduced widths."""
    sd = {}
    c_in = 3
    # torchvision vgg16.features indices per slice (relu1_2/2_2/3_3/4_3/5_3)
    slice_conv_idx = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21),
                      (24, 26, 28)]
    base = [0, 4, 9, 16, 23]
    for si, plan in enumerate(slices):
        for ci, c_out in zip(slice_conv_idx[si], plan):
            local = ci - base[si]
            sd[f"net.slice{si + 1}.{local}.weight"] = rs.randn(
                c_out, c_in, 3, 3).astype(np.float32) * 0.2
            sd[f"net.slice{si + 1}.{local}.bias"] = rs.randn(
                c_out).astype(np.float32) * 0.05
            c_in = c_out
        sd[f"lin{si}.model.1.weight"] = np.abs(
            rs.randn(1, c_in, 1, 1).astype(np.float32))
    return sd


def _torch_lpips_reference(sd, pred, gt):
    """Independent torch re-implementation of LPIPS (Zhang et al. 2018):
    scaling layer, VGG-style slices with maxpool between, channel unit
    norm, squared diff, non-negative 1x1 head, spatial mean, layer sum."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(img_hw3):
        x = torch.from_numpy(img_hw3.transpose(2, 0, 1))[None] * 2 - 1
        h = (x - shift) / scale
        out = []
        for si in range(5):
            if si > 0:
                h = F.max_pool2d(h, 2, 2)
            prefix = f"net.slice{si + 1}."
            idxs = sorted({int(k[len(prefix):].split(".")[0])
                           for k in sd if k.startswith(prefix)})
            for i in idxs:
                w = torch.from_numpy(sd[f"{prefix}{i}.weight"])
                b = torch.from_numpy(sd[f"{prefix}{i}.bias"])
                h = F.relu(F.conv2d(h, w, b, padding=1))
            out.append(h)
        return out

    total = 0.0
    with torch.no_grad():
        for si, (hp, hg) in enumerate(zip(feats(pred), feats(gt))):
            norm = lambda t: t / torch.sqrt(
                (t * t).sum(dim=1, keepdim=True) + 1e-10)
            diff = (norm(hp) - norm(hg)) ** 2
            head = torch.from_numpy(sd[f"lin{si}.model.1.weight"])
            total = total + F.conv2d(diff, head).mean().item()
    return total


def test_lpips_matches_torch_reference():
    rs = np.random.RandomState(7)
    sd = _synthetic_vgg_state_dict(rs)
    params = load_torch_state_dict(sd, net="vgg")
    pred = rs.rand(32, 32, 3).astype(np.float32)
    gt = np.clip(pred + 0.15 * rs.randn(32, 32, 3).astype(np.float32), 0, 1)
    ours = float(jax.jit(lambda x, y: lpips(params, x, y))(pred, gt))
    ref = _torch_lpips_reference(sd, pred, gt)
    assert ours == pytest.approx(ref, rel=2e-4), (ours, ref)


def test_load_rejects_heads_only_checkpoint():
    rs = np.random.RandomState(9)
    sd = {f"lin{i}.model.1.weight": np.abs(rs.randn(1, 8, 1, 1))
          for i in range(5)}
    with pytest.raises(ValueError, match="not a full"):
        load_torch_state_dict(sd, net="vgg")
