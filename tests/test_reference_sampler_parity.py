"""NeuS sampler math parity vs the reference renderer (sample_pdf det
path + fixed-inv_s up_sample), with the reference's CUDA/IO imports
stubbed so the pure-torch functions load on CPU."""

import sys
import types
from unittest import mock

import numpy as np
import pytest

torch = pytest.importorskip("torch")


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


def test_sample_pdf_parity(ref_renderer):
    import jax.numpy as jnp

    from neuralrecon_w_tpu.rendering.sampling import sample_pdf

    rs = np.random.RandomState(0)
    bins = np.sort(rs.rand(8, 17).astype(np.float32), axis=-1)
    weights = rs.rand(8, 16).astype(np.float32)
    ref = ref_renderer.sample_pdf(
        torch.from_numpy(bins), torch.from_numpy(weights), 9, det=True
    ).numpy()
    ours = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 9))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_up_sample_parity(ref_renderer):
    import jax.numpy as jnp

    from neuralrecon_w_tpu.rendering.sampling import up_sample

    class StubSelf:
        n_outside = 0
        save_step_sample = False
        save_sample = False

    rs = np.random.RandomState(1)
    rays_o = rs.randn(4, 3).astype(np.float32) * 0.1
    rays_d = rs.randn(4, 3).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    z_vals = np.sort(rs.rand(4, 8).astype(np.float32) * 2, axis=-1)
    sdf = rs.randn(4, 8).astype(np.float32) * 0.3

    for inv_s in [64.0, 256.0, 1024.0]:
        ref_z = ref_renderer.NeuconWRenderer.up_sample(
            StubSelf(), torch.from_numpy(rays_o), torch.from_numpy(rays_d),
            torch.from_numpy(z_vals), torch.from_numpy(sdf), 4, inv_s, 0,
        ).numpy()
        our_z = np.asarray(up_sample(
            jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(z_vals),
            jnp.asarray(sdf), 4, inv_s,
        ))
        np.testing.assert_allclose(our_z, ref_z, atol=1e-4)
