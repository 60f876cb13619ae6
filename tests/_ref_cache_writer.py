"""Run the REFERENCE's own torch cache writer on a synthetic workspace.

Executes /root/reference/tools/prepare_data/prepare_data_cache.py
(reference prepare_data_cache.py:78-210) — i.e. the reference's real
PhototourismDataset(use_cache=False) ray generation + h5 split writer —
on CPU, with only its CUDA-bound externals stubbed:
  * kaolin/open3d: mocked (octree build + ply dumps),
  * the voxel near/far intersection: analytic ray/scene-sphere hit
    (same drop-missed-rays semantics; the DDA itself is parity-tested
    separately against a brute-force oracle),
  * kornia.create_meshgrid / torchvision ToTensor: faithful minimal
    re-implementations of the two public APIs the reference consumes,
  * .cuda(): identity (the reference hardcodes device 0).

Usage: python _ref_cache_writer.py <scene_root> <cache_dir> <n_chunks>
The scene root's basename must be brandenburg_gate: the reference
hardcodes per-scene sfm_path/depth_percent as function-local names and
raises UnboundLocalError for any other scene name
(reference datasets/phototourism.py:82-93).
"""

import os
import sys
import types
from unittest import mock

import numpy as np
import torch

root, cache_dir, n_chunks = sys.argv[1], sys.argv[2], sys.argv[3]
torch.manual_seed(0)

for name in ["open3d", "kaolin", "kaolin.ops", "kaolin.ops.spc",
             "kaolin.render", "kaolin.render.spc", "pytorch_lightning",
             "loguru", "yacs", "yacs.config", "torch_optimizer", "trimesh",
             "skimage", "skimage.measure", "ray", "pyrender", "matplotlib",
             "matplotlib.pyplot", "matplotlib.colors", "matplotlib.cm"]:
    sys.modules.setdefault(name, mock.MagicMock())

kornia = types.ModuleType("kornia")


def create_meshgrid(H, W, normalized_coordinates=True, device=None, dtype=None):
    xs = torch.arange(W, dtype=torch.float32)
    ys = torch.arange(H, dtype=torch.float32)
    if normalized_coordinates:
        xs = 2.0 * xs / (W - 1) - 1.0
        ys = 2.0 * ys / (H - 1) - 1.0
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    return torch.stack([gx, gy], dim=-1)[None]


kornia.create_meshgrid = create_meshgrid
sys.modules["kornia"] = kornia

tv = types.ModuleType("torchvision")
tvt = types.ModuleType("torchvision.transforms")


class ToTensor:
    def __call__(self, pic):
        arr = np.asarray(pic, np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[..., None]
        return torch.from_numpy(arr.transpose(2, 0, 1)).contiguous()


tvt.ToTensor = ToTensor
tv.transforms = tvt
sys.modules["torchvision"] = tv
sys.modules["torchvision.transforms"] = tvt

torch.Tensor.cuda = lambda self, *a, **k: self

sys.path.insert(0, "/root/reference")
os.chdir("/root/reference")

import yaml  # noqa: E402

scfg = yaml.safe_load(open(os.path.join(root, "config.yaml")))
ORIGIN = np.asarray(scfg["origin"], np.float64)
RADIUS = float(scfg["radius"])

from datasets.phototourism import PhototourismDataset  # noqa: E402


def get_octree_stub(self, device=0, expand=1, radius=1):
    return {"expand": expand, "radius": radius}


def near_far_voxel_stub(self, octree, rays_o, rays_d, image_name):
    """Analytic ray/scene-sphere intersection with the reference's
    near_far_voxel contract: (voxel_near, voxel_far, valid_mask), missed
    rays invalid (they get dropped by the caller,
    reference datasets/phototourism.py:638-657)."""
    r = RADIUS * (1.0 if octree["expand"] == 1 else 1.5)
    oc = torch.from_numpy(ORIGIN).float()[None]
    oo = rays_o - oc
    b = torch.sum(oo * rays_d, -1)
    c = torch.sum(oo * oo, -1) - r * r
    disc = b * b - c
    sq = torch.sqrt(torch.clamp(disc, min=0.0))
    near = torch.clamp(-b - sq, min=1e-3)
    far = torch.clamp(-b + sq, min=2e-3)
    valid = (disc > 0) & (far > near)
    return near, far, valid


PhototourismDataset.get_octree = get_octree_stub
PhototourismDataset.near_far_voxel = near_far_voxel_stub

# the reference hardcodes device=0 (cuda) in its SFM-depth raster
# (reference datasets/phototourism.py:150-182); run it on cpu
_orig_gcd = PhototourismDataset.get_colmap_depth
PhototourismDataset.get_colmap_depth = (
    lambda self, *a, device=0, **k: _orig_gcd(self, *a, device="cpu", **k)
)

sys.argv = [
    "prepare_data_cache.py", "--root_dir", root, "--cache_dir", cache_dir,
    "--split_to_chunks", n_chunks, "--semantic_map_path", "semantic_maps",
]
import runpy  # noqa: E402

runpy.run_path(
    "/root/reference/tools/prepare_data/prepare_data_cache.py",
    run_name="__main__",
)
print("REF_CACHE_WRITER_OK")
