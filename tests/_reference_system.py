"""Drive the reference's FULL training-step composition on CPU torch.

Builds the reference's real models (reference models/neuconw.py,
models/nerf.py), real renderer (reference rendering/renderer.py:52-135)
and real loss (reference losses.py:12-43), and composes them exactly as
``NeuconWSystem.training_step`` does (reference
lightning_modules/neuconw_system.py:337-402): ray-mask filter ->
render(cos_anneal_ratio=min(1, step/anneal_end)) -> sum(loss_dict) ->
backward -> clip_grad_norm_(0.99) (reference train.py:61, Lightning's
default norm clipping) -> Adam(lr, eps=1e-7) step (reference
utils/__init__.py:23-41).

Lightning / kaolin / open3d are never imported; the single CUDA
boundary — the kaolin octree first-hit query ``get_near_far``
(reference tools/prepare_data/generate_voxel.py:311) — is replaced by a
caller-provided analytic implementation, so the steady (fine-octree
surface-guided) phase runs on CPU with the reference's real
``get_near_far_sdf`` band math (reference rendering/renderer.py:415-456).

Used by:
  * tests/test_reference_twin_dynamics.py — composed training-dynamics
    parity (loss curves, N steps, identical init + batches),
  * scripts/exp_reference_budget_twin.py — BD10 vs BD4 quality in the
    reference's own dynamics,
  * scripts/exp_reference_cpu_step.py — measured reference step time on
    this host (BASELINE.md A100 derivation input).
"""

from __future__ import annotations

import sys
import types
from unittest import mock

import numpy as np


def load_reference(label_id_mapping=None, get_near_far_impl=None):
    """Import the reference's renderer/models/losses with the CUDA and
    I/O deps stubbed at module boundaries. Returns the module dict."""
    for name in ["open3d", "kaolin", "kaolin.ops", "kaolin.ops.spc",
                 "kaolin.render", "kaolin.render.spc", "trimesh", "cv2",
                 "torchvision"]:
        sys.modules.setdefault(name, mock.MagicMock())
    dsets = types.ModuleType("datasets")
    dsets.__path__ = []
    mu = types.ModuleType("datasets.mask_utils")
    mapping = label_id_mapping or {}
    mu.get_label_id_mapping = lambda: mapping
    sys.modules["datasets"] = dsets
    sys.modules["datasets.mask_utils"] = mu
    tools = types.ModuleType("tools")
    tools.__path__ = []
    tpd = types.ModuleType("tools.prepare_data")
    tpd.__path__ = []
    gv = types.ModuleType("tools.prepare_data.generate_voxel")
    gv.get_near_far = get_near_far_impl or mock.MagicMock()
    gv.gen_octree_from_sfm = mock.MagicMock()
    gv.octree_to_spc = mock.MagicMock()
    sys.modules["tools"] = tools
    sys.modules["tools.prepare_data"] = tpd
    sys.modules["tools.prepare_data.generate_voxel"] = gv
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from rendering import renderer as ref_renderer  # noqa: E402
    import losses as ref_losses  # noqa: E402
    from models import neuconw as ref_neuconw  # noqa: E402
    from models import nerf as ref_nerf  # noqa: E402

    if get_near_far_impl is not None:
        ref_renderer.get_near_far = get_near_far_impl
    if label_id_mapping is not None:
        ref_renderer.get_label_id_mapping = lambda: mapping
    return {"renderer": ref_renderer, "losses": ref_losses,
            "neuconw": ref_neuconw, "nerf": ref_nerf}


def sphere_get_near_far(center, radius_s):
    """Analytic stand-in for the kaolin first-hit octree query: exact
    ray/sphere first intersection in SFM coordinates; <= 0 marks a miss
    (matching the reference's miss convention,
    reference rendering/renderer.py:443)."""
    import torch

    c = torch.as_tensor(center, dtype=torch.float32)

    def impl(rays_o, rays_d, octree, origin, scale, level,
             spc_data=None, visualize=False, ind=0):
        oc = rays_o - c
        b = (oc * rays_d).sum(-1)
        disc = b * b - (oc * oc).sum(-1) + radius_s ** 2
        hit = disc > 0
        sq = torch.sqrt(torch.clamp(disc, min=0.0))
        t0 = -b - sq
        t1 = -b + sq
        t = torch.where(t0 > 0, t0, t1)  # first positive root
        surf = torch.where(hit & (t > 0), t, torch.full_like(t, -1.0))
        return surf, None

    return impl


class ReferenceSystem:
    """The reference training system minus Lightning: same modules, same
    step composition, CPU torch."""

    def __init__(self, ref, *, scene_config, neuconw_cfg, lr,
                 weight_decay=0.0, device="cpu", seed=66, nerf_config=None):
        import torch

        torch.manual_seed(seed)
        n = neuconw_cfg
        self.n = n
        self.device = device
        self.embedding_a = torch.nn.Embedding(n["N_VOCAB"], n["N_A"])
        self.neuconw = ref["neuconw"].NeuconW(
            sdfNet_config=n["SDF_CONFIG"],
            colorNet_config=n["COLOR_CONFIG"],
            SNet_config=n["S_CONFIG"],
            in_channels_a=n["N_A"],
            encode_a=n["ENCODE_A"],
        )
        # production bg NeRF dims (reference lightning_modules/
        # neuconw_system.py:84-96); nerf_config shrinks them for
        # CPU-feasible convergence runs (exp_reference_budget_twin)
        nerf_kw = dict(D=8, W=256, skips=[4])
        nerf_kw.update(nerf_config or {})
        self.nerf = ref["nerf"].NeRF(
            d_in=4, d_in_view=3, multires=10, multires_view=4,
            output_ch=4,
            encode_appearance=n["ENCODE_A_BG"], in_channels_a=n["N_A"],
            in_channels_dir=6 * n["COLOR_CONFIG"]["multires_view"] + 3,
            use_viewdirs=True, **nerf_kw,
        )
        # renderer ctor reads config.yaml only when recontruct_path has
        # one (reference rendering/renderer.py:104-112); pass origin and
        # radius directly instead
        self.renderer = ref["renderer"].NeuconWRenderer(
            nerf=self.nerf, neuconw=self.neuconw,
            embeddings={"a": self.embedding_a},
            n_samples=n["N_SAMPLES"], s_val_base=n["S_VAL_BASE"],
            n_importance=n["N_IMPORTANCE"], n_outside=n["N_OUTSIDE"],
            up_sample_steps=n["UP_SAMPLE_STEP"], perturb=1.0,
            origin=scene_config["origin"], radius=scene_config["radius"],
            render_bg=n["RENDER_BG"], mesh_mask_list=n["MESH_MASK_LIST"],
            floor_normal=n["FLOOR_NORMAL"], floor_labels=n["FLOOR_LABELS"],
            depth_loss=n["DEPTH_LOSS"],
            spc_options={"recontruct_path": "/nonexistent-no-config",
                         "min_track_length": 2,
                         "voxel_size": scene_config.get("voxel_size", 0.08)},
            sample_range=n["SAMPLE_RANGE"],
            boundary_samples=n["BOUNDARY_SAMPLES"],
            nerf_far_override=False,
        )
        # without a workspace config.yaml the ctor leaves sfm_to_gt as a
        # numpy array, which render() can't .to(device); install the
        # tensor it expects (reference rendering/renderer.py:100,799)
        import numpy as _np

        self.renderer.sfm_to_gt = torch.from_numpy(
            _np.asarray(scene_config.get("sfm2gt", _np.eye(4)), _np.float32))
        loss_kw = dict(n["LOSS"])
        cfg_stub = types.SimpleNamespace(NEUCONW=types.SimpleNamespace(
            MESH_MASK_LIST=n["MESH_MASK_LIST"], DEPTH_LOSS=n["DEPTH_LOSS"],
            FLOOR_NORMAL=n["FLOOR_NORMAL"]))
        self.loss = ref["losses"].NeuconWLoss(config=cfg_stub, **loss_kw)
        params = (list(self.embedding_a.parameters())
                  + list(self.neuconw.parameters())
                  + list(self.nerf.parameters()))
        self.optimizer = torch.optim.Adam(params, lr=lr, eps=1e-7,
                                          weight_decay=weight_decay)
        self._params = params
        self.anneal_end = n["ANNEAL_END"]
        self.ray_mask_list = n["RAY_MASK_LIST"]
        self.label_id_mapping = ref["renderer"].get_label_id_mapping()
        self.global_step = 0

    def attach_fine_octree(self, voxel_size, level=8):
        """Flip the renderer into the steady phase. The octree payload
        is only forwarded to the (substituted) get_near_far."""
        import torch

        self.renderer.fine_octree_data = {
            "octree": None, "scene_origin": torch.zeros(3), "scale": 1.0,
            "level": level, "voxel_size": voxel_size, "spc_data": None,
        }

    def train_step(self, batch):
        """One optimizer step; returns (total_loss, loss_dict, psnr)."""
        import torch

        rays, rgbs, ts, label = (batch["rays"], batch["rgbs"], batch["ts"],
                                 batch["semantics"])
        self.renderer.nerf_far_override = False
        ray_mask = torch.ones_like(ts, dtype=torch.bool)
        if self.ray_mask_list is not None:
            for name in self.ray_mask_list:
                ray_mask[self.label_id_mapping[name] == label] = False
        rays, ts = rays[ray_mask, :], ts[ray_mask]
        rgbs, label = rgbs[ray_mask], label[ray_mask]

        cos_anneal = (1.0 if self.anneal_end == 0
                      else min(1.0, self.global_step / self.anneal_end))
        results = self.renderer.render(
            rays, ts, label,
            background_rgb=torch.zeros([1, 3], device=rays.device),
            cos_anneal_ratio=cos_anneal,
        )
        loss_d = self.loss(results, rgbs)
        loss = sum(loss_d.values())
        self.optimizer.zero_grad(set_to_none=True)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(self._params, 0.99)
        self.optimizer.step()
        self.global_step += 1
        with torch.no_grad():
            mse = torch.mean((results["color"] - rgbs) ** 2)
            psnr = -10.0 * torch.log10(torch.clamp(mse, min=1e-12))
        return (float(loss.detach()),
                {k: float(v.detach()) for k, v in loss_d.items()},
                float(psnr))


def brandenburg_neuconw_cfg(**overrides):
    """The reference's brandenburg_gate NEUCONW config as plain dicts
    (reference config/train_brandenburg_gate.yaml + config/defaults.py),
    overridable for tiny-net twin runs."""
    cfg = {
        "N_SAMPLES": 8, "N_IMPORTANCE": 16, "UP_SAMPLE_STEP": 2,
        "N_OUTSIDE": 4, "S_VAL_BASE": 3, "BOUNDARY_SAMPLES": 10,
        "SAMPLE_RANGE": 16, "N_VOCAB": 5000, "N_A": 48, "ENCODE_A": True,
        "ENCODE_A_BG": True, "ANNEAL_END": 50000, "RENDER_BG": True,
        "MESH_MASK_LIST": ["sky"],
        "RAY_MASK_LIST": ["person", "car", "bicycle", "minibike"],
        "FLOOR_NORMAL": False, "FLOOR_LABELS": ["road"],
        "DEPTH_LOSS": True,
        "SDF_CONFIG": dict(d_in=3, d_out=513, d_hidden=512, n_layers=8,
                           skip_in=(4,), multires=6, bias=0.5, scale=1.0,
                           geometric_init=True, weight_norm=True,
                           inside_outside=False),
        "COLOR_CONFIG": dict(d_in=9, d_feature=512, mode="idr", d_out=3,
                             d_hidden=256, n_layers=4, head_channels=128,
                             static_head_layers=2, weight_norm=True,
                             multires_view=4),
        "S_CONFIG": dict(init_val=0.3),
        "LOSS": dict(coef=1.0, igr_weight=1e-4, mask_weight=0.1,
                     depth_weight=0.1, floor_weight=0.01),
    }
    cfg.update(overrides)
    return cfg
