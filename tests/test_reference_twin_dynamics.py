"""Composed training-dynamics parity vs the reference's training_step.

Round/module-level numerics are pinned elsewhere (models, sampler, full
render() output dict); this test closes the last composition-level gap:
the reference's ENTIRE training step — loss weighting (reference
losses.py:21-43) -> backward -> clip_grad_norm_(0.99) -> Adam(lr,
eps=1e-7) with cos-anneal(step) (reference
lightning_modules/neuconw_system.py:337-402, train.py:61) — run for N
steps on CPU torch with the reference's REAL modules, against our
make_train_step, from IDENTICAL initial weights (export_state_dict) and
byte-identical ray batches, asserting the loss sequences track.

Sampling randomness is removed on both sides (perturb=0); every other
source of divergence is the f32 arithmetic itself, so the sequences
start ~1e-6 apart and drift slowly. Gates are calibrated with ~10x
margin over an observed clean run.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp

from _reference_system import (  # noqa: E402
    ReferenceSystem, brandenburg_neuconw_cfg, load_reference,
    sphere_get_near_far,
)

N_STEPS = 25
BATCH = 32
LR = 5e-4
ANNEAL_END = 10  # cos_anneal varies over the first steps, then saturates
SKY = 2


def _tiny_cfg():
    from neuralrecon_w_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    n = cfg.NEUCONW
    n.N_SAMPLES, n.N_IMPORTANCE, n.UP_SAMPLE_STEP = 8, 8, 2
    n.N_OUTSIDE, n.S_VAL_BASE = 4, 1
    n.BOUNDARY_SAMPLES, n.SAMPLE_RANGE = 4, 4
    n.N_VOCAB, n.N_A = 16, 8
    n.ENCODE_A = n.ENCODE_A_BG = True
    n.ANNEAL_END = ANNEAL_END
    n.RENDER_BG = True
    n.MESH_MASK_LIST = ["sky"]
    n.RAY_MASK_LIST = None
    n.FLOOR_NORMAL = False
    n.DEPTH_LOSS = True
    n.PERTURB = 0.0
    n.SDF_CONFIG.d_hidden, n.SDF_CONFIG.d_out = 64, 65
    n.SDF_CONFIG.n_layers, n.SDF_CONFIG.skip_in = 2, (1,)
    n.COLOR_CONFIG.d_feature, n.COLOR_CONFIG.d_hidden = 64, 32
    n.COLOR_CONFIG.n_layers = 2
    n.COLOR_CONFIG.head_channels, n.COLOR_CONFIG.static_head_layers = 16, 2
    n.S_CONFIG.init_val = 0.3
    n.LOSS.igr_weight, n.LOSS.mask_weight = 1e-3, 0.1
    n.LOSS.depth_weight, n.LOSS.floor_weight = 0.1, 0.01
    t = cfg.TRAINER
    t.LR, t.LR_SCHEDULER, t.GRAD_CLIP, t.OPTIMIZER = LR, "none", 0.99, "adam"
    return cfg


def _ref_neuconw_cfg():
    """The same tiny architecture as plain dicts for ReferenceSystem."""
    return brandenburg_neuconw_cfg(
        N_SAMPLES=8, N_IMPORTANCE=8, UP_SAMPLE_STEP=2, N_OUTSIDE=4,
        S_VAL_BASE=1, BOUNDARY_SAMPLES=4, SAMPLE_RANGE=4,
        N_VOCAB=16, N_A=8, ANNEAL_END=ANNEAL_END,
        MESH_MASK_LIST=["sky"], RAY_MASK_LIST=None, FLOOR_NORMAL=False,
        DEPTH_LOSS=True,
        SDF_CONFIG=dict(d_in=3, d_out=65, d_hidden=64, n_layers=2,
                        skip_in=(1,), multires=6, bias=0.5, scale=1.0,
                        geometric_init=True, weight_norm=True,
                        inside_outside=False),
        COLOR_CONFIG=dict(d_in=9, d_feature=64, mode="idr", d_out=3,
                          d_hidden=32, n_layers=2, head_channels=16,
                          static_head_layers=2, weight_norm=True,
                          multires_view=4),
        S_CONFIG=dict(init_val=0.3),
        LOSS=dict(coef=1.0, igr_weight=1e-3, mask_weight=0.1,
                  depth_weight=0.1, floor_weight=0.01),
    )


def _make_batches(n_steps, batch, n_vocab, seed=0):
    """Deterministic per-step ray batches aimed at the unit sphere."""
    rs = np.random.RandomState(seed)
    out = []
    for _ in range(n_steps):
        o = (rs.randn(batch, 3) * 0.15 + [0, 0, 2.2]).astype(np.float32)
        d = -o + rs.randn(batch, 3).astype(np.float32) * 0.08
        d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
        near = np.full((batch, 1), 0.5, np.float32)
        far = np.full((batch, 1), 4.0, np.float32)
        # SFM depth ~ distance to the unit sphere along the ray
        depth = (np.linalg.norm(o, axis=-1, keepdims=True) - 1.0).astype(
            np.float32)
        w = (rs.rand(batch, 1) > 0.4).astype(np.float32)  # valid-depth flags
        rays = np.concatenate([o, d, near, far, depth, w], axis=1)
        labels = np.zeros(batch, np.int64)
        labels[:batch // 8] = SKY  # exercise the mask_error term
        out.append({
            "rays": rays,
            "rgbs": rs.rand(batch, 3).astype(np.float32),
            "ts": rs.randint(0, n_vocab, batch).astype(np.int64),
            "labels": labels,
        })
    return out


def _load_our_params_into(system, params):
    from neuralrecon_w_tpu.tools.convert_torch_ckpt import export_state_dict

    sd = {k: torch.from_numpy(np.asarray(v, np.float32))
          for k, v in export_state_dict(jax.device_get(params)).items()}
    system.embedding_a.load_state_dict(
        {"weight": sd["embedding_a.weight"]}, strict=True)
    system.neuconw.load_state_dict(
        {k[len("neuconw."):]: v for k, v in sd.items()
         if k.startswith("neuconw.")}, strict=True)
    system.nerf.load_state_dict(
        {k[len("nerf."):]: v for k, v in sd.items()
         if k.startswith("nerf.")}, strict=True)


def _sphere_surf_np(o, d, radius=1.0):
    """The same analytic first-hit sphere_get_near_far computes (torch),
    in numpy — the reference's miss convention (<= 0)."""
    b = np.sum(o * d, axis=-1)
    disc = b * b - np.sum(o * o, axis=-1) + radius ** 2
    hit = disc > 0
    sq = np.sqrt(np.clip(disc, 0.0, None))
    t0, t1 = -b - sq, -b + sq
    t = np.where(t0 > 0, t0, t1)
    return np.where(hit & (t > 0), t, -1.0).astype(np.float32)


@pytest.mark.slow
@pytest.mark.parametrize("phase", ["warmup", "steady"])
def test_twin_training_dynamics(phase):
    from neuralrecon_w_tpu.models import field_config_from_cfg
    from neuralrecon_w_tpu.rendering import render_config_from_cfg
    from neuralrecon_w_tpu.rendering.renderer import SceneInfo
    from neuralrecon_w_tpu.training import (
        init_state, loss_config_from_cfg, make_optimizer, make_train_step,
    )

    steady = phase == "steady"
    vs = 0.04  # fine voxel size (SFM units)

    cfg = _tiny_cfg()
    fc = field_config_from_cfg(cfg)
    rcfg = render_config_from_cfg(cfg, fine_level=8 if steady else -1)
    lcfg = loss_config_from_cfg(cfg)
    opt, _ = make_optimizer(cfg, BATCH)

    state = init_state(jax.random.PRNGKey(3), fc, opt)
    scene = SceneInfo(origin=jnp.zeros(3), radius=jnp.asarray(2.5),
                      sfm2gt=jnp.eye(4))
    batches = _make_batches(N_STEPS, BATCH, fc.n_vocab)

    # ---- reference twin: real modules, our exported init ----
    ref = load_reference(
        label_id_mapping={"sky": SKY},
        get_near_far_impl=sphere_get_near_far([0.0, 0.0, 0.0], 1.0))
    system = ReferenceSystem(
        ref, scene_config={"origin": [0.0, 0.0, 0.0], "radius": 2.5,
                           "voxel_size": vs},
        neuconw_cfg=_ref_neuconw_cfg(), lr=LR)
    system.renderer.perturb = 0.0  # deterministic z placement both sides
    _load_our_params_into(system, state.params)
    if steady:
        system.attach_fine_octree(vs, level=8)

    fine_grid = types.SimpleNamespace(voxel_size=vs) if steady else None
    step = make_train_step(fc, rcfg, lcfg, opt, anneal_end=ANNEAL_END)
    jstep = jax.jit(lambda st, b, r: step(st, scene, b, r, fine_grid, None))

    ref_losses, our_losses = [], []
    rng = jax.random.PRNGKey(0)  # unused at perturb=0 but part of the API
    for b in batches:
        tb = {
            "rays": torch.from_numpy(b["rays"]),
            "rgbs": torch.from_numpy(b["rgbs"]),
            "ts": torch.from_numpy(b["ts"]),
            "semantics": torch.from_numpy(b["labels"]),
        }
        loss_t, _, _ = system.train_step(tb)
        ref_losses.append(loss_t)

        jb = {
            "rays": jnp.asarray(b["rays"]),
            "rgbs": jnp.asarray(b["rgbs"]),
            "ts": jnp.asarray(b["ts"].astype(np.int32)),
            "labels": jnp.asarray(b["labels"].astype(np.int32)),
        }
        if steady:
            surf = _sphere_surf_np(b["rays"][:, 0:3], b["rays"][:, 3:6])
            jb["surf_t"] = jnp.asarray(surf)
            jb["surf_hit"] = jnp.asarray(surf > 0)
        state, aux = jstep(state, jb, rng)
        our_losses.append(float(aux["loss"]))

    ref_losses = np.asarray(ref_losses)
    our_losses = np.asarray(our_losses)
    rel = np.abs(ref_losses - our_losses) / np.maximum(np.abs(ref_losses),
                                                       1e-6)
    # step 0 is pure forward+loss parity from identical weights
    assert rel[0] < 1e-4, (rel[0], ref_losses[0], our_losses[0])
    # early steps: the optimizer composition (clip norm, Adam eps/bias
    # correction, cos-anneal) has fed back only a few times
    assert rel[:5].max() < 5e-3, (rel[:5], ref_losses[:5], our_losses[:5])
    # whole sequence: f32 drift compounds through Adam but must stay
    # small — a composition bug (wrong eps, wrong clip, wrong anneal,
    # wrong loss weight) separates the curves by orders of magnitude
    # more than rounding does
    assert rel.max() < 5e-2, (rel.max(), np.argmax(rel))
    assert np.all(np.isfinite(ref_losses)) and np.all(np.isfinite(our_losses))
