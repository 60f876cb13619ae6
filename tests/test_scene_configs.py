"""Every shipped per-scene YAML must load through the config system and
build valid model/render/loss configs (hyperparameter parity with the
reference's config/train_*.yaml)."""

import glob
import os

import pytest

from neuralrecon_w_tpu.config import get_cfg_defaults
from neuralrecon_w_tpu.models import field_config_from_cfg
from neuralrecon_w_tpu.rendering import render_config_from_cfg
from neuralrecon_w_tpu.training import loss_config_from_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
YAMLS = sorted(glob.glob(os.path.join(REPO, "config", "train*.yaml")))


@pytest.mark.parametrize("path", YAMLS, ids=[os.path.basename(p) for p in YAMLS])
def test_scene_yaml_loads(path):
    cfg = get_cfg_defaults()
    cfg.merge_from_file(path)
    fc = field_config_from_cfg(cfg)
    rcfg = render_config_from_cfg(cfg)
    lcfg = loss_config_from_cfg(cfg)
    assert fc.sdf_cfg["d_hidden"] >= 64
    assert rcfg.n_samples > 0
    assert lcfg.igr_weight >= 0

    name = os.path.basename(path)
    if name == "train_brandenburg_gate.yaml":
        assert rcfg.n_samples == 8 and rcfg.n_importance == 16
        assert rcfg.up_sample_steps == 2 and rcfg.boundary_samples == 10
        assert rcfg.s_val_base == 3 and rcfg.sample_range == 16
        assert fc.n_vocab == 5000 and fc.n_a == 48
        assert rcfg.mesh_mask_ids is not None
        assert lcfg.use_depth_loss
    if name == "train_indoor.yaml":
        assert fc.sdf_cfg["inside_outside"] is True
        assert fc.encode_a_bg is False


def test_reference_yaml_schema_compat():
    """The REFERENCE's own per-scene YAMLs must also load unchanged
    (external-contract parity, SURVEY.md §7)."""
    ref_yamls = sorted(glob.glob("/root/reference/config/train*.yaml"))
    if not ref_yamls:
        pytest.skip("reference configs unavailable")
    for path in ref_yamls:
        cfg = get_cfg_defaults()
        cfg.merge_from_file(path)
        field_config_from_cfg(cfg)
        render_config_from_cfg(cfg)
        loss_config_from_cfg(cfg)


def test_tpu_operating_point_yaml_inherits_scene():
    """config/train_*_tpu.yaml = scene parity config (via _BASE_) + the
    quality-ablated TPU operating point. bench.py measures this exact
    artifact and scripts/train.sh selects it on a TPU backend, so the
    benched config and the trained config cannot drift apart."""
    path = os.path.join(REPO, "config", "train_brandenburg_gate_tpu.yaml")
    cfg = get_cfg_defaults()
    cfg.merge_from_file(path)
    # inherited scene hyperparameters (reference config parity values)
    rcfg = render_config_from_cfg(cfg)
    assert rcfg.n_samples == 8 and rcfg.n_importance == 16
    assert rcfg.sample_range == 16
    assert cfg.NEUCONW.BOUNDARY_SAMPLES == 10  # parity value kept
    # operating-point overrides (TPU namespace only)
    assert cfg.TPU.FIELD_DTYPE == "bfloat16"
    # The operating point itself is whatever the shipped YAML says (it
    # is revised by ablation waves; the verdict-consistency test below
    # pins the VALUES); this test pins the *mechanism*: when a TPU
    # override is set (>= 0), it wins over the inherited parity value.
    assert rcfg.bg_samples == cfg.TPU.BG_SAMPLES
    if cfg.TPU.BOUNDARY_SAMPLES >= 0:
        assert rcfg.boundary_samples == cfg.TPU.BOUNDARY_SAMPLES
    else:
        assert rcfg.boundary_samples == cfg.NEUCONW.BOUNDARY_SAMPLES


def test_tpu_operating_point_matches_decision_wave_verdict():
    """The shipped config/train_*_tpu.yaml operating point must match
    the ablation decision-wave artifact's verdict — 'configs match the
    outcome' is enforced mechanically, not by convention (the round-4
    BD6 revision shipped ahead of its own pre-registered wave)."""
    import glob
    import json

    import pytest

    art = os.path.join(REPO, "docs", "bg_boundary_ablation_r5.json")
    if not os.path.exists(art):
        pytest.skip("decision-wave artifact not landed yet")
    verdict = json.load(open(art))["verdict"]
    expected = {
        "bg4bd6": (4, 6), "bg8bd6": (8, 6), "refbg_bd6": (-1, 6),
        # full revert: the TPU yaml keeps only the dtype lever
        "reference_budget": (-1, -1),
    }[verdict]
    for path in glob.glob(os.path.join(REPO, "config", "train_*_tpu.yaml")):
        cfg = get_cfg_defaults()
        cfg.merge_from_file(path)
        assert (cfg.TPU.BG_SAMPLES, cfg.TPU.BOUNDARY_SAMPLES) == expected, (
            path, verdict)


def test_base_key_relative_and_override_order(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("NEUCONW:\n  N_SAMPLES: 8\n  N_OUTSIDE: 4\n")
    child = tmp_path / "child.yaml"
    child.write_text("_BASE_: base.yaml\nNEUCONW:\n  N_SAMPLES: 16\n")
    cfg = get_cfg_defaults()
    cfg.merge_from_file(str(child))
    assert cfg.NEUCONW.N_SAMPLES == 16  # child wins
    assert cfg.NEUCONW.N_OUTSIDE == 4  # base applied


def test_base_key_cycle_is_clear_error(tmp_path):
    """A self- or mutually-referencing _BASE_ chain raises ValueError
    naming the cycle, not a RecursionError 1000 frames deep."""
    import pytest

    a = tmp_path / "a.yaml"
    b = tmp_path / "b.yaml"
    a.write_text("_BASE_: b.yaml\n")
    b.write_text("_BASE_: a.yaml\n")
    cfg = get_cfg_defaults()
    with pytest.raises(ValueError, match="_BASE_ include cycle"):
        cfg.merge_from_file(str(a))
    selfref = tmp_path / "s.yaml"
    selfref.write_text("_BASE_: s.yaml\n")
    with pytest.raises(ValueError, match="_BASE_ include cycle"):
        get_cfg_defaults().merge_from_file(str(selfref))
