import os

import pytest

from neuralrecon_w_tpu.config import CfgNode, get_cfg_defaults

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "config")


def test_defaults_schema():
    cfg = get_cfg_defaults()
    assert cfg.NEUCONW.SDF_CONFIG.d_hidden == 512
    assert cfg.NEUCONW.LOSS.igr_weight == 0.1
    assert cfg.TRAINER.SEED == 66
    # clone isolation
    c2 = cfg.clone()
    c2.NEUCONW.N_SAMPLES = 1
    assert cfg.NEUCONW.N_SAMPLES == 512


@pytest.mark.parametrize(
    "name,igr,train_voxel",
    [
        ("train_brandenburg_gate", 1e-4, 0.08),
        ("train_lincoln_memorial", 0.01, 0.04),
        ("train_palacio_de_bellas_artes", 0.001, 0.12),
        ("train_pantheon_exterior", 0.001, 0.12),
    ],
)
def test_scene_yaml_merge(name, igr, train_voxel):
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(CFG_DIR, f"{name}.yaml"))
    assert cfg.NEUCONW.LOSS.igr_weight == pytest.approx(igr)
    assert cfg.NEUCONW.TRAIN_VOXEL_SIZE == pytest.approx(train_voxel)
    assert cfg.NEUCONW.N_SAMPLES == 8
    assert cfg.NEUCONW.N_IMPORTANCE == 16
    assert cfg.NEUCONW.UP_SAMPLE_STEP == 2
    assert cfg.NEUCONW.BOUNDARY_SAMPLES == 10
    assert cfg.NEUCONW.SDF_CONFIG.skip_in == (4,)
    assert cfg.NEUCONW.MESH_MASK_LIST == ["sky"]
    assert cfg.TRAINER.CANONICAL_LR == pytest.approx(1e-4)
    assert cfg.TRAINER.LR_SCHEDULER == "none"


def test_indoor_variant():
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(CFG_DIR, "train_indoor.yaml"))
    assert cfg.NEUCONW.SDF_CONFIG.inside_outside is True
    assert cfg.NEUCONW.RAY_MASK_LIST is None
    assert cfg.NEUCONW.ENCODE_A_BG is False
    assert cfg.NEUCONW.N_OUTSIDE == 8


def test_unknown_key_rejected(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("NEUCONW:\n  NOT_A_KEY: 1\n")
    cfg = get_cfg_defaults()
    with pytest.raises(KeyError):
        cfg.merge_from_file(str(bad))


def test_merge_from_list():
    cfg = get_cfg_defaults()
    cfg.merge_from_list(["NEUCONW.N_SAMPLES", "16", "TRAINER.LR", 5e-4])
    assert cfg.NEUCONW.N_SAMPLES == 16
    assert cfg.TRAINER.LR == pytest.approx(5e-4)


def test_tpu_boundary_samples_override():
    """TPU.BOUNDARY_SAMPLES >= 0 overrides the reference budget in the
    render config; -1 (default) keeps NEUCONW.BOUNDARY_SAMPLES."""
    from neuralrecon_w_tpu.rendering import render_config_from_cfg

    cfg = get_cfg_defaults()
    cfg.NEUCONW.BOUNDARY_SAMPLES = 10
    assert render_config_from_cfg(cfg).boundary_samples == 10
    cfg.TPU.BOUNDARY_SAMPLES = 4
    assert render_config_from_cfg(cfg).boundary_samples == 4
    cfg.TPU.BOUNDARY_SAMPLES = 0
    assert render_config_from_cfg(cfg).boundary_samples == 0
