"""Model zoo: SDF network, IDR color net, single-variance, background NeRF,
NeRF-W appearance embeddings — all pure functions over param pytrees."""

from .layers import (
    apply_linear,
    apply_wn_linear,
    init_linear,
    init_wn_linear,
    pe_dim,
    positional_encoding,
    softplus_beta,
    wn_from_weight,
    wn_weight,
)
from .sdf import apply_sdf, init_sdf, sdf_grad, sdf_value, sdf_value_feat_grad
from .color import apply_color, init_color
from .nerf_bg import apply_nerf_bg, init_nerf_bg
from .neuconw import (
    FieldConfig,
    field_background,
    field_config_from_cfg,
    field_forward,
    field_rgb,
    field_sdf,
    init_field,
    inv_s,
)

__all__ = [
    "apply_linear", "apply_wn_linear", "init_linear", "init_wn_linear",
    "pe_dim", "positional_encoding", "softplus_beta", "wn_from_weight",
    "wn_weight", "apply_sdf", "init_sdf", "sdf_grad", "sdf_value",
    "sdf_value_feat_grad", "apply_color", "init_color", "apply_nerf_bg",
    "init_nerf_bg", "FieldConfig", "field_background",
    "field_config_from_cfg", "field_forward", "field_rgb", "field_sdf",
    "init_field", "inv_s",
]
