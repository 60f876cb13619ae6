"""Volume rendering core: NeuS-W sampling + compositing as pure functions."""

from .sampling import cat_z_vals, sample_pdf, up_sample
from .renderer import (
    RenderConfig,
    SceneInfo,
    render_config_from_cfg,
    render_core,
    render_core_outside,
    render_rays,
    sparse_sampler,
)

__all__ = [
    "cat_z_vals", "sample_pdf", "up_sample", "RenderConfig", "SceneInfo",
    "render_config_from_cfg", "render_core", "render_core_outside",
    "render_rays", "sparse_sampler",
]
