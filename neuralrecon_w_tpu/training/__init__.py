from .checkpoint import (
    latest_checkpoint,
    load_params_subtree,
    restore_checkpoint,
    save_checkpoint,
)
from .losses import LossConfig, loss_config_from_cfg, loss_terms
from .metrics import mse, psnr, ssim
from .schedule import make_lr_schedule, make_optimizer, scaled_lr
from .step import (
    TrainState,
    init_state,
    jit_train_step,
    make_render_fn,
    make_train_step,
    ray_mask_from_labels,
)
from .surface import octree_update, surface_level, surface_selection

__all__ = [
    "LossConfig", "loss_config_from_cfg", "loss_terms",
    "mse", "psnr", "ssim",
    "make_lr_schedule", "make_optimizer", "scaled_lr",
    "TrainState", "init_state", "jit_train_step", "make_render_fn",
    "make_train_step", "ray_mask_from_labels",
    "octree_update", "surface_level", "surface_selection",
    "latest_checkpoint", "load_params_subtree", "restore_checkpoint",
    "save_checkpoint",
]
