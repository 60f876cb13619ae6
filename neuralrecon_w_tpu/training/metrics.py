"""Image quality metrics in pure jnp (reference metrics.py:1-31).

The reference pulls mse/psnr from its own code and ssim from kornia /
lpips from the lpips package; training only consumes psnr
(reference lightning_modules/neuconw_system.py:364-369). We provide
mse/psnr exactly and a standard Gaussian-window SSIM; LPIPS needs
pretrained conv weights and is provided behind an optional torch-cpu
fallback in evaluation tooling only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(pred: jnp.ndarray, gt: jnp.ndarray, mask=None) -> jnp.ndarray:
    err = (pred - gt) ** 2
    if mask is not None:
        return jnp.sum(err * mask) / (jnp.sum(mask) * err.shape[-1] + 1e-8)
    return jnp.mean(err)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray, mask=None) -> jnp.ndarray:
    return -10.0 * jnp.log10(jnp.maximum(mse(pred, gt, mask), 1e-10))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / jnp.sum(g)
    return g[:, None] * g[None, :]


def ssim(pred: jnp.ndarray, gt: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """SSIM over (H, W, C) images with an 11x11 Gaussian window."""
    k = _gaussian_kernel()[:, :, None, None]
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    def filt(img):
        # (H, W, C) -> depthwise valid conv
        x = jnp.transpose(img, (2, 0, 1))[:, None]  # (C, 1, H, W)
        out = jax.lax.conv_general_dilated(
            x, jnp.transpose(k, (2, 3, 0, 1)), (1, 1), "VALID"
        )
        return jnp.transpose(out[:, 0], (1, 2, 0))

    mu_p, mu_g = filt(pred), filt(gt)
    sigma_p = filt(pred * pred) - mu_p**2
    sigma_g = filt(gt * gt) - mu_g**2
    sigma_pg = filt(pred * gt) - mu_p * mu_g
    num = (2 * mu_p * mu_g + c1) * (2 * sigma_pg + c2)
    den = (mu_p**2 + mu_g**2 + c1) * (sigma_p + sigma_g + c2)
    return jnp.mean(num / den)


def lpips_loss(pred, gt, net: str = "vgg", weights: str | None = None):
    """LPIPS perceptual distance over (H, W, 3) [0,1] images.

    First-party JAX implementation (training/lpips.py) of the metric the
    reference wraps via the `lpips` package (reference metrics.py:13-31;
    unused in its training loop). Calibrated scores need the pretrained
    weights: pass ``weights`` = a saved ``lpips.LPIPS(net=..).state_dict()``
    file (see lpips.py docstring for the one-line export recipe)."""
    from .lpips import lpips, load_torch_state_dict

    if weights is None:
        raise RuntimeError(
            "LPIPS needs pretrained conv weights; vendor a "
            "lpips.LPIPS state_dict file and pass weights=<path> "
            "(zero-egress environments cannot download them)"
        )
    params = load_torch_state_dict(weights, net=net)
    return float(lpips(params, pred, gt))
