"""First-party LPIPS perceptual metric in pure JAX.

The reference wraps the `lpips` pip package (reference metrics.py:13-31)
and never uses it in the training loop; it exists for offline image
evaluation. This module implements the complete LPIPS computation graph
natively — input scaling, a VGG16/AlexNet conv feature extractor,
per-layer unit normalization, squared feature differences, the learned
1x1 linear calibration heads, and spatial averaging (Zhang et al. 2018,
"The Unreasonable Effectiveness of Deep Features as a Perceptual
Metric") — as jnp functions over an explicit parameter pytree.

Weights contract (zero-egress environments must vendor them):
    torch.save(lpips.LPIPS(net="vgg").state_dict(), "lpips_vgg.pth")
on any machine with the `lpips` package, then load here with
``load_torch_state_dict("lpips_vgg.pth")``. The state dict carries both
the backbone conv weights (``net.slice*.{i}.weight``) and the
calibration heads (``lin*.model.1.weight``); no torchvision download is
involved at load time. ``init_lpips`` builds a randomly initialized
instance of the same graph — structurally valid for tests and plumbing,
NOT a calibrated perceptual metric.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# conv channel plans between slice boundaries (each int = one 3x3 conv
# + relu; slices are separated by 2x2 max-pool for vgg / the native
# pool/stride structure for alex)
_VGG_SLICES = ((64, 64), (128, 128), (256, 256, 256),
               (512, 512, 512), (512, 512, 512))
_ALEX_CHANNELS = (64, 192, 384, 256, 256)

# ImageNet normalization constants used by the lpips package's
# ScalingLayer (inputs in [-1, 1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride=1, pad=1):
    """NCHW conv with torch weight layout (out, in, kh, kw)."""
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


def _maxpool(x, size=2, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, size, size), (1, 1, stride, stride),
        "VALID",
    )


def init_lpips(key, net: str = "vgg", in_ch: int = 3, width_mult: float = 1.0):
    """Random-weight LPIPS params (same pytree schema the converter
    emits). width_mult < 1 shrinks every conv for fast tests."""
    params = {"net": net, "slices": [], "heads": []}
    c_in = in_ch
    if net == "vgg":
        plans = [[max(1, int(c * width_mult)) for c in s] for s in _VGG_SLICES]
    elif net == "alex":
        plans = [[max(1, int(c * width_mult))] for c in _ALEX_CHANNELS]
    else:
        raise ValueError(f"net must be 'vgg' or 'alex', got {net!r}")
    keys = jax.random.split(key, sum(len(p) for p in plans) + len(plans))
    ki = 0
    for plan in plans:
        convs = []
        for c_out in plan:
            kh = 11 if (net == "alex" and ki == 0) else (
                5 if (net == "alex" and len(params["slices"]) == 1 and not convs)
                else 3)
            w = jax.random.normal(keys[ki], (c_out, c_in, kh, kh)) * (
                1.0 / np.sqrt(c_in * kh * kh))
            convs.append({"w": w, "b": jnp.zeros((c_out,))})
            c_in = c_out
            ki += 1
        params["slices"].append(convs)
        head = jnp.abs(jax.random.normal(keys[ki], (c_in,))) / c_in
        params["heads"].append(head)
        ki += 1
    return params


def _features(params, x):
    """x: (N, 3, H, W) in [-1, 1] -> list of per-slice feature maps."""
    net = params["net"]
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    h = (x - shift) / scale
    feats = []
    for si, convs in enumerate(params["slices"]):
        if net == "vgg":
            if si > 0:
                h = _maxpool(h)
            for c in convs:
                h = jax.nn.relu(_conv(h, c["w"], c["b"]))
        else:  # alex: conv(11,s4,p2) pool conv(5,p2) pool conv(3) conv(3) conv(3)
            (c,) = convs
            if si == 0:
                h = jax.nn.relu(_conv(h, c["w"], c["b"], stride=4, pad=2))
            elif si == 1:
                h = jax.nn.relu(_conv(_maxpool(h, 3, 2), c["w"], c["b"], pad=2))
            elif si == 2:
                h = jax.nn.relu(_conv(_maxpool(h, 3, 2), c["w"], c["b"]))
            else:
                h = jax.nn.relu(_conv(h, c["w"], c["b"]))
        feats.append(h)
    return feats


def lpips(params, pred, gt):
    """LPIPS distance between (H, W, 3) images in [0, 1] (or batched
    (N, H, W, 3)); returns a scalar (mean over the batch).

    Matches the lpips package's forward exactly: unit-normalize each
    layer's channels, squared difference, 1x1 non-negative linear head,
    spatial mean, sum over layers (lpips/lpips.py upstream)."""
    def to_nchw(img):
        img = jnp.asarray(img, jnp.float32)
        if img.ndim == 3:
            img = img[None]
        return jnp.transpose(img * 2.0 - 1.0, (0, 3, 1, 2))

    fp = _features(params, to_nchw(pred))
    fg = _features(params, to_nchw(gt))
    total = 0.0
    for hp, hg, head in zip(fp, fg, params["heads"]):
        norm = lambda t: t / jnp.sqrt(
            jnp.sum(t * t, axis=1, keepdims=True) + 1e-10)
        diff = (norm(hp) - norm(hg)) ** 2
        # lin head: 1x1 conv with non-negative weights == channel dot
        per_pixel = jnp.einsum("nchw,c->nhw", diff, head)
        total = total + jnp.mean(per_pixel, axis=(1, 2))
    return jnp.mean(total)


def load_torch_state_dict(path_or_dict, net: str = "vgg"):
    """Convert a saved ``lpips.LPIPS(net=...).state_dict()`` (see module
    docstring for how to produce one) into this module's params pytree."""
    if isinstance(path_or_dict, (str, bytes)):
        import torch

        sd = torch.load(path_or_dict, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
    else:
        sd = {k: np.asarray(v) for k, v in path_or_dict.items()}

    n_slices = 5
    params = {"net": net, "slices": [], "heads": []}
    for si in range(n_slices):
        prefix = f"net.slice{si + 1}."
        idxs = sorted({int(k[len(prefix):].split(".")[0])
                       for k in sd if k.startswith(prefix)})
        convs = [
            {"w": jnp.asarray(sd[f"{prefix}{i}.weight"]),
             "b": jnp.asarray(sd[f"{prefix}{i}.bias"])}
            for i in idxs if f"{prefix}{i}.weight" in sd
        ]
        if not convs:
            raise ValueError(
                f"no conv weights under {prefix!r}: not a full "
                "lpips.LPIPS state_dict (save with .state_dict() on the "
                "whole module, not the lin-heads-only checkpoint)")
        params["slices"].append(convs)
        params["heads"].append(
            jnp.asarray(sd[f"lin{si}.model.1.weight"]).reshape(-1))
    return params
