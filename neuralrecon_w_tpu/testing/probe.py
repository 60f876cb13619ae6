"""Mechanism probes for the in-the-wild fixture.

On a fixture where every train view has a unique camera direction, the
IDR view-dependent color head can absorb per-image photometric jitter
without the appearance table (train PSNR alone cannot separate the
two). These probes check the NeRF-W mechanism directly, the way
appearance-interpolation demos do: hold geometry, points and view
direction fixed, swap only the per-image embedding, and compare the
rendered color against the jitter the fixture injected (reference
appearance table: lightning_modules/neuconw_system.py:74-78).
"""

from __future__ import annotations

import numpy as np


def injected_gains(n_images: int, seed: int, jitter: float) -> np.ndarray:
    """Replay the fixture's per-image photometric RNG
    (testing/synthetic.py make_synthetic_scene: light draw, then
    per-channel gain x exposure)."""
    gains = np.zeros((n_images, 3))
    for idx in range(n_images):
        rs_img = np.random.RandomState(seed * 1009 + 17 * idx + 3)
        rs_img.randn(3)  # light-direction draw
        gains[idx] = np.clip(
            (1.0 + 0.4 * jitter * rs_img.randn(3))
            * 2.0 ** (jitter * rs_img.randn()),
            0.3, 2.5,
        )
    return gains


def embedding_gain_correlation(
    params,
    fc,
    *,
    n_images: int,
    n_test: int,
    seed: int,
    jitter: float,
    scene_radius: float = 3.6,
    n_points: int = 2048,
    mesh=None,
    chunk: int = 65536,
) -> dict:
    """Render fixed surface points under each train image's embedding
    and correlate log rendered color with the log injected gain.

    Returns per-channel / flat / exposure Pearson r plus ranges.
    """
    from ..parallel.sweep import sharded_rgb_sweep

    rs = np.random.RandomState(1)
    pts = rs.randn(n_points, 3)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    pts[:, 2] = np.abs(pts[:, 2])  # hemisphere facing the probe view dir
    pts = pts / scene_radius  # unit-sphere surface in training coords

    n_vocab = int(np.asarray(params["embedding_a"]).shape[0])
    gains = injected_gains(n_images, seed, jitter)
    n_train = n_images - n_test
    mean_rgb = np.zeros((n_train, 3))
    for idx in range(n_train):
        a_index = min(idx + 1, n_vocab - 1)  # fixture img_id = idx + 1
        rgb = sharded_rgb_sweep(
            params, fc, pts, view_dir=np.array([0, 0, 1.0], np.float32),
            a_index=a_index, mesh=mesh, chunk=chunk,
        )
        mean_rgb[idx] = np.asarray(rgb).reshape(-1, 3).mean(axis=0)

    lr = np.log(np.maximum(mean_rgb, 1e-4))
    lg = np.log(gains[:n_train])
    per_channel = [
        float(np.corrcoef(lr[:, c], lg[:, c])[0, 1]) for c in range(3)
    ]
    return {
        "pearson_r_per_channel": per_channel,
        "pearson_r_flat": float(np.corrcoef(lr.ravel(), lg.ravel())[0, 1]),
        "pearson_r_exposure": float(
            np.corrcoef(lr.mean(axis=1), lg.mean(axis=1))[0, 1]
        ),
        "rendered_rgb_range": [float(mean_rgb.min()), float(mean_rgb.max())],
        "gain_range": [float(gains[:n_train].min()),
                       float(gains[:n_train].max())],
        "n_train": n_train,
    }
