"""3D Morton (Z-order) codes, vectorized numpy + jax variants.

Replaces kaolin's ``points_to_morton``/``morton_to_points`` CUDA ops
(used by the reference at utils/eval_utils.py:199 and
utils/kaolin_renderer.py:95) with branch-free bit interleaving. Supports
grid coordinates up to 2^21 per axis (63-bit codes).
"""

from __future__ import annotations

import numpy as np

_MASKS = [
    (0x1FFFFF, 0),
    (0x1F00000000FFFF, 32),
    (0x1F0000FF0000FF, 16),
    (0x100F00F00F00F00F, 8),
    (0x10C30C30C30C30C3, 4),
    (0x1249249249249249, 2),
]


def _part1by2(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    for mask, shift in zip(
        [m for m, _ in _MASKS[1:]], [s for _, s in _MASKS[1:]]
    ):
        x = (x | (x << np.uint64(shift))) & np.uint64(mask)
    return x


def _compact1by2(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0x1249249249249249)
    for (mask, _), (_, shift) in zip(reversed(_MASKS[:-1]), reversed(_MASKS[1:])):
        x = (x ^ (x >> np.uint64(shift))) & np.uint64(mask)
    return x


def points_to_morton(points: np.ndarray) -> np.ndarray:
    """(N, 3) non-negative integer grid coords -> (N,) uint64 morton codes."""
    points = np.asarray(points, dtype=np.uint64)
    return (
        _part1by2(points[:, 0]) << np.uint64(2)
    ) | (_part1by2(points[:, 1]) << np.uint64(1)) | _part1by2(points[:, 2])


def morton_to_points(codes: np.ndarray) -> np.ndarray:
    """(N,) uint64 morton codes -> (N, 3) int64 grid coords."""
    codes = np.asarray(codes, dtype=np.uint64)
    x = _compact1by2(codes >> np.uint64(2))
    y = _compact1by2(codes >> np.uint64(1))
    z = _compact1by2(codes)
    return np.stack([x, y, z], axis=-1).astype(np.int64)
