"""Ray / sparse-voxel-grid intersection on device.

TPU-native replacement for kaolin's ``spc_render.unbatched_raytrace``
(the reference's only ray/octree kernel, used for cache near/far,
validation near/far override and surface-guided sampling — reference
tools/prepare_data/generate_voxel.py:311-439). Instead of a sparse
octree walk (scatter/pointer-chasing, hostile to XLA), rays march a
packed dense occupancy bitfield with a branch-free Amanatides–Woo DDA
inside ``lax.while_loop``; all lanes advance in lockstep and the loop
exits when every ray is done.

Contract (matching get_near_far): returned depths are ray parameters of
the ENTRY points of the first / last intersected voxel, scaled to SFM
units; rays whose first entry is <= 1e-4 (origin inside a voxel) are
reported as misses with near = far = 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .voxel_grid import VoxelGrid

_INF = jnp.float32(1e10)


class DeviceGrid(NamedTuple):
    """Device-resident occupancy grid (dynamic leaves; level is static)."""

    occ: jnp.ndarray  # (2^{3L}/32,) uint32 packed occupancy
    origin: jnp.ndarray  # (3,) float32, cube center in SFM coords
    scale: jnp.ndarray  # () float32, cube half-extent
    voxel_size: jnp.ndarray  # () float32, cell edge in SFM units


def device_grid_from_host(grid: VoxelGrid) -> DeviceGrid:
    return DeviceGrid(
        occ=jnp.asarray(grid.occupancy_words()),
        origin=jnp.asarray(grid.origin, jnp.float32),
        scale=jnp.asarray(grid.scale, jnp.float32),
        voxel_size=jnp.asarray(grid.voxel_size, jnp.float32),
    )


def _lookup(occ: jnp.ndarray, cell: jnp.ndarray, n: int) -> jnp.ndarray:
    """Occupancy bit for integer cells (R, 3); out-of-range -> False."""
    inb = jnp.all((cell >= 0) & (cell < n), axis=-1)
    c = jnp.clip(cell, 0, n - 1)
    idx = (c[:, 0] * n + c[:, 1]) * n + c[:, 2]
    word = occ[idx >> 5]
    bit = (word >> (idx & 31).astype(jnp.uint32)) & jnp.uint32(1)
    return (bit == 1) & inb


def dda_traverse(
    occ: jnp.ndarray,
    level: int,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    first_only: bool = False,
    max_steps: int | None = None,
):
    """March rays through the [-1,1]^3 grid.

    Args:
        occ: packed occupancy words.
        level: static grid level (resolution 2^level).
        rays_o: (R, 3) origins in grid-normalized coordinates.
        rays_d: (R, 3) directions (any scale; t is in units of |d|^-1).
        first_only: stop as soon as every ray has its first hit (cheaper;
            used by surface-guided sampling which only needs the surface
            depth).
        max_steps: traversal cap; defaults to the worst-case crossing
            count 3 * 2^level + 2.
    Returns:
        (t_first, t_last, hit): entry parameters of the first/last
        intersected voxel and a hit mask. Misses hold 0.
    """
    n = 1 << level
    if max_steps is None:
        max_steps = 3 * n + 2
    r = rays_o.shape[0]
    cell_w = 2.0 / n

    d = jnp.where(jnp.abs(rays_d) < 1e-12, 1e-12, rays_d)
    inv_d = 1.0 / d

    t0 = (-1.0 - rays_o) * inv_d
    t1 = (1.0 - rays_o) * inv_d
    t_enter = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_exit = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_enter = jnp.maximum(t_enter, 0.0)
    cube_hit = t_exit > t_enter

    pos = rays_o + d * (t_enter + 1e-6)[:, None]
    cell = jnp.clip(jnp.floor((pos + 1.0) / cell_w), 0, n - 1).astype(jnp.int32)
    step = jnp.where(d > 0, 1, -1).astype(jnp.int32)
    next_bound = (cell + (d > 0)).astype(jnp.float32) * cell_w - 1.0
    tmax = (next_bound - rays_o) * inv_d
    tdelta = cell_w * jnp.abs(inv_d)

    state = (
        cell,
        tmax,
        t_enter,  # entry parameter of the current cell
        jnp.full((r,), _INF),  # first hit
        jnp.full((r,), -_INF),  # last hit
        cube_hit,  # active
        jnp.int32(0),
    )

    def cond(s):
        _, _, _, _, _, active, i = s
        return jnp.any(active) & (i < max_steps)

    def body(s):
        cell, tmax, t_cur, first, last, active, i = s
        occ_hit = _lookup(occ, cell, n) & active
        first = jnp.where(occ_hit & (first >= _INF), t_cur, first)
        last = jnp.where(occ_hit, t_cur, last)

        t_next = jnp.min(tmax, axis=-1)
        axis = jnp.argmin(tmax, axis=-1)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        cell = cell + step * onehot
        tmax = tmax + tdelta * onehot.astype(tmax.dtype)

        inb = jnp.all((cell >= 0) & (cell < n), axis=-1)
        active = active & inb & (t_next <= jnp.min(jnp.maximum(t0, t1), axis=-1))
        if first_only:
            active = active & (first >= _INF)
        return cell, tmax, t_next, first, last, active, i + 1

    _, _, _, first, last, _, _ = jax.lax.while_loop(cond, body, state)
    hit = first < _INF
    t_first = jnp.where(hit, first, 0.0)
    t_last = jnp.where(hit, last, 0.0)
    return t_first, t_last, hit


class HierGrid(NamedTuple):
    """Two-level device occupancy: a dense bitfield of 8^3-cell blocks at
    level L-3 plus per-occupied-block fine bit words, rank-indexed.

    Replaces the flat 2^{3L} bitfield for deep grids — L=12 flat costs
    8.6 GB of HBM where this stays ~35 MB + 64 B per occupied block
    (the sparsity role of kaolin SPC, reference
    tools/prepare_data/generate_voxel.py:149-186) — and gives the DDA a
    coarse skip: empty space advances in 8-cell strides, so the
    while_loop trip count stops scaling as 3*2^L.
    """

    meta: jnp.ndarray  # (2^{3(L-3)}/32, 2) uint32: [coarse word, block rank base]
    fine: jnp.ndarray  # (16 * n_blocks,) uint32: 512 occupancy bits per block
    origin: jnp.ndarray  # (3,) float32, cube center in SFM coords
    scale: jnp.ndarray  # () float32, cube half-extent
    voxel_size: jnp.ndarray  # () float32, FINE cell edge in SFM units


def hier_grid_from_host(grid: VoxelGrid) -> HierGrid:
    """Build the packed two-level structure from a host VoxelGrid."""
    assert grid.level >= 3, "hierarchical grid needs level >= 3"
    n_c = 1 << (grid.level - 3)
    coords = grid.coords.astype(np.int64)
    blocks = coords >> 3
    bidx = (blocks[:, 0] * n_c + blocks[:, 1]) * n_c + blocks[:, 2]

    n_words = max(n_c * n_c * n_c // 32, 1)
    cwords = np.zeros((n_words,), np.uint32)
    np.bitwise_or.at(cwords, bidx >> 5, np.uint32(1) << (bidx & 31).astype(np.uint32))
    # exclusive prefix of per-word popcounts: block slot = rank[word] +
    # popcount(word & ((1 << bit) - 1)) — the classic succinct rank
    pc = np.unpackbits(cwords.view(np.uint8)).reshape(-1, 32).sum(axis=1)
    rank = np.zeros_like(pc, dtype=np.uint32)
    np.cumsum(pc[:-1], out=rank[1:])
    meta = np.stack([cwords, rank.astype(np.uint32)], axis=1)

    ub, inverse = np.unique(bidx, return_inverse=True)  # ascending = slot order
    fine = np.zeros((max(len(ub), 1), 16), np.uint32)
    f = (coords & 7).astype(np.int64)
    fidx = (f[:, 0] * 8 + f[:, 1]) * 8 + f[:, 2]
    np.bitwise_or.at(
        fine, (inverse, fidx >> 5), np.uint32(1) << (fidx & 31).astype(np.uint32)
    )
    return HierGrid(
        meta=jnp.asarray(meta),
        fine=jnp.asarray(fine.reshape(-1)),
        origin=jnp.asarray(grid.origin, jnp.float32),
        scale=jnp.asarray(grid.scale, jnp.float32),
        voxel_size=jnp.asarray(grid.voxel_size, jnp.float32),
    )


def dda_traverse_hier(
    hg: HierGrid,
    level: int,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    first_only: bool = False,
    max_steps: int | None = None,
):
    """March rays through a two-level grid (same contract as
    dda_traverse). Each iteration advances one FINE cell inside occupied
    blocks and one whole BLOCK (8 cells) through empty space — the cell
    exit is recomputed analytically per step at the chosen granularity,
    so no incremental tmax state needs to survive granularity switches.
    """
    n_f = 1 << level
    n_c = n_f >> 3
    if max_steps is None:
        # a mixed-granularity march can never cross more boundaries than
        # the all-fine worst case
        max_steps = 3 * n_f + 2
    r = rays_o.shape[0]
    w_f = 2.0 / n_f
    w_c = 2.0 / n_c
    n_blocks = hg.fine.shape[0] // 16

    d = jnp.where(jnp.abs(rays_d) < 1e-12, 1e-12, rays_d)
    inv_d = 1.0 / d

    t0 = (-1.0 - rays_o) * inv_d
    t1 = (1.0 - rays_o) * inv_d
    t_enter = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), 0.0)
    t_leave = jnp.min(jnp.maximum(t0, t1), axis=-1)
    cube_hit = t_leave > t_enter
    # probe nudge: quarter-millicell along the dominant axis, in t units
    eps_t = w_f * 1e-3 / jnp.max(jnp.abs(d), axis=-1)

    step_dir = (d > 0).astype(jnp.float32)

    state = (
        t_enter,  # entry parameter of the current cell
        jnp.full((r,), _INF),  # first hit
        jnp.full((r,), -_INF),  # last hit
        cube_hit,  # active
        jnp.int32(0),
    )

    def cond(s):
        _, _, _, active, i = s
        return jnp.any(active) & (i < max_steps)

    def body(s):
        t_cur, first, last, active, i = s
        p = rays_o + d * (t_cur + eps_t)[:, None]
        c = jnp.clip(jnp.floor((p + 1.0) / w_f), 0, n_f - 1).astype(jnp.int32)
        b = c >> 3

        bidx = (b[:, 0] * n_c + b[:, 1]) * n_c + b[:, 2]
        row = hg.meta[bidx >> 5]  # (R, 2): [word, rank base]
        word = row[:, 0]
        bit = (bidx & 31).astype(jnp.uint32)
        blk_occ = ((word >> bit) & jnp.uint32(1)) == 1
        low_mask = (jnp.uint32(1) << bit) - jnp.uint32(1)
        slot = row[:, 1].astype(jnp.int32) + jax.lax.population_count(
            word & low_mask
        ).astype(jnp.int32)

        f = c & 7
        fidx = (f[:, 0] * 8 + f[:, 1]) * 8 + f[:, 2]
        fword = hg.fine[
            jnp.clip(slot * 16 + (fidx >> 5), 0, n_blocks * 16 - 1)
        ]
        occ_hit = (
            blk_occ
            & (((fword >> (fidx & 31).astype(jnp.uint32)) & jnp.uint32(1)) == 1)
            & active
        )
        first = jnp.where(occ_hit & (first >= _INF), t_cur, first)
        last = jnp.where(occ_hit, t_cur, last)

        # advance to the exit of the current cell: fine granularity inside
        # occupied blocks, whole-block skip through empty ones
        use_fine = blk_occ[:, None]
        cell_g = jnp.where(use_fine, c, b).astype(jnp.float32)
        w_g = jnp.where(use_fine, w_f, w_c)
        hi = (cell_g + step_dir) * w_g - 1.0
        t_ex = jnp.min((hi - rays_o) * inv_d, axis=-1)
        t_next = jnp.maximum(t_ex, t_cur + eps_t)  # guarantee progress

        active = active & (t_next < t_leave)
        if first_only:
            active = active & (first >= _INF)
        return t_next, first, last, active, i + 1

    _, first, last, _, _ = jax.lax.while_loop(cond, body, state)
    hit = first < _INF
    t_first = jnp.where(hit, first, 0.0)
    t_last = jnp.where(hit, last, 0.0)
    return t_first, t_last, hit


def occupancy_lookup(grid, level: int, pts: jnp.ndarray) -> jnp.ndarray:
    """Vectorized occupancy test for points in grid-normalized [-1,1]^3
    coordinates; any leading shape. Out-of-cube points read False only
    through cell clipping (callers mask by range when it matters)."""
    n_f = 1 << level
    c = jnp.clip(jnp.floor((pts + 1.0) * (n_f / 2.0)), 0, n_f - 1).astype(jnp.int32)
    if isinstance(grid, HierGrid):
        n_c = n_f >> 3
        n_blocks = grid.fine.shape[0] // 16
        b = c >> 3
        bidx = (b[..., 0] * n_c + b[..., 1]) * n_c + b[..., 2]
        row = grid.meta[bidx >> 5]
        word = row[..., 0]
        bit = (bidx & 31).astype(jnp.uint32)
        blk = ((word >> bit) & jnp.uint32(1)) == 1
        low = (jnp.uint32(1) << bit) - jnp.uint32(1)
        slot = row[..., 1].astype(jnp.int32) + jax.lax.population_count(
            word & low
        ).astype(jnp.int32)
        f = c & 7
        fidx = (f[..., 0] * 8 + f[..., 1]) * 8 + f[..., 2]
        fw = grid.fine[jnp.clip(slot * 16 + (fidx >> 5), 0, n_blocks * 16 - 1)]
        return blk & (((fw >> (fidx & 31).astype(jnp.uint32)) & jnp.uint32(1)) == 1)
    idx = (c[..., 0] * n_f + c[..., 1]) * n_f + c[..., 2]
    word = grid.occ[idx >> 5]
    return ((word >> (idx & 31).astype(jnp.uint32)) & jnp.uint32(1)) == 1


def sampled_first_hit(
    grid,
    level: int,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_lo: jnp.ndarray,
    t_hi: jnp.ndarray,
    n_samples: int = 1024,
):
    """Approximate first-hit parameter by dense occupancy sampling of
    [t_lo, t_hi] — the loop-free surface query for the steady-state
    sampling band.

    The exact DDA (dda_traverse*) is a lax.while_loop whose per-
    iteration latency dominates the training step; the band placement
    it feeds (+- sample_range voxels, rendering/renderer.py
    near_far_from_fine_grid) tolerates sub-voxel error, so one
    (R, n_samples) occupancy gather + argmax replaces the march.
    Resolution: (t_hi - t_lo) / n_samples per ray; structures thinner
    than the step can be missed, so callers must keep the step at or
    below the (dilated) surface-shell thickness.

    Returns (t_first, hit) with t_first = 0 on miss (grid_near_far
    contract)."""
    rel = (jnp.arange(n_samples, dtype=jnp.float32) + 0.5) / n_samples
    t = t_lo[:, None] + (t_hi - t_lo)[:, None] * rel[None, :]  # (R, K)
    p = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
    inside = jnp.max(jnp.abs(p), axis=-1) < 1.0
    occ = occupancy_lookup(grid, level, p) & inside
    hit = jnp.any(occ, axis=1)
    idx = jnp.argmax(occ, axis=1)
    t_first = jnp.take_along_axis(t, idx[:, None], axis=1)[:, 0]
    return jnp.where(hit, t_first, 0.0), hit


# grids at/above this level ship as two-level structures by default
HIER_LEVEL_DEFAULT = 9


def make_device_grid(grid: VoxelGrid, hierarchical: bool | None = None):
    """Host -> device grid, picking the flat bitfield for shallow grids
    and the two-level structure for deep ones (flat level-12 occupancy
    alone would be 8.6 GB of HBM)."""
    if hierarchical is None:
        hierarchical = grid.level >= HIER_LEVEL_DEFAULT
    return hier_grid_from_host(grid) if hierarchical else device_grid_from_host(grid)


def traverse(grid, level, rays_o, rays_d, first_only=False, max_steps=None):
    """Type-dispatched DDA over either device-grid representation."""
    if isinstance(grid, HierGrid):
        return dda_traverse_hier(grid, level, rays_o, rays_d, first_only, max_steps)
    return dda_traverse(grid.occ, level, rays_o, rays_d, first_only, max_steps)


def grid_near_far(
    grid,
    level: int,
    rays_o_sfm: jnp.ndarray,
    rays_d: jnp.ndarray,
    first_only: bool = False,
):
    """near/far from voxel intersection, SFM units (get_near_far parity:
    far is the ENTRY of the last voxel — callers add voxel_size — and
    rays starting inside a voxel, t <= 1e-4, count as misses). Accepts
    either a DeviceGrid or a HierGrid."""
    o_norm = (rays_o_sfm - grid.origin) / grid.scale
    t_first, t_last, hit = traverse(grid, level, o_norm, rays_d, first_only)
    valid = hit & (t_first > 1e-4)
    near = jnp.where(valid, t_first * grid.scale, 0.0)
    far = jnp.where(valid, t_last * grid.scale, 0.0)
    return near, far, valid


def brute_force_near_far(grid: VoxelGrid, rays_o_sfm, rays_d):
    """O(R*M) numpy oracle for tests: per-ray min/max entry parameter over
    every occupied voxel AABB."""
    o = (np.asarray(rays_o_sfm) - grid.origin) / grid.scale
    d = np.asarray(rays_d, dtype=np.float64)
    d = np.where(np.abs(d) < 1e-12, 1e-12, d)
    n = grid.res
    lo = grid.coords / n * 2.0 - 1.0
    hi = (grid.coords + 1) / n * 2.0 - 1.0

    t0 = (lo[None, :, :] - o[:, None, :]) / d[:, None, :]
    t1 = (hi[None, :, :] - o[:, None, :]) / d[:, None, :]
    tn = np.max(np.minimum(t0, t1), axis=-1)
    tf = np.min(np.maximum(t0, t1), axis=-1)
    hits = (tf >= tn) & (tf > 0)
    entry = np.where(hits, np.maximum(tn, 0.0), np.inf)
    t_first = entry.min(axis=1)
    t_last = np.where(hits, np.maximum(tn, 0.0), -np.inf).max(axis=1)
    hit = np.isfinite(t_first)
    valid = hit & (t_first > 1e-4)
    near = np.where(valid, t_first * grid.scale, 0.0)
    far = np.where(valid, t_last * grid.scale, 0.0)
    return near, far, valid
