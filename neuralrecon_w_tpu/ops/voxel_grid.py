"""Sparse voxel grid: the TPU-native replacement for kaolin SPC octrees.

A level-L grid over the cube [-1, 1]^3 centered at ``origin`` with
half-extent ``scale`` (SFM units). Occupied cells are kept as a
morton-sorted coordinate set on the host (numpy) and shipped to device as
a packed uint32 occupancy bitfield for ray traversal
(see ops/ray_voxel.py). Covers the roles of the reference's
gen_octree / expand_points / convert_to_dense / level up-sampling
(reference tools/prepare_data/generate_voxel.py:27-308).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .morton import morton_to_points, points_to_morton


@dataclasses.dataclass
class VoxelGrid:
    level: int
    origin: np.ndarray  # (3,) cube center, SFM coords
    scale: float  # cube half-extent, SFM units
    coords: np.ndarray  # (M, 3) int32 occupied cells, morton-sorted

    @property
    def res(self) -> int:
        return 1 << self.level

    @property
    def voxel_size(self) -> float:
        """Edge length of one cell in SFM units (= 2*scale / 2^level)."""
        return 2.0 * self.scale / self.res

    def centers_sfm(self) -> np.ndarray:
        """(M, 3) voxel centers in SFM coordinates."""
        return (
            (self.coords.astype(np.float64) + 0.5) / self.res * 2.0 - 1.0
        ) * self.scale + self.origin

    def corners_sfm(self) -> np.ndarray:
        """(M, 3) voxel min-corners in SFM coordinates (kaolin point
        convention: cell index maps to its low corner)."""
        return (
            self.coords.astype(np.float64) / self.res * 2.0 - 1.0
        ) * self.scale + self.origin

    def occupancy_words(self) -> np.ndarray:
        """Packed occupancy bitfield, shape (2^{3L}/32,) uint32.

        Bit layout: linear index ((x * N) + y) * N + z; word = idx >> 5,
        bit = idx & 31."""
        n = self.res
        idx = (
            self.coords[:, 0].astype(np.int64) * n + self.coords[:, 1]
        ) * n + self.coords[:, 2]
        words = np.zeros((max(n * n * n // 32, 1),), dtype=np.uint32)
        np.bitwise_or.at(
            words, idx >> 5, np.uint32(1) << (idx & 31).astype(np.uint32)
        )
        return words

    def contains(self, cells: np.ndarray) -> np.ndarray:
        """Membership test for (K, 3) integer cells via morton search."""
        codes = points_to_morton(self.coords)
        q = points_to_morton(cells)
        pos = np.searchsorted(codes, q)
        pos = np.clip(pos, 0, len(codes) - 1)
        return codes[pos] == q

    def upsample(self, target_level: int) -> "VoxelGrid":
        """Subdivide every occupied cell to ``target_level`` (all children
        occupied) — the dense-ify + meshgrid-kernel expansion the reference
        performs before SDF sweeps (reference
        lightning_modules/neuconw_system.py:202-233)."""
        up = target_level - self.level
        assert up >= 0
        if up == 0:
            return self
        t = 1 << up
        k = np.stack(
            np.meshgrid(np.arange(t), np.arange(t), np.arange(t), indexing="ij"),
            axis=-1,
        ).reshape(-1, 3)
        coords = (self.coords.astype(np.int64)[:, None, :] * t + k[None, :, :]).reshape(-1, 3)
        return VoxelGrid(
            target_level, self.origin, self.scale, _sort_coords(coords, target_level)
        )

    def downsample(self, target_level: int) -> "VoxelGrid":
        down = self.level - target_level
        assert down >= 0
        coords = np.unique(self.coords >> down, axis=0)
        return VoxelGrid(
            target_level, self.origin, self.scale, _sort_coords(coords, target_level)
        )


def _sort_coords(coords: np.ndarray, level: int) -> np.ndarray:
    coords = np.unique(np.asarray(coords, dtype=np.int64), axis=0)
    order = np.argsort(points_to_morton(coords), kind="stable")
    return coords[order].astype(np.int32)


def expand_points(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Naive sparse dilation: 27-neighborhood copies of every point
    (reference tools/prepare_data/generate_voxel.py:27-38)."""
    offsets = np.stack(
        np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1], indexing="ij"), axis=-1
    ).reshape(-1, 3)
    expanded = (points[None, :, :] + offsets[:, None, :] * voxel_size).reshape(-1, 3)
    return np.unique(expanded, axis=0)


def level_for_voxel_size(scale: float, voxel_size: float, mode: str = "floor") -> int:
    """Grid level for a requested SFM-space voxel size.

    The reference uses floor when building octrees
    (generate_voxel.py:146) and ceil when deriving the training level
    (neuconw_system.py:330)."""
    raw = np.log2(2.0 * scale / voxel_size)
    return int(np.floor(raw)) if mode == "floor" else int(np.ceil(raw))


def grid_from_points(
    points: np.ndarray,
    bbx_min: np.ndarray,
    bbx_max: np.ndarray,
    voxel_size: float,
    expand: int = 1,
    radius: float = 1.0,
) -> VoxelGrid:
    """Build a sparse grid from SFM points.

    Mirrors gen_octree (reference generate_voxel.py:75-170): cube from the
    bbx (max extent, optional radius inflation), optional 27-neighborhood
    dilation rounds, filter to the open cube, quantize at
    floor(log2(2*scale/voxel_size)).
    """
    bbx_min = np.asarray(bbx_min, dtype=np.float64)
    bbx_max = np.asarray(bbx_max, dtype=np.float64)
    dim = np.max(bbx_max - bbx_min)
    origin = bbx_min + (bbx_max - bbx_min) / 2.0
    scale = float(dim / 2.0 * radius)
    level = level_for_voxel_size(scale, voxel_size, "floor")

    pts = np.asarray(points, dtype=np.float64)

    # native fast path: hash-set dilation+quantization (csrc/geometry.cpp)
    # — identical cell set, without materializing 27^expand point copies
    from .native import expand_quantize
    from .morton import morton_to_points

    codes = expand_quantize(pts, origin, scale, voxel_size, level, int(expand))
    if codes is not None:
        return VoxelGrid(level, origin, scale,
                         morton_to_points(codes).astype(np.int32))

    for _ in range(int(expand)):
        pts = expand_points(pts, voxel_size)

    normalized = (pts - origin) / scale
    mask = np.all(normalized > -1.0, axis=-1) & np.all(normalized < 1.0, axis=-1)
    normalized = normalized[mask]

    res = 1 << level
    cells = np.clip(np.floor((normalized + 1.0) / 2.0 * res), 0, res - 1).astype(np.int64)
    return VoxelGrid(level, origin, scale, _sort_coords(cells, level))


def grid_from_sfm_points(scene_config: dict, points3d: dict, min_track_length: int,
                         voxel_size: float, expand: int = 1, radius: float = 1.0,
                         in_sfm: bool = True) -> VoxelGrid:
    """Build the SFM occupancy grid from parsed COLMAP points3D, filtering
    by track length, with the eval bbx transformed into SFM coordinates
    (reference generate_voxel.py:41-123)."""
    pts = np.array(
        [p.xyz for p in points3d.values() if len(p.point2D_idxs) > min_track_length]
    ).reshape(-1, 3)
    bbx_min, bbx_max = scene_bbx_sfm(scene_config, in_sfm=in_sfm)
    return grid_from_points(pts, bbx_min, bbx_max, voxel_size, expand, radius)


def scene_bbx_sfm(scene_config: dict, bbx_name: str = "eval_bbx", in_sfm: bool = True):
    """The scene's eval bounding box, expressed in SFM coordinates."""
    import numpy as np

    v1 = np.array(scene_config[bbx_name][0], dtype=np.float64)
    v2 = np.array(scene_config[bbx_name][1], dtype=np.float64)
    if in_sfm:
        sfm_to_gt = np.array(scene_config["sfm2gt"], dtype=np.float64)
        gt_to_sfm = np.linalg.inv(sfm_to_gt)
        v1 = gt_to_sfm[:3, :3] @ v1 + gt_to_sfm[:3, 3]
        v2 = gt_to_sfm[:3, :3] @ v2 + gt_to_sfm[:3, 3]
    return np.minimum(v1, v2), np.maximum(v1, v2)
