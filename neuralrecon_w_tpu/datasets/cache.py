"""Ray-cache storage + the training-time ray pool.

Format parity with the reference cache
(reference tools/prepare_data/prepare_data_cache.py:78-210,
datasets/phototourism.py:467-515):
  <root>/<cache_dir>/splits/split_{i}/rays{downscale}.h5   key "rays"
  <root>/<cache_dir>/splits/split_{i}/rgbs{downscale}.h5   key "rgbs"
  <root>/<cache_dir>/splits/rays{downscale}_meta_info.json
    {"data_length", "chunk_length", "n_trunks"}
Rows are padded to a multiple of n_splits by duplicating random rays
(reference prepare_data_cache.py:189-198).

Training-time, each host process loads a disjoint seeded-permutation
subset of the splits (reference datasets/data.py:83-100, seed 6) into one
contiguous array, then samples fixed-size batches with a fast RNG —
replacing the torch DataLoader + shuffle sampler with an HBM/host-RAM
resident pool and index gathers.
"""

from __future__ import annotations

import json
import os

import numpy as np

DEFAULT_N_SPLITS = 64


def _h5(path, mode="r"):
    import h5py

    return h5py.File(path, mode)


def write_ray_cache(
    rays_per_image: list,
    rgbs_per_image: list,
    root_dir: str,
    cache_dir: str = "cache_sgs",
    n_splits: int = DEFAULT_N_SPLITS,
    img_downscale: int = 1,
    cache_type: str = "h5",
    seed: int = 0,
) -> str:
    """Concatenate per-image ray/rgb arrays, pad, write n_splits chunks."""
    rays = np.concatenate(rays_per_image, axis=0).astype(np.float32)
    rgbs = np.concatenate(rgbs_per_image, axis=0).astype(np.float32)
    n = len(rays)
    pad = (-n) % n_splits
    if pad:
        idx = np.random.RandomState(seed).choice(n, pad, replace=False if pad <= n else True)
        rays = np.concatenate([rays, rays[idx]], axis=0)
        rgbs = np.concatenate([rgbs, rgbs[idx]], axis=0)
    total = len(rays)
    chunk = total // n_splits

    split_root = os.path.join(root_dir, cache_dir, "splits")
    os.makedirs(split_root, exist_ok=True)
    for i in range(n_splits):
        d = os.path.join(split_root, f"split_{i}")
        os.makedirs(d, exist_ok=True)
        sl = slice(i * chunk, (i + 1) * chunk)
        for key, arr in (("rays", rays), ("rgbs", rgbs)):
            path = os.path.join(d, f"{key}{img_downscale}.{cache_type}")
            if cache_type == "h5":
                with _h5(path, "w") as f:
                    f.create_dataset(key, data=arr[sl], chunks=True)
            else:
                np.savez_compressed(path, arr[sl])
    meta = {"data_length": total, "chunk_length": chunk, "n_trunks": n_splits}
    for key in ("rays", "rgbs"):
        with open(
            os.path.join(split_root, f"{key}{img_downscale}_meta_info.json"), "w"
        ) as f:
            json.dump(meta, f)
    return split_root


def local_split_names(split_root: str, world_size: int, rank: int, seed: int = 6):
    """Seeded disjoint split assignment (reference datasets/data.py:83-100).

    The reference hard-asserts world_size | n_splits (datasets/data.py:42-45);
    here the remainder is instead distributed disjointly — the first
    ``n % world_size`` ranks get one extra split — so shard unions are
    always a partition of the split set (no host ever trains on another
    host's shard)."""
    names = sorted(
        d for d in os.listdir(split_root)
        if os.path.isdir(os.path.join(split_root, d))
    )
    n = len(names)
    if world_size > n:
        raise ValueError(
            f"world_size {world_size} exceeds the {n} cache splits; "
            "regenerate the cache with more splits"
        )
    perm = np.random.RandomState(seed).permutation(names)
    base, rem = divmod(n, world_size)
    start = rank * base + min(rank, rem)
    count = base + (1 if rank < rem else 0)
    return list(perm[start : start + count])


def read_ray_cache(
    split_root: str,
    cache_names: list | None = None,
    img_downscale: int = 1,
):
    """Load and concatenate the named splits (all when None).
    Returns (rays, rgbs) float32 arrays."""
    if cache_names is None:
        cache_names = sorted(
            d for d in os.listdir(split_root)
            if os.path.isdir(os.path.join(split_root, d))
        )
    all_rays, all_rgbs = [], []
    for name in cache_names:
        d = os.path.join(split_root, name)
        ray_h5 = os.path.join(d, f"rays{img_downscale}.h5")
        if os.path.exists(ray_h5):
            with _h5(ray_h5) as f:
                all_rays.append(f["rays"][:])
            with _h5(os.path.join(d, f"rgbs{img_downscale}.h5")) as f:
                all_rgbs.append(f["rgbs"][:])
        else:  # npz fallback (reference cache_type 'npz')
            all_rays.append(
                np.load(os.path.join(d, f"rays{img_downscale}.npz"))["arr_0"]
            )
            all_rgbs.append(
                np.load(os.path.join(d, f"rgbs{img_downscale}.npz"))["arr_0"]
            )
    return (
        np.concatenate(all_rays, 0).astype(np.float32),
        np.concatenate(all_rgbs, 0).astype(np.float32),
    )


class RayPool:
    """In-memory ray pool producing fixed-size training batches.

    Splits the 12/11-column cache rows into the renderer's inputs
    (reference datasets/phototourism.py:709-724): rays (10 cols:
    o, d, near, far, depth, weight), ts int32, labels int32, rgbs.
    """

    def __init__(self, rays: np.ndarray, rgbs: np.ndarray, with_semantics=True,
                 seed: int = 0):
        self.with_semantics = with_semantics and rays.shape[1] >= 12
        if self.with_semantics:
            self.rays = np.concatenate([rays[:, :8], rays[:, 10:12]], axis=1)
            self.labels = rays[:, 9].astype(np.int32)
        else:
            self.rays = np.concatenate([rays[:, :8], rays[:, 9:11]], axis=1)
            self.labels = np.zeros((len(rays),), np.int32)
        self.ts = rays[:, 8].astype(np.int32)
        self.rgbs = rgbs
        self._rng = np.random.RandomState(seed)
        self._order = None
        self._cursor = 0

    def __len__(self):
        return len(self.rays)

    def epoch_batches(self, batch_size: int):
        """Number of full batches per epoch."""
        return len(self.rays) // batch_size

    def next_batch(self, batch_size: int) -> dict:
        """Shuffled without-replacement batch (epoch semantics of the
        torch DataLoader with shuffle=True, drop_last behavior)."""
        if self._order is None or self._cursor + batch_size > len(self._order):
            self._order = self._rng.permutation(len(self.rays))
            self._cursor = 0
        idx = self._order[self._cursor : self._cursor + batch_size]
        self._cursor += batch_size
        return self.gather(idx)

    def gather(self, idx: np.ndarray) -> dict:
        return {
            "rays": self.rays[idx],
            "ts": self.ts[idx],
            "labels": self.labels[idx],
            "rgbs": self.rgbs[idx],
        }


class DeviceRayPool:
    """HBM-resident ray pool: the whole shard lives on device and every
    batch is an on-device RNG gather — zero host involvement per step
    (the torch DataLoader + per-step H2D copies of the reference become
    one upfront transfer; SURVEY.md §7.5's sharded HBM-resident pool).

    With a data mesh, rows are sharded across devices and the gather is
    per-shard (each device samples from its local rows), matching the
    reference's shard-assigned data parallelism semantics
    (reference datasets/data.py:83-119).

    ``sampling``: 'epoch' (default) draws shuffled without-replacement
    batches — the exact semantics of the host RayPool and the
    reference's DataLoader(shuffle=True) — from a device-resident
    per-epoch permutation (per shard on a mesh) advanced by a host-side
    cursor; 'replacement' keeps the stateless per-step randint gather.
    """

    def __init__(self, pool: RayPool, mesh=None, sampling: str = "epoch",
                 seed: int = 0):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        if sampling not in ("epoch", "replacement"):
            raise ValueError(f"unknown sampling mode {sampling!r}")
        self.sampling = sampling
        self._seed = int(seed)
        self._epoch_i = 0
        self._cursor = 0
        self._perm = None
        self.n = len(pool)
        self._mesh = mesh
        arrays = {
            "rays": pool.rays, "ts": pool.ts,
            "labels": pool.labels, "rgbs": pool.rgbs,
        }
        if mesh is not None:
            from ..parallel.mesh import DATA_AXIS

            n_data = mesh.shape[DATA_AXIS]
            keep = (self.n // n_data) * n_data
            sharding = NamedSharding(mesh, P(DATA_AXIS))
            self.n_shards = n_data
            self.rows_per_shard = keep // n_data
            self.data = {
                k: jax.device_put(jnp.asarray(v[:keep]), sharding)
                for k, v in arrays.items()
            }
        else:
            self.n_shards = 1
            self.rows_per_shard = self.n
            self.data = {k: jnp.asarray(v) for k, v in arrays.items()}

        self._gather = self._build_gather()
        self._gather_epoch = self._build_gather_epoch()

    def _shard_map(self):
        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map
        return shard_map

    def _reshuffle(self):
        """New per-epoch permutation (per shard on a mesh), cursor to 0."""
        import jax

        key = jax.random.fold_in(
            jax.random.PRNGKey(self._seed), self._epoch_i)
        self._epoch_i += 1
        self._cursor = 0
        rows = self.rows_per_shard
        if self._mesh is None:
            self._perm = jax.jit(
                lambda k: jax.random.permutation(k, rows))(key)
            return
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        shard_map = self._shard_map()
        mesh = self._mesh

        def local_perm(k):
            k = jax.random.fold_in(k[0], jax.lax.axis_index(DATA_AXIS))
            return jax.random.permutation(k, rows)

        self._perm = jax.jit(
            lambda k: shard_map(local_perm, mesh=mesh, in_specs=P(None),
                                out_specs=P(DATA_AXIS))(k[None])
        )(key)

    def _build_gather_epoch(self):
        import jax

        if self._mesh is None:
            def gather(data, perm, start, batch_size: int):
                idx = jax.lax.dynamic_slice_in_dim(perm, start[0], batch_size)
                return {k: v[idx] for k, v in data.items()}

            return jax.jit(gather, static_argnames=("batch_size",))

        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        shard_map = self._shard_map()
        mesh = self._mesh
        n_shards = self.n_shards

        def local_gather(data, perm, start, per_shard):
            idx = jax.lax.dynamic_slice_in_dim(perm, start[0], per_shard)
            return {k: v[idx] for k, v in data.items()}

        def gather(data, perm, start, batch_size: int):
            per_shard = batch_size // n_shards
            return shard_map(
                lambda d, p, s: local_gather(d, p, s, per_shard),
                mesh=mesh,
                in_specs=({k: P(DATA_AXIS) for k in data}, P(DATA_AXIS),
                          P(None)),
                out_specs={k: P(DATA_AXIS) for k in data},
            )(data, perm, start)

        return jax.jit(gather, static_argnames=("batch_size",))

    def _build_gather(self):
        import jax
        import jax.numpy as jnp

        rows = self.rows_per_shard
        n_shards = self.n_shards

        if self._mesh is None:
            def gather(data, rng, batch_size: int):
                idx = jax.random.randint(rng, (batch_size,), 0, rows)
                return {k: v[idx] for k, v in data.items()}

            return jax.jit(gather, static_argnames=("batch_size",))

        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import DATA_AXIS

        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map

        mesh = self._mesh

        def local_gather(data, rng, per_shard):
            # distinct stream per shard
            rng = jax.random.fold_in(rng[0], jax.lax.axis_index(DATA_AXIS))
            idx = jax.random.randint(rng, (per_shard,), 0, rows)
            return {k: v[idx] for k, v in data.items()}

        def gather(data, rng, batch_size: int):
            per_shard = batch_size // n_shards
            return shard_map(
                lambda d, r: local_gather(d, r, per_shard),
                mesh=mesh,
                in_specs=({k: P(DATA_AXIS) for k in data}, P(None)),
                out_specs={k: P(DATA_AXIS) for k in data},
            )(data, rng[None])

        return jax.jit(gather, static_argnames=("batch_size",))

    def next_batch(self, rng, batch_size: int) -> dict:
        """On-device batch; arrays stay on device. 'epoch' mode draws
        the next shuffled without-replacement window per shard (the rng
        argument is ignored — epoch order comes from the pool seed);
        'replacement' keeps the stateless RNG gather."""
        if self.sampling == "replacement":
            return self._gather(self.data, rng, batch_size)
        import jax.numpy as jnp

        per_shard = batch_size // self.n_shards
        if self._perm is None or self._cursor + per_shard > self.rows_per_shard:
            self._reshuffle()
        out = self._gather_epoch(
            self.data, self._perm,
            jnp.asarray([self._cursor], jnp.int32), batch_size)
        self._cursor += per_shard
        return out

    def take_scan_window(self, batch_size: int, n_inner: int):
        """Reserve the next n_inner consecutive epoch batches for a
        scan-fused dispatch: returns (perm, start) operands for
        make_scan_train_fn. Single-data-shard pools only (matching the
        scan dispatch's own constraint)."""
        if self.sampling == "replacement":
            return None, None
        if self.n_shards != 1:
            raise ValueError("take_scan_window requires a single-shard pool")
        import jax.numpy as jnp

        need = batch_size * n_inner
        if need > self.rows_per_shard:
            raise ValueError(
                f"scan window {need} rows exceeds the {self.rows_per_shard}"
                "-row pool; lower TPU.SCAN_INNER or the batch size")
        if self._perm is None or self._cursor + need > self.rows_per_shard:
            self._reshuffle()
        start = self._cursor
        self._cursor += need
        return self._perm, jnp.asarray(start, jnp.int32)

    def attach_surface(self, grid, level: int, chunk: int = 1 << 18):
        """Precompute the surface-band first hit (exact DDA) for every
        pool row and make it part of each gathered batch.

        The band only depends on (ray, fine grid) and the grid only
        changes at octree_update boundaries, so one pool-wide traversal
        per refresh replaces a per-step query in the training step (the
        reference re-raytraces its SPC octree every step,
        reference rendering/renderer.py:415-430). Call again after every
        refresh; ``detach_surface`` drops the cache (warm-up phase).
        """
        import jax.numpy as jnp

        def query(rays):
            return _band_query(grid, level, rays)

        rays = self.data["rays"]
        if self._mesh is not None:
            # sharded pool: one call, rows stay sharded over `data`
            surf, hit = query(rays)
        else:
            parts = [query(rays[i:i + chunk]) for i in range(0, self.n, chunk)]
            surf = jnp.concatenate([p[0] for p in parts])
            hit = jnp.concatenate([p[1] for p in parts])
        self.data = {**self.data, "surf_t": surf, "surf_hit": hit}

    def detach_surface(self):
        self.data = {k: v for k, v in self.data.items()
                     if k not in ("surf_t", "surf_hit")}


def _band_query(grid, level, rays):
    """Module-level jitted band query: the grid is a traced ARGUMENT,
    not a captured constant, so successive octree refreshes reuse the
    compiled traversal (a flat grid's shape never changes at fixed
    level; a hierarchical grid recompiles only when its rank-indexed
    word count changes) instead of paying a constant-laden compile per
    attach_surface call."""
    import jax

    if not hasattr(_band_query, "_jitted"):
        from functools import partial

        from ..ops.ray_voxel import grid_near_far

        @partial(jax.jit, static_argnames=("level",))
        def jitted(grid, level, rays):
            surf, _, hit = grid_near_far(
                grid, level, rays[:, 0:3], rays[:, 3:6], first_only=True
            )
            return surf, hit

        _band_query._jitted = jitted
    return _band_query._jitted(grid, level, rays)
