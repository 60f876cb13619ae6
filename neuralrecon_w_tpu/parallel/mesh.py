"""Device mesh + sharding helpers: the TPU-native replacement for the
reference's NCCL/DDP runtime (reference train.py:55, utils/comm.py:22-53).

One logical axis pair:
  * ``data`` — rays are sharded here; gradient reduction is an XLA psum
    inserted automatically by jit from the sharding annotations (the DDP
    allreduce of reference train.py:55).
  * ``model`` — reserved for sharding the field MLP weights; the flagship
    model fits on one chip so defaults keep it at 1.

Everything is single-controller JAX: no process groups, no rank
bookkeeping — `jax.process_index()` replaces utils/comm.py entirely.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int = -1, n_model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. n_data=-1 uses every device."""
    devices = devices if devices is not None else jax.devices()
    if n_data < 0:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded across data — for ray batches."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated — for params/optimizer state on a data-only mesh."""
    return NamedSharding(mesh, P())


def shard_rays(mesh: Mesh, batch):
    """Shard a pytree of per-ray arrays over the data axis.

    Single-process: a plain device_put. Multihost (the mesh spans
    processes): each process contributes ITS batch as the local shard —
    the global batch is the concatenation across processes, exactly the
    reference's per-rank DataLoader semantics (reference
    datasets/data.py:83-119) — via make_array_from_process_local_data
    (device_put would instead require identical values on every
    process)."""
    s = data_sharding(mesh)
    if s.is_fully_addressable:
        return jax.tree.map(lambda x: jax.device_put(x, s), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batch,
    )


def field_param_specs(mesh: Mesh, params) -> dict:
    """Tensor-parallel PartitionSpecs for the field parameter pytree.

    Megatron-style column sharding of every linear's output dim over the
    ``model`` axis (weight-norm g/b shard with it), and vocab sharding of
    the appearance table — XLA inserts the psum/all-gathers implied by
    the annotations. Output dims not divisible by the model-axis size
    (the flagship SDF head's d_out=513) fall back to ROW sharding of the
    input dim — the matmul partial sums become an XLA-inserted
    all-reduce, so no flagship dimension needs doctoring for TP to
    engage. Only leaves hostile on both dims stay replicated.
    """
    n_model = mesh.shape[MODEL_AXIS]

    def spec_for(path, leaf):
        if n_model == 1:
            return P()
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        shape = leaf.shape
        if "embedding_a" in names:
            return P(MODEL_AXIS) if shape[0] % n_model == 0 else P()
        last = names[-1] if names else ""
        if last in ("v", "w") and len(shape) == 2:
            if shape[1] % n_model == 0:
                return P(None, MODEL_AXIS)  # column (output) sharding
            if shape[0] % n_model == 0:
                return P(MODEL_AXIS, None)  # row (input) sharding
        if last in ("g", "b") and len(shape) == 1 and shape[0] % n_model == 0:
            return P(MODEL_AXIS)
        return P()

    import jax

    return jax.tree_util.tree_map_with_path(spec_for, params)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def split_for_devices(x: np.ndarray, n_devices: int, pad_value=0.0):
    """Pad the leading axis to a multiple of n_devices (reference
    get_local_split pads with zeros then trims after all_gather,
    reference lightning_modules/neuconw_system.py:39-57). Returns the
    padded array and the original length."""
    n = x.shape[0]
    target = pad_to_multiple(max(n, 1), n_devices)
    if target == n:
        return x, n
    pad = np.full((target - n,) + x.shape[1:], pad_value, dtype=x.dtype)
    return np.concatenate([x, pad], axis=0), n
