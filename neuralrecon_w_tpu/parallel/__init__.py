from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    make_mesh,
    pad_to_multiple,
    replicated,
    shard_rays,
    split_for_devices,
)
from .sweep import sharded_rgb_sweep, sharded_sdf_sweep

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "data_sharding", "make_mesh",
    "pad_to_multiple", "replicated", "shard_rays", "split_for_devices",
    "sharded_rgb_sweep", "sharded_sdf_sweep",
]
