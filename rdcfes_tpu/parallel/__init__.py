from .halo import HaloPlan, HaloShardedSystem
from .sharding import ShardedTransientSystem, partition_elements

__all__ = [
    "HaloPlan",
    "HaloShardedSystem",
    "ShardedTransientSystem",
    "partition_elements",
]
