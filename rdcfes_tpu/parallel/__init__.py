from .sharding import ShardedTransientSystem, partition_elements

__all__ = ["ShardedTransientSystem", "partition_elements"]
