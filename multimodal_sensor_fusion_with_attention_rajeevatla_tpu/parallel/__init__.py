"""Parallelism: device mesh construction and sharding rules."""

from .mesh import (  # noqa: F401
    make_mesh,
    replicated_sharding,
    batch_sharding,
    shard_batch,
)
