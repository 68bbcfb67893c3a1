from .mesh import (
    cache_sharding,
    make_mesh,
    param_shardings,
    shard_params,
)

__all__ = ["make_mesh", "param_shardings", "shard_params", "cache_sharding"]
