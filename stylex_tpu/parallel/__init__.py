from stylex_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
    coordinate_sharding,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "coordinate_sharding",
]
