from .mesh import (
    DATA_AXIS,
    FRAME_AXIS,
    MODEL_AXIS,
    batch_sharding,
    data_parallel_mesh,
    make_mesh,
    maybe_initialize_distributed,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "FRAME_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "data_parallel_mesh",
    "make_mesh",
    "maybe_initialize_distributed",
    "replicated",
    "shard_batch",
]
