from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    data_parallel_mesh,
    local_batch_multiple,
    wrap_pad_indices,
    DATA_AXIS,
    MODEL_AXIS,
)
