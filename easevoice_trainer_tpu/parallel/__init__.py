from . import distributed
from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    data_parallel_mesh,
    train_mesh,
    model_parallel_size,
    local_batch_multiple,
    wrap_pad_indices,
    DATA_AXIS,
    MODEL_AXIS,
)
