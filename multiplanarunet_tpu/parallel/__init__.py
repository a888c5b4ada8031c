from multiplanarunet_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    get_mesh,
    pad_batch_to_multiple,
    replicate,
    replicated,
    shard_batch,
)
