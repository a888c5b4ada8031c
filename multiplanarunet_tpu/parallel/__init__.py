from multiplanarunet_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    get_mesh,
    pad_batch_to_multiple,
    replicate,
    replicated,
    shard_batch,
)
from multiplanarunet_tpu.parallel.distributed import (
    initialize_distributed,
    local_batch_slice,
    maybe_initialize_distributed,
    task_group_mesh,
)
