from multiplanarunet_tpu.image.queue.queues import (
    BaseQueue,
    EagerQueue,
    LazyQueue,
    LimitationQueue,
    LoadingPool,
    get_data_queues,
    validate_queue_type,
)
