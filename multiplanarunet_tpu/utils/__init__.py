from multiplanarunet_tpu.utils.utils import (
    await_PIDs,
    create_folders,
    ensure_list_or_tuple,
    get_best_model,
    get_last_model,
    highlighted,
    pred_to_class,
)
