from multiplanarunet_tpu.train.trainer import Trainer
from multiplanarunet_tpu.train.train_step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
