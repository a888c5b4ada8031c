from multiplanarunet_tpu.evaluate.losses import (
    LOSSES,
    SparseCategoricalCrossentropy,
    SparseDiceLoss,
    SparseExponentialLogarithmicLoss,
    SparseExpLogDice,
    SparseFocalLoss,
    SparseGeneralizedDiceLoss,
    SparseJaccardDistanceLoss,
)
from multiplanarunet_tpu.evaluate.metrics import METRICS, dice, dice_all, class_wise_kappa
