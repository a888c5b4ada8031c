from multiplanarunet_tpu.callbacks.callbacks import (
    Callback,
    CSVLogger,
    DelayedCallback,
    DividerLine,
    EarlyStopping,
    FGBatchBalancer,
    LearningCurve,
    MeanReduceLogArrays,
    MemoryConsumption,
    ModelCheckPointClean,
    PrintLayerWeights,
    Profiler,
    ReduceLROnPlateau,
    SaveOutputAs2DImage,
    SavePredictionImages,
    TrainTimer,
)
from multiplanarunet_tpu.callbacks.validation import Validation, ValDiceScores
from multiplanarunet_tpu.callbacks.funcs import (
    init_callback_objects,
    remove_validation_callbacks,
)
