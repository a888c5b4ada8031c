from multiplanarunet_tpu.preprocessing.scaling import (
    MultiChannelScaler,
    NoOpScaler,
    apply_scaling,
    assert_scaler,
    get_scaler,
)
