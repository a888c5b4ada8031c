from multiplanarunet_tpu.augmentation.augmenters import (
    AUGMENTERS,
    Elastic2D,
    Elastic3D,
    build_augmenters,
)
