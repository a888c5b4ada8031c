from multiplanarunet_tpu.models.unet import UNet
from multiplanarunet_tpu.models.unet3d import UNet3D
from multiplanarunet_tpu.models.multitask_unet import MultiTaskUNet2D
from multiplanarunet_tpu.models.fusion_model import FusionModel, FusionLayer
from multiplanarunet_tpu.models.model_init import (
    MODELS,
    build_model,
    init_model_variables,
    model_initializer,
)
from multiplanarunet_tpu.models import checkpoint


def _prep_funcs():
    """Model name -> data-preparation function registry (lazy import to avoid
    a circular dependency with preprocessing)."""
    from multiplanarunet_tpu.preprocessing.data_preparation_funcs import (
        prepare_for_multi_view_unet,
        prepare_for_3d_unet,
    )

    return {
        "UNet": prepare_for_multi_view_unet,
        "UNet3D": prepare_for_3d_unet,
    }
