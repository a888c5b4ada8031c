from multiplanarunet_tpu.utils.fusion.fuse_and_predict import (
    MultiViewPredictor,
    map_real_space_pred,
    pred_3D_iso,
    predict_3D_patches,
    predict_3D_patches_binary,
    predict_volume,
)
from multiplanarunet_tpu.utils.fusion.fusion_training import (
    predict_and_map,
    stack_collections,
)
