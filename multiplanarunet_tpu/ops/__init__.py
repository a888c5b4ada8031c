from multiplanarunet_tpu.ops import elastic, geometry, interp
