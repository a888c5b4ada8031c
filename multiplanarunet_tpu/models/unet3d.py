"""3D U-Net (flax.linen).

Same topology as the 2D model with volumetric convs/pools and default depth 3
(parity: `mpunet/models/unet3D.py`). NDHWC layout; bfloat16 compute optional."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multiplanarunet_tpu.models.unet import (
    ConvBNBlock, DilatedUpConv, SubpixelUpConv, _act, conv_kernel_init,
    crop_to_match,
)


class UNet3D(nn.Module):
    n_classes: int
    dim: int | None = None
    n_channels: int = 1
    depth: int = 3
    out_activation: str = "softmax"
    activation: str = "relu"
    kernel_size: int = 3
    padding: str = "same"
    complexity_factor: float = 1.0
    flatten_output: bool = False
    l1_reg: float | bool = False
    l2_reg: float | bool = False
    init_filters: int = 64
    dtype: jnp.dtype = jnp.float32
    # Default follows the 2D finding (models/unet.py): identical numerics,
    # same param tree, but the pixel-shuffle variant measured slower on
    # hardware — naive upsample+conv by default, flag kept for A/Bs.
    subpixel_decoder: bool = False
    # Inference-time decoder restructure — upsample+Conv(2x2x2) as one
    # input-dilated 3x3x3 conv (exact, same param tree; see 2D
    # DilatedUpConv, measured -11.4% on the per-view 2D scan on a v5e).
    dilated_upconv: bool = False

    @property
    def cf(self):
        return float(np.sqrt(self.complexity_factor))

    def _filters(self, base):
        return int(base * self.cf)

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = (self.kernel_size,) * 3
        if x.dtype != self.dtype:
            x = x.astype(self.dtype)

        skips = []
        filters = self.init_filters
        for i in range(self.depth):
            bn = ConvBNBlock(self._filters(filters), ks, self.activation,
                             self.dtype, name=f"encoder_L{i}")(x, train)
            skips.append(bn)
            x = nn.max_pool(bn, (2, 2, 2), strides=(2, 2, 2))
            filters *= 2

        x = ConvBNBlock(self._filters(filters), ks, self.activation,
                        self.dtype, name="bottom")(x, train)

        label_crop = np.zeros((3, 2), np.int64)
        for i in range(self.depth):
            filters //= 2
            skip = skips[-(i + 1)]
            if self.subpixel_decoder:
                x = SubpixelUpConv(self._filters(filters), ndim=3,
                                   dtype=self.dtype,
                                   name=f"decoder_L{i}_conv_up")(x)
            elif self.dilated_upconv:
                x = DilatedUpConv(self._filters(filters), ndim=3,
                                  dtype=self.dtype,
                                  name=f"decoder_L{i}_conv_up")(x)
            else:
                # Nearest 2x upsample via broadcast (same values as
                # jax.image.resize nearest / Keras UpSampling3D, but pure
                # data movement instead of a per-element gather on TPU)
                B, D, H, W, C = x.shape
                x = jnp.broadcast_to(
                    x[:, :, None, :, None, :, None, :],
                    (B, D, 2, H, 2, W, 2, C),
                ).reshape(B, D * 2, H * 2, W * 2, C)
                x = nn.Conv(self._filters(filters), (2, 2, 2), padding="SAME",
                            kernel_init=conv_kernel_init,
                            dtype=self.dtype, name=f"decoder_L{i}_conv_up")(x)
            x = _act(self.activation)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             name=f"decoder_L{i}_bn_up")(x)
            skip, crops = crop_to_match(skip, x)
            label_crop += crops
            x = jnp.concatenate([skip, x], axis=-1)
            x = ConvBNBlock(self._filters(filters), ks, self.activation,
                            self.dtype, name=f"decoder_L{i}")(x, train)

        x = nn.Conv(self.n_classes, (1, 1, 1), dtype=jnp.float32,
                    kernel_init=conv_kernel_init,
                    name="out_conv")(x.astype(jnp.float32))
        out = _act(self.out_activation)(x)
        if self.flatten_output:
            out = out.reshape(out.shape[0], -1, self.n_classes)
        self.sow("intermediates", "label_crop", label_crop)
        return out

    def count_params(self, params):
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
