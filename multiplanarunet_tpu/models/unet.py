"""2D U-Net (flax.linen) — the flagship multi-planar model.

Architecture parity with the reference Keras model (`mpunet/models/unet.py`):
depth-N encoder of [Conv3x3 x2 (+act) -> BN -> MaxPool2x2], bottom block,
decoder of [Upsample2x2 -> Conv2x2 -> BN -> crop&concat skip -> Conv3x3 x2 ->
BN], 1x1 output conv with configurable activation, filters 64 * 2^i scaled by
int(N * sqrt(complexity_factor)), optional flattened output
[B, H*W, n_classes], and `label_crop` tracking when odd spatial dims force
crops. BatchNorm uses Keras defaults (momentum 0.99, eps 1e-3) for training
parity.

TPU-first specifics: NHWC layout (XLA TPU's native conv layout), optional
bfloat16 compute with float32 parameters/statistics, and channel counts that
stay multiples of 8/128 where possible so convs tile cleanly onto the MXU.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _act(name):
    if name is None or name == "linear":
        return lambda x: x
    return getattr(nn, name) if hasattr(nn, name) else getattr(jax.nn, name)


class ConvBNBlock(nn.Module):
    """Two same-padded convs with activation, then BatchNorm."""

    filters: int
    kernel_size: Sequence[int]
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        act = _act(self.activation)
        for i in range(2):
            x = nn.Conv(self.filters, self.kernel_size, padding="SAME",
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = act(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return x


def upsample2x(x):
    """Nearest 2x upsample as broadcast+reshape (identical to Keras
    `UpSampling2D` pixel repetition). `jax.image.resize(method="nearest")`
    computes the same values but lowers to a per-element gather on TPU —
    this form is pure data movement and measurably faster in the decoder."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


class SubpixelUpConv(nn.Module):
    """`upsample2x -> Conv(2,..)` computed as parity-specific sub-pixel convs.

    The reference decoder (`mpunet/models/unet.py:148-156`) nearest-upsamples
    2x and then applies a SAME-padded 2^n kernel conv. Because every 2x2(x2)
    window of the upsampled tensor only ever touches 1..2 distinct source
    pixels per axis, that conv is exactly equivalent to 2^n small convs on the
    ORIGINAL grid — one per output-pixel parity — whose kernels are axis-wise
    partial sums of the original kernel, interleaved back with a reshape
    (sub-pixel / depth-to-space convolution). Identical parameters (same
    param tree as `nn.Conv`, so checkpoints are interchangeable) and
    identical values up to float re-association, but:

      * MACs drop 16->9 per output pixel in 2D (64->27 in 3D) because the
        duplicated taps collapse into pre-summed kernels, and
      * the (2H, 2W[, 2D]) upsampled input is never materialized in HBM.

    SAME padding for an even kernel pads (0, 1) per axis — matched here by
    padding only the high edge of the 2-tap parity convs."""

    filters: int
    ndim: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = self.ndim
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (2,) * n + (cin, self.filters), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.filters,),
                          jnp.float32)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape,
            ("NHWC", "HWIO", "NHWC") if n == 2 else ("NDHWC", "DHWIO", "NDHWC"),
        )
        x = x.astype(self.dtype)
        parts = []
        # Parity p per axis: 0 -> both taps hit the same source pixel
        # (kernel axis pre-summed, extent 1), 1 -> taps straddle two source
        # pixels (extent 2, high edge zero-padded like SAME).
        for parity in np.ndindex(*(2,) * n):
            k = kernel
            for ax, p in enumerate(parity):
                if p == 0:
                    k = k.sum(axis=ax, keepdims=True)
            k = k.astype(self.dtype)
            pad = [(0, p) for p in parity]
            parts.append(jax.lax.conv_general_dilated(
                x, k, window_strides=(1,) * n, padding=pad,
                dimension_numbers=dn,
            ))
        # Interleave: out[..., 2i+p, ...] = parts[parity][..., i, ...].
        B = x.shape[0]
        sp = x.shape[1:-1]
        y = jnp.stack(parts, axis=-2)  # (B, *sp, 2^n, F)
        y = y.reshape((B,) + tuple(sp) + (2,) * n + (self.filters,))
        # (B, s0, s1, .., p0, p1, .., F) -> (B, s0, p0, s1, p1, .., F)
        perm = [0]
        for ax in range(n):
            perm += [1 + ax, 1 + n + ax]
        perm.append(1 + 2 * n)
        y = y.transpose(perm)
        y = y.reshape((B,) + tuple(2 * s for s in sp) + (self.filters,))
        return y + bias.astype(self.dtype)


def crop_to_match(skip, up):
    """Center-crop `skip`'s spatial dims down to `up`'s. Returns (cropped,
    crops) where crops is a (ndim_spatial, 2) array of (lo, hi) pixel crops."""
    s_shape = np.array(skip.shape[1:-1])
    u_shape = np.array(up.shape[1:-1])
    diff = s_shape - u_shape
    if np.all(diff == 0):
        return skip, np.zeros((len(s_shape), 2), np.int64)
    lo = diff // 2
    hi = diff - lo
    slices = (slice(None),) + tuple(
        slice(int(l), int(dim - h))
        for l, h, dim in zip(lo, hi, s_shape)
    ) + (slice(None),)
    crops = np.stack([lo, hi], axis=1)
    return skip[slices], crops


class UNet(nn.Module):
    """Configurable-depth 2D U-Net with complexity scaling."""

    n_classes: int
    dim: int | None = None
    img_rows: int | None = None
    img_cols: int | None = None
    n_channels: int = 1
    depth: int = 4
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
    # Sub-pixel up-convs are numerically identical with the SAME param tree
    # (VALIDATION 25) but measured ~3% SLOWER end-to-end on the v5e
    # (16.11 vs 15.66 vol/min same-window A/B) despite ~7% fewer forward
    # FLOPs — the parity pixel-shuffle's layout work outweighs the MAC
    # saving at these shapes, so the naive upsample+conv is the default.
    subpixel_decoder: bool = False

    @property
    def cf(self):
        return float(np.sqrt(self.complexity_factor))

    def _filters(self, base):
        return int(base * self.cf)

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = (self.kernel_size, self.kernel_size)
        if x.dtype != self.dtype:
            x = x.astype(self.dtype)

        # ------------------------------------------------------------ encode
        skips = []
        filters = self.init_filters
        for i in range(self.depth):
            block = ConvBNBlock(self._filters(filters), ks, self.activation,
                                self.dtype, name=f"encoder_L{i}")
            bn = block(x, train)
            skips.append(bn)
            x = nn.max_pool(bn, (2, 2), strides=(2, 2))
            filters *= 2

        # ------------------------------------------------------------ bottom
        x = ConvBNBlock(self._filters(filters), ks, self.activation,
                        self.dtype, name="bottom")(x, train)

        # ------------------------------------------------------------ decode
        label_crop = np.zeros((2, 2), np.int64)
        for i in range(self.depth):
            filters //= 2
            skip = skips[-(i + 1)]
            if self.subpixel_decoder:
                x = SubpixelUpConv(self._filters(filters), ndim=2,
                                   dtype=self.dtype,
                                   name=f"decoder_L{i}_conv_up")(x)
            else:
                x = upsample2x(x)
                x = nn.Conv(self._filters(filters), (2, 2), padding="SAME",
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

        # ------------------------------------------------------------ output
        x = nn.Conv(self.n_classes, (1, 1), dtype=jnp.float32,
                    name="out_conv")(x.astype(jnp.float32))
        out = _act(self.out_activation)(x)
        if self.flatten_output:
            out = out.reshape(out.shape[0], -1, self.n_classes)
        self.sow("intermediates", "label_crop", label_crop)
        return out

    # ------------------------------------------------------------- metadata
    @property
    def receptive_field(self):
        """Receptive field of the deepest encoder feature (conv arithmetic)."""
        from multiplanarunet_tpu.utils.conv_arithmetics import (
            unet_encoder_receptive_field,
        )
        return unet_encoder_receptive_field(self.depth, self.kernel_size)

    def count_params(self, params):
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def init_unet(model, rng, input_shape=None):
    """Initialize (params, batch_stats) for a UNet-family flax module."""
    if input_shape is None:
        d = model.dim or model.img_rows
        input_shape = (1, d, d, model.n_channels)
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32), train=False)
    return variables["params"], variables.get("batch_stats", {})
