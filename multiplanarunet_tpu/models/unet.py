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


# Kernel-init parity with the reference: Keras Conv2D/Conv3D default to
# glorot_uniform (`/root/reference/mpunet/models/unet.py:120` uses layer
# defaults). flax's lecun_normal default measurably slows training on
# identical batch streams (trained-parity harness: fused Dice 0.62 vs
# 0.90 after the same 500 batches — VALIDATION 32), so every conv kernel
# here inits glorot_uniform. Bias stays zeros (both frameworks' default).
conv_kernel_init = nn.initializers.glorot_uniform()


class FusedBNAffine(nn.Module):
    """Inference-only BatchNorm with the affine precomputed per channel:
    ``a = scale * rsqrt(var + eps); b = bias - mean * a``, both cast to the
    compute dtype so the per-element work is a single mul-add in that dtype.

    The stock flax BatchNorm promotes the activation to float32 for the
    normalization — profiled on the v5e as a standalone `add_convert`
    fusion streaming the full activation through HBM once more per block
    (~543 MB/pass at 46x256^2x90). Restructuring to a compute-dtype affine
    lets XLA fuse it into the producing conv's epilogue. Identical variable
    tree to `nn.BatchNorm` (params scale/bias, batch_stats mean/var), so
    checkpoints are interchangeable; values match up to the compute-dtype
    rounding of (a, b)."""

    epsilon: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(c, jnp.float32)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(c, jnp.float32)).value
        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        return x * a.astype(x.dtype) + b.astype(x.dtype)


class ConvBNBlock(nn.Module):
    """Two same-padded convs with activation, then BatchNorm."""

    filters: int
    kernel_size: Sequence[int]
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32
    fused_bn: bool = False
    skip_bn: bool = False  # probe-only floor (NOT numerically equivalent)

    @nn.compact
    def __call__(self, x, train: bool):
        act = _act(self.activation)
        for i in range(2):
            x = nn.Conv(self.filters, self.kernel_size, padding="SAME",
                        kernel_init=conv_kernel_init,
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = act(x)
        if self.skip_bn and not train:
            return x
        if self.fused_bn and not train:
            return FusedBNAffine(epsilon=1e-3, dtype=self.dtype,
                                 name="bn")(x)
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
            "kernel", conv_kernel_init,
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


class DilatedUpConv(nn.Module):
    """``upsample2x -> Conv(2x2, SAME)`` computed as ONE input-dilated 3x3
    conv — an exact algebraic identity: nearest-up(x) = dilate2(x) (*)
    ones(2,2), so up-then-conv_k = dilate2(x) (*) (ones(2,2) *full* k),
    a 3x3 kernel whose taps are partial sums of k
    (K[m,n] = sum_{a,b} A[a,m] A[b,n] k[a,b] with A = [[1,1,0],[0,1,1]]).

    Same parameter tree as `nn.Conv` (kernel (2,2,cin,f) + bias), so
    checkpoints are interchangeable and values match up to float
    re-association. Never materializes the (2H, 2W) upsampled tensor
    (1.09 GB at 46x256^2x181 bf16 — profiled as a pure-bandwidth
    broadcast on the v5e) and averages 2.25 vs 4 MXU taps per output
    pixel."""

    filters: int
    ndim: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = self.ndim
        cin = x.shape[-1]
        kernel = self.param("kernel", conv_kernel_init,
                            (2,) * n + (cin, self.filters), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.filters,),
                          jnp.float32)
        A = jnp.asarray([[1.0, 1.0, 0.0], [0.0, 1.0, 1.0]], kernel.dtype)
        K = kernel
        for ax in range(n):  # expand each spatial axis 2 -> 3 through A
            K = jnp.moveaxis(jnp.tensordot(A, K, axes=(0, ax)), 0, ax)
        K = K.astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, K.shape,
            ("NHWC", "HWIO", "NHWC") if n == 2
            else ("NDHWC", "DHWIO", "NDHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), K, window_strides=(1,) * n,
            padding=((1, 2),) * n, lhs_dilation=(2,) * n,
            dimension_numbers=dn)
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
    # Inference-only graph restructurings (identical parameter tree, so a
    # trained checkpoint plugs straight in — the predictor enables them):
    #   predict_fused_bn: BatchNorm as a precomputed compute-dtype affine
    #     (see FusedBNAffine) instead of flax's f32 promotion pass.
    #   dilated_upconv: decoder upsample+Conv(2x2) as one input-dilated
    #     3x3 conv (see DilatedUpConv) — the 2x upsampled tensor is never
    #     materialized.
    #   predict_skip_bn: drop BN entirely — probe-only floor, NOT
    #     numerically equivalent.
    predict_fused_bn: bool = False
    dilated_upconv: bool = False
    predict_skip_bn: bool = False
    #   lane_pad: round every internal conv's filter count up to this
    #     multiple (e.g. 128 — the TPU lane width). Numerically exact when
    #     paired with `lane_pad_variables` (padded kernel rows/cols are
    #     zero, padded BN channels are identity on a zero activation), at
    #     the cost of extra MACs: trades the partial-tile waste of
    #     lane-hostile channel counts (90/181 at cf=2, VALIDATION 30's
    #     48-62%-of-peak decoder convs) for full tiles on more columns.
    #     The out conv keeps n_classes outputs.
    lane_pad: int = 0

    @property
    def cf(self):
        return float(np.sqrt(self.complexity_factor))

    def _filters(self, base):
        f = int(base * self.cf)
        if self.lane_pad:
            f = -(-f // self.lane_pad) * self.lane_pad
        return f

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
                                self.dtype, fused_bn=self.predict_fused_bn,
                                skip_bn=self.predict_skip_bn,
                                name=f"encoder_L{i}")
            bn = block(x, train)
            skips.append(bn)
            x = nn.max_pool(bn, (2, 2), strides=(2, 2))
            filters *= 2

        # ------------------------------------------------------------ bottom
        x = ConvBNBlock(self._filters(filters), ks, self.activation,
                        self.dtype, fused_bn=self.predict_fused_bn,
                        skip_bn=self.predict_skip_bn, name="bottom")(x, train)

        # ------------------------------------------------------------ decode
        label_crop = np.zeros((2, 2), np.int64)
        for i in range(self.depth):
            filters //= 2
            skip = skips[-(i + 1)]
            if self.subpixel_decoder:
                x = SubpixelUpConv(self._filters(filters), ndim=2,
                                   dtype=self.dtype,
                                   name=f"decoder_L{i}_conv_up")(x)
            elif self.dilated_upconv:
                x = DilatedUpConv(self._filters(filters), dtype=self.dtype,
                                  name=f"decoder_L{i}_conv_up")(x)
            else:
                x = upsample2x(x)
                x = nn.Conv(self._filters(filters), (2, 2), padding="SAME",
                            kernel_init=conv_kernel_init,
                            dtype=self.dtype, name=f"decoder_L{i}_conv_up")(x)
            x = _act(self.activation)(x)
            if self.predict_skip_bn and not train:
                pass
            elif self.predict_fused_bn and not train:
                x = FusedBNAffine(epsilon=1e-3, dtype=self.dtype,
                                  name=f"decoder_L{i}_bn_up")(x)
            else:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.99, epsilon=1e-3,
                                 dtype=self.dtype,
                                 name=f"decoder_L{i}_bn_up")(x)
            skip, crops = crop_to_match(skip, x)
            label_crop += crops
            x = jnp.concatenate([skip, x], axis=-1)
            x = ConvBNBlock(self._filters(filters), ks, self.activation,
                            self.dtype, fused_bn=self.predict_fused_bn,
                            skip_bn=self.predict_skip_bn,
                            name=f"decoder_L{i}")(x, train)

        # ------------------------------------------------------------ output
        x = nn.Conv(self.n_classes, (1, 1), dtype=jnp.float32,
                    kernel_init=conv_kernel_init,
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


def lane_pad_variables(model, variables, lane_pad):
    """Zero-pad a trained variable tree onto `model.copy(lane_pad=M)`'s
    shapes — numerically EXACT: padded kernel rows/columns are zero (a
    zero output channel stays zero through bias 0), padded BatchNorm
    channels are identity on that zero activation (scale 1, bias 0,
    mean 0, var 1), and the out conv's padded input rows are zero so the
    logits are bit-equal in f32. The one layout subtlety is the decoder
    concat: level i concatenates [skip (padded f->P(f)), up (padded
    f->P(f))], so `decoder_Li/conv1`'s real input rows live at
    [0, f) and [P(f), P(f)+f), not contiguously."""
    import flax

    padded = model.copy(lane_pad=lane_pad)
    d = model.dim or model.img_rows
    shapes = jax.eval_shape(
        lambda: padded.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, d, d, model.n_channels), jnp.float32),
            train=False))
    P = lambda c: -(-c // lane_pad) * lane_pad  # noqa: E731
    dec_f = {f"decoder_L{i}":
             int(model.init_filters * 2 ** (model.depth - 1 - i) * model.cf)
             for i in range(model.depth)}
    flat_src = flax.traverse_util.flatten_dict(flax.core.unfreeze(variables))
    flat_dst = flax.traverse_util.flatten_dict(flax.core.unfreeze(shapes))
    out = {}
    for path, sd in flat_dst.items():
        src = np.asarray(flat_src[path])
        if src.shape == tuple(sd.shape):
            out[path] = src
            continue
        fill = 1.0 if path[-1] in ("scale", "var") else 0.0
        tgt = np.full(sd.shape, fill, src.dtype)
        if path[-1] == "kernel" and src.ndim >= 2:
            if (len(path) >= 3 and path[-3].startswith("decoder_L")
                    and path[-2] == "conv1"):
                f = dec_f[path[-3]]
                assert src.shape[-2] == 2 * f, (path, src.shape, f)
                tgt[..., 0:f, 0:src.shape[-1]] = src[..., 0:f, :]
                tgt[..., P(f):P(f) + f, 0:src.shape[-1]] = src[..., f:, :]
            else:
                tgt[..., 0:src.shape[-2], 0:src.shape[-1]] = src
        else:  # 1-D per-channel param (bias / scale / mean / var)
            tgt[:src.shape[0]] = src
        out[path] = tgt
    tree = flax.traverse_util.unflatten_dict(out)
    return {k: tree[k] for k in tree}


def init_unet(model, rng, input_shape=None):
    """Initialize (params, batch_stats) for a UNet-family flax module."""
    if input_shape is None:
        d = model.dim or model.img_rows
        input_shape = (1, d, d, model.n_channels)
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32), train=False)
    return variables["params"], variables.get("batch_stats", {})
