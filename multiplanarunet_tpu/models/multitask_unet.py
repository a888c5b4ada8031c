"""Multi-task 2D U-Net: shared encoder, per-task decoders/classifiers.

Parity target: `mpunet/models/multitask_unet2d.py` — the same encoder
*parameters* process every task's input branch, while bottom, decoder and 1x1
classifier are task-specific. Tasks may differ in input channels, sample dim
and class count. In flax this is expressed naturally: one encoder submodule
applied to each task input (parameter sharing by construction), plus
per-task decoder submodules."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multiplanarunet_tpu.models.unet import (
    ConvBNBlock, SubpixelUpConv, _act, crop_to_match, conv_kernel_init,
)


class _SharedEncoder(nn.Module):
    depth: int
    cf: float
    kernel_size: int
    activation: str
    dtype: jnp.dtype = jnp.float32
    init_filters: int = 64

    @nn.compact
    def __call__(self, x, train: bool):
        ks = (self.kernel_size, self.kernel_size)
        skips = []
        filters = self.init_filters
        for i in range(self.depth):
            bn = ConvBNBlock(int(filters * self.cf), ks, self.activation,
                             self.dtype, name=f"encoder_L{i}")(x, train)
            skips.append(bn)
            x = nn.max_pool(bn, (2, 2), strides=(2, 2))
            filters *= 2
        return x, skips, filters


class _TaskDecoder(nn.Module):
    n_classes: int
    depth: int
    cf: float
    kernel_size: int
    activation: str
    out_activation: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, filters, train: bool):
        ks = (self.kernel_size, self.kernel_size)
        x = ConvBNBlock(int(filters * self.cf), ks, self.activation,
                        self.dtype, name="bottom")(x, train)
        for i in range(self.depth):
            filters //= 2
            skip = skips[-(i + 1)]
            x = SubpixelUpConv(int(filters * self.cf), ndim=2,
                               dtype=self.dtype,
                               name=f"decoder_L{i}_conv_up")(x)
            x = _act(self.activation)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             name=f"decoder_L{i}_bn_up")(x)
            skip, _ = crop_to_match(skip, x)
            x = jnp.concatenate([skip, x], axis=-1)
            x = ConvBNBlock(int(filters * self.cf), ks, self.activation,
                            self.dtype, name=f"decoder_L{i}")(x, train)
        x = nn.Conv(self.n_classes, (1, 1), dtype=jnp.float32,
                    kernel_init=conv_kernel_init,
                    name="out_conv")(x.astype(jnp.float32))
        return _act(self.out_activation)(x)


class MultiTaskUNet2D(nn.Module):
    """N tasks, one shared encoder. `__call__` maps task inputs -> outputs."""

    task_names: Sequence[str]
    n_classes: Sequence[int]
    n_channels: Sequence[int]
    dim: Sequence[int]
    depth: int = 4
    complexity_factor: float = 1.0
    activation: str = "relu"
    out_activation: str = "softmax"
    kernel_size: int = 3
    flatten_output: bool = False
    init_filters: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Tuple, train: bool = False):
        if len(inputs) != self.n_tasks:
            raise ValueError(
                f"Expected {self.n_tasks} task inputs, got {len(inputs)}"
            )
        if len(set(self.n_channels)) != 1:
            # The shared first conv fixes the input channel count, exactly as
            # the reference's shared Keras layer objects do
            raise ValueError(
                "All tasks must share the same n_channels to share an "
                f"encoder; got {tuple(self.n_channels)}"
            )
        cf = float(np.sqrt(self.complexity_factor))
        encoder = _SharedEncoder(self.depth, cf, self.kernel_size,
                                 self.activation, self.dtype,
                                 self.init_filters, name="encoder")
        outputs = []
        for t, (name, x) in enumerate(zip(self.task_names, inputs)):
            feats, skips, filters = encoder(x, train)
            out = _TaskDecoder(
                self.n_classes[t], self.depth, cf, self.kernel_size,
                self.activation, self.out_activation, self.dtype,
                name=f"task_{name}",
            )(feats, skips, filters, train)
            if self.flatten_output:
                out = out.reshape(out.shape[0], -1, self.n_classes[t])
            outputs.append(out)
        return outputs

    @property
    def n_tasks(self):
        return len(self.task_names)

    def count_params(self, params):
        return sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
