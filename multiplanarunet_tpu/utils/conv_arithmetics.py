"""Receptive-field arithmetic for the U-Net encoder.

The reference computes receptive fields by walking Keras layer objects
(`mpunet/utils/conv_arithmetics.py`); here the network topology is known
statically, so the closed-form recurrence suffices:

    r_{l+1} = r_l + (k_l - 1) * j_l,   j_{l+1} = j_l * s_l
"""

from __future__ import annotations


def receptive_field(layers):
    """Receptive field after a sequence of (kernel_size, stride) layers."""
    r, j = 1, 1
    for k, s in layers:
        r += (k - 1) * j
        j *= s
    return r, j


def unet_encoder_receptive_field(depth, kernel_size=3, pool=2):
    """Receptive field at the deepest encoder feature of a standard U-Net
    encoder: per level [conv k, conv k, pool 2] repeated `depth` times."""
    layers = []
    for _ in range(depth):
        layers += [(kernel_size, 1), (kernel_size, 1), (pool, pool)]
    return receptive_field(layers)[0]
