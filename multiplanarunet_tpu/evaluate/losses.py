"""Segmentation losses (JAX), sparse integer targets.

Functional rebuild of the reference's loss family
(`mpunet/evaluate/loss_functions.py`): all losses take integer class targets
(`y_true` of shape [B, ...spatial..., 1] or [B, N, 1]) and class probabilities
(`y_pred` [..., n_classes]); one-hot conversion is shared; per-class
statistics reduce over the spatial axes of each batch element and the mean
over classes gives a per-element loss. Loss classes expose
``__call__(y_true, y_pred, sample_weight=None)`` applying the configured
reduction, so the Trainer can resolve them by name exactly like the
reference resolves Keras losses (`mpunet/train/utils.py:29-60`).

Everything is pure jnp -> usable inside jit/pjit train steps, fully fusable
by XLA, and differentiable."""

from __future__ import annotations


import jax
import jax.numpy as jnp

_EPS = 1e-8


def _one_hot_and_shapes(y_true, y_pred):
    """Squeeze a trailing singleton off y_true, one-hot to y_pred's classes.

    Returns (one_hot [like y_pred], reduction_axes over spatial dims)."""
    n_classes = y_pred.shape[-1]
    if y_true.shape[-1] == 1 and y_true.ndim == y_pred.ndim:
        y_true = jnp.squeeze(y_true, axis=-1)
    one_hot = jax.nn.one_hot(y_true.astype(jnp.int32), n_classes,
                             dtype=y_pred.dtype)
    reduction_axes = tuple(range(1, y_pred.ndim - 1))
    return one_hot, reduction_axes


def _clip(y_pred):
    return jnp.clip(y_pred, _EPS, 1.0 - _EPS)


# ------------------------------------------------------------ per-elem losses
def sparse_categorical_crossentropy(y_true, y_pred):
    one_hot, axes = _one_hot_and_shapes(y_true, y_pred)
    ce = -jnp.sum(one_hot * jnp.log(_clip(y_pred)), axis=-1)
    return jnp.mean(ce, axis=axes)


def sparse_dice_loss(y_true, y_pred, smooth=1.0):
    one_hot, axes = _one_hot_and_shapes(y_true, y_pred)
    intersection = jnp.sum(one_hot * y_pred, axis=axes)
    union = jnp.sum(one_hot + y_pred, axis=axes)
    dice = (2.0 * intersection + smooth) / (union + smooth)
    return 1.0 - jnp.mean(dice, axis=-1)


def sparse_jaccard_distance_loss(y_true, y_pred, smooth=1.0):
    one_hot, axes = _one_hot_and_shapes(y_true, y_pred)
    intersection = jnp.sum(one_hot * y_pred, axis=axes)
    total = jnp.sum(one_hot + y_pred, axis=axes)
    jac = (intersection + smooth) / (total - intersection + smooth)
    return 1.0 - jnp.mean(jac, axis=-1)


def sparse_exponential_logarithmic_loss(y_true, y_pred, gamma_dice=0.3,
                                        gamma_cross=0.3, weight_dice=1.0,
                                        weight_cross=1.0):
    """Wong et al. exp-log dice + weighted exp cross-entropy."""
    one_hot, axes = _one_hot_and_shapes(y_true, y_pred)
    y_pred = _clip(y_pred)
    intersect = 2.0 * jnp.sum(one_hot * y_pred, axis=axes) + 1.0
    union = jnp.sum(one_hot + y_pred, axis=axes) + 1.0
    exp_log_dice = jnp.power(-jnp.log(intersect / union), gamma_dice)
    mean_exp_log_dice = jnp.mean(exp_log_dice, axis=-1)
    entropy = jnp.sum(one_hot * -jnp.log(y_pred), axis=-1)
    exp_entropy = jnp.mean(jnp.power(entropy, gamma_cross), axis=axes)
    return weight_dice * mean_exp_log_dice + weight_cross * exp_entropy


def sparse_focal_loss(y_true, y_pred, gamma=2.0, class_weights=None):
    one_hot, axes = _one_hot_and_shapes(y_true, y_pred)
    y_pred = _clip(y_pred)
    if class_weights is None:
        class_weights = jnp.ones(y_pred.shape[-1], y_pred.dtype)
    else:
        class_weights = jnp.asarray(class_weights, y_pred.dtype)
    modulator = jnp.power(1.0 - y_pred, gamma)
    loss = -jnp.sum(class_weights * one_hot * modulator * jnp.log(y_pred),
                    axis=-1)
    return jnp.mean(loss, axis=axes)


def sparse_generalized_dice_loss(y_true, y_pred, type_weight="Square"):
    """Sudre et al. generalized dice; weight types square/simple/uniform."""
    one_hot, axes = _one_hot_and_shapes(y_true, y_pred)
    ref_vol = jnp.sum(one_hot, axis=axes)
    intersect = jnp.sum(one_hot * y_pred, axis=axes)
    seg_vol = jnp.sum(y_pred, axis=axes)

    tw = type_weight.lower()
    if tw == "square":
        weights = 1.0 / jnp.square(ref_vol)
    elif tw == "simple":
        weights = 1.0 / ref_vol
    elif tw == "uniform":
        weights = jnp.ones_like(ref_vol)
    else:
        raise ValueError(f"Unknown type_weight '{type_weight}'")

    # Replace inf weights (absent classes) with the max finite weight
    finite = jnp.where(jnp.isinf(weights), jnp.zeros_like(weights), weights)
    weights = jnp.where(jnp.isinf(weights),
                        jnp.max(finite) * jnp.ones_like(weights), weights)

    numerator = 2.0 * weights * intersect
    denom = weights * (seg_vol + ref_vol) + 1e-6
    gds = numerator / denom
    return 1.0 - jnp.mean(gds, axis=-1)


# ----------------------------------------------------------------- reduction
class _LossWrapper:
    """Applies sample weights + reduction around a per-element loss fn."""

    base_fn = None  # staticmethod in subclasses
    name = "loss"

    def __init__(self, reduction="sum_over_batch_size", **kwargs):
        self.reduction = reduction
        self.kwargs = {k: v for k, v in kwargs.items() if k != "name"}

    def element_loss(self, y_true, y_pred):
        return type(self).base_fn(y_true, y_pred, **self.kwargs)

    def __call__(self, y_true, y_pred, sample_weight=None):
        per_elem = self.element_loss(y_true, y_pred)
        if sample_weight is not None:
            per_elem = per_elem * sample_weight
        if self.reduction in (None, "none"):
            return per_elem
        return jnp.mean(per_elem)

    def __repr__(self):
        return f"{type(self).__name__}(reduction={self.reduction}, {self.kwargs})"


class SparseCategoricalCrossentropy(_LossWrapper):
    base_fn = staticmethod(sparse_categorical_crossentropy)


class SparseDiceLoss(_LossWrapper):
    base_fn = staticmethod(sparse_dice_loss)


class SparseJaccardDistanceLoss(_LossWrapper):
    base_fn = staticmethod(sparse_jaccard_distance_loss)


class SparseExponentialLogarithmicLoss(_LossWrapper):
    base_fn = staticmethod(sparse_exponential_logarithmic_loss)


class SparseFocalLoss(_LossWrapper):
    base_fn = staticmethod(sparse_focal_loss)


class SparseGeneralizedDiceLoss(_LossWrapper):
    base_fn = staticmethod(sparse_generalized_dice_loss)


# Aliases matching the reference export surface
SparseExpLogDice = SparseExponentialLogarithmicLoss

LOSSES = {
    cls.__name__: cls
    for cls in (
        SparseCategoricalCrossentropy,
        SparseDiceLoss,
        SparseJaccardDistanceLoss,
        SparseExponentialLogarithmicLoss,
        SparseFocalLoss,
        SparseGeneralizedDiceLoss,
    )
}
LOSSES["SparseExpLogDice"] = SparseExpLogDice
