"""Name-based resolution of optimizers, losses and metrics.

Parity surface: `mpunet/train/utils.py` (`init_optimizer` / `init_losses` /
`init_metrics` resolve strings from tf.keras then custom modules, plus the
`ensure_sparse` guard). Here optimizers resolve to optax transforms (with
Keras-style kwarg names translated), losses to the JAX loss classes and
metrics to JAX metric functions."""

from __future__ import annotations

import optax

from multiplanarunet_tpu.errors import NotSparseError
from multiplanarunet_tpu.evaluate.losses import LOSSES
from multiplanarunet_tpu.evaluate.metrics import METRICS

# Keras-style kwarg -> optax kwarg per optimizer family
_KW_MAP = {
    "lr": "learning_rate",
    "beta_1": "b1",
    "beta_2": "b2",
    "epsilon": "eps",
    "rho": "decay",
    "momentum": "momentum",
    "nesterov": "nesterov",
    "weight_decay": "weight_decay",
}

_OPTIMIZERS = {
    "Adam": optax.adam,
    "AdamW": optax.adamw,
    "Nadam": optax.nadam,
    "SGD": optax.sgd,
    "RMSprop": optax.rmsprop,
    "Adagrad": optax.adagrad,
    "Adamax": optax.adamax,
    "Lamb": optax.lamb,
    "Lion": optax.lion,
}


def ensure_sparse(loss_and_metric_names):
    """Raise NotSparseError unless every name uses sparse integer targets
    (the framework's target format; parity with `train/utils.py:18-26`)."""
    for name in loss_and_metric_names:
        if "sparse" not in name.lower():
            raise NotSparseError(
                f"'{name}' does not appear to be a sparse loss/metric. This "
                f"framework uses integer-class targets; use the Sparse* "
                f"variants."
            )


def init_optimizer(optimizer_name, logger=None, **kwargs):
    """Build an optax optimizer with hyperparameters injectable at run time
    (so ReduceLROnPlateau can change the LR without recompiling)."""
    if optimizer_name not in _OPTIMIZERS:
        raise ValueError(
            f"Unknown optimizer '{optimizer_name}'. "
            f"Available: {sorted(_OPTIMIZERS)}"
        )
    fn = _OPTIMIZERS[optimizer_name]
    import inspect

    accepted = set(inspect.signature(fn).parameters)
    translated = {}
    for k, v in kwargs.items():
        key = _KW_MAP.get(k, k)
        if key in accepted:
            translated[key] = v
        elif logger is not None:
            logger(f"[OBS] optimizer kwarg '{k}' not supported by optax "
                   f"{optimizer_name}; ignored")
    # Keras-named optimizers get Keras' epsilon default (1e-7) rather
    # than optax's (1e-8) unless the config specifies one: the reference
    # trains with tf.keras optimizers (`mpunet/train/utils.py`
    # init_optimizer), and epsilon sets Adam's small-gradient deadzone —
    # a real (if small) training-dynamics difference on same-stream runs.
    if (optimizer_name in ("Adam", "Nadam", "Adamax", "RMSprop")
            and "eps" in accepted and "eps" not in translated):
        translated["eps"] = 1e-7
    if logger:
        logger(f"Optimizer: optax.{fn.__name__}({translated})")
    return optax.inject_hyperparams(fn)(**translated)


def init_losses(loss_names, logger=None, **loss_kwargs):
    losses = []
    for name in _as_list(loss_names):
        if name not in LOSSES:
            raise ValueError(f"Unknown loss '{name}'. Available: "
                             f"{sorted(LOSSES)}")
        losses.append(LOSSES[name](**(loss_kwargs or {})))
        if logger:
            logger(f"Loss: {losses[-1]}")
    return losses


def init_metrics(metric_names, logger=None):
    metrics = {}
    for name in _as_list(metric_names):
        if name not in METRICS:
            raise ValueError(f"Unknown metric '{name}'. Available: "
                             f"{sorted(METRICS)}")
        metrics[name] = METRICS[name]
    return metrics


def _as_list(obj):
    if obj is None:
        return []
    return obj if isinstance(obj, (list, tuple)) else [obj]
