"""Batch augmenters (config surface parity: `mpunet/augmentation/augmenters.py`).

`Elastic2D` / `Elastic3D` accept the same YAML config (alpha/sigma scalars or
[lo, hi] ranges sampled per call, apply_prob, aug_weight replacing the sample
weight of augmented elements) but execute the deformation on device in one
fused batch kernel (see `multiplanarunet_tpu.ops.elastic`)."""

from __future__ import annotations

import jax
import numpy as np

from multiplanarunet_tpu.ops.elastic import (
    elastic_deform_2d_batch,
    elastic_deform_3d_batch,
)


def _validate_range(value, name):
    if isinstance(value, (list, tuple)):
        if len(value) != 2:
            raise ValueError(f"{name} range must have 2 numbers, got {value}")
        if value[1] <= value[0]:
            raise ValueError(f"{name} upper bound <= lower bound: {value}")
    return value


class Augmenter:
    """Base: callable on (batch_x, batch_y, batch_w, bg_values)."""

    def __call__(self, batch_x, batch_y, batch_w=None, bg_values=None):
        raise NotImplementedError


class Elastic(Augmenter):
    """Random elastic deformation of every batch element (on device)."""

    deform_fn = None  # set by subclasses
    __name__ = "Elastic"

    def __init__(self, alpha, sigma, apply_prob, aug_weight=0.33, seed=None):
        self._alpha = _validate_range(alpha, "alpha")
        self._sigma = _validate_range(sigma, "sigma")
        if not 0 <= apply_prob <= 1:
            raise ValueError(f"apply_prob must be in [0, 1], got {apply_prob}")
        self.apply_prob = apply_prob
        self.weight = aug_weight
        self._rng = np.random.RandomState(seed)
        self._key = jax.random.PRNGKey(
            seed if seed is not None else self._rng.randint(2 ** 31)
        )
        self._count = 0

    def _draw(self, value, n):
        if isinstance(value, (list, tuple)):
            return self._rng.uniform(value[0], value[1], size=n)
        return np.full(n, float(value))

    def _next_count(self):
        """Per-batch key counter: batch key = fold_in(base_key, count) —
        derivable IN-GRAPH from (base_key, count), so the packed sampler
        path pays no eager per-batch split/fold RPC on remote transports."""
        self._count += 1
        return self._count

    def _next_key(self):
        return jax.random.fold_in(self._key, self._next_count())

    @property
    def base_key(self):
        """The fixed base PRNG key; pair with `draw_batch_params_host`'s
        count via jax.random.fold_in (eagerly or in-graph) to reproduce
        `draw_batch_params`' key stream exactly."""
        return self._key

    def draw_batch_params(self, batch_size):
        """Draw one batch's host-side randomness: (key, alphas, sigmas,
        apply_mask). Same draw order as `__call__`, so a sequence using the
        fused finish kernel consumes the augmenter RNG identically."""
        apply_mask = self._rng.rand(batch_size) <= self.apply_prob
        alphas = self._draw(self._alpha, batch_size)
        sigmas = self._draw(self._sigma, batch_size)
        return self._next_key(), alphas, sigmas, apply_mask

    def draw_batch_params_host(self, batch_size):
        """`draw_batch_params` without the eager key derivation: returns
        (count, alphas, sigmas, apply_mask); the consumer derives
        fold_in(self.base_key, count) in-graph (same stream, zero host
        device ops)."""
        apply_mask = self._rng.rand(batch_size) <= self.apply_prob
        alphas = self._draw(self._alpha, batch_size)
        sigmas = self._draw(self._sigma, batch_size)
        return self._next_count(), alphas, sigmas, apply_mask

    def __call__(self, batch_x, batch_y, batch_w=None, bg_values=None):
        """Deform (B, ...) image/label arrays; returns jnp arrays.

        bg_values: per-sample per-channel fill values, shape (B, C) (or
        anything broadcastable)."""
        import jax.numpy as jnp

        batch_x = jnp.asarray(batch_x)
        B = batch_x.shape[0]
        C = batch_x.shape[-1]
        lab = (jnp.zeros(batch_x.shape[:-1], jnp.float32)
               if batch_y is None else jnp.asarray(batch_y).astype(jnp.float32))
        if lab.shape[-1] == 1 and lab.ndim == batch_x.ndim:
            lab = lab[..., 0]

        key, alphas, sigmas, apply_mask = self.draw_batch_params(B)
        if bg_values is None:
            bg = jnp.zeros((B, C), jnp.float32)
        else:
            bg = jnp.broadcast_to(
                jnp.asarray(bg_values, jnp.float32).reshape(B, -1), (B, C)
            )

        x_out, y_out = type(self).deform_fn(
            key, batch_x, lab, jnp.asarray(alphas),
            jnp.asarray(sigmas), jnp.asarray(apply_mask), bg,
        )
        if batch_w is not None:
            batch_w = np.asarray(batch_w, np.float32).copy()
            batch_w[apply_mask] = self.weight
        if batch_y is None:
            y_out = None
        return x_out, y_out, batch_w

    def __str__(self):
        return (f"{self.__name__}(alpha={self._alpha}, sigma={self._sigma}, "
                f"apply_prob={self.apply_prob:.3f})")

    __repr__ = __str__


class Elastic2D(Elastic):
    """Elastic deformation of 2D slice batches (B, d, d, C)."""

    deform_fn = staticmethod(elastic_deform_2d_batch)
    __name__ = "Elastic2D"


class Elastic3D(Elastic):
    """Elastic deformation of 3D box batches (B, d, d, d, C)."""

    deform_fn = staticmethod(elastic_deform_3d_batch)
    __name__ = "Elastic3D"


AUGMENTERS = {"Elastic2D": Elastic2D, "Elastic3D": Elastic3D}


def build_augmenters(config_list, seed=None):
    """Instantiate augmenters from the YAML 'augmenters' list of
    {cls_name, kwargs} dicts."""
    out = []
    for i, spec in enumerate(config_list or []):
        cls = AUGMENTERS[spec["cls_name"]]
        kwargs = dict(spec.get("kwargs", {}))
        if seed is not None:
            kwargs.setdefault("seed", seed + i)
        out.append(cls(**kwargs))
    return out
