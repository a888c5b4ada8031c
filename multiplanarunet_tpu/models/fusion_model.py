"""FusionModel: learned per-class-per-view linear fusion.

The multi-planar method's final stage (parity: `mpunet/models/fusion_model.py`):
for each voxel, given the stack of per-view class probabilities
x in R^(n_views, n_classes), predict softmax(sum_v W[v] * x[v] + b), with
W initialized to 1 and b to 0 plus a tiny mean-square regularizer on both.

Trained with Sparse Generalized Dice Loss over huge voxel batches (2^17 in
the reference, `bin/train_fusion.py:54-65`) — trivially TPU-friendly since
the whole model is one elementwise-multiply + reduce."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class FusionLayer(nn.Module):
    n_inputs: int
    n_classes: int

    @nn.compact
    def __call__(self, x):
        # x: (..., n_views, n_classes)
        W = self.param("W", nn.initializers.constant(1.0),
                       (self.n_inputs, self.n_classes))
        b = self.param("b", nn.initializers.constant(0.0),
                       (1, self.n_classes))
        logits = jnp.sum(W * x, axis=-2) + b[0]
        return jax.nn.softmax(logits, axis=-1)

    @staticmethod
    def regularizer(params, weight=1e-6):
        """Mean-square penalty on W and b (matches the reference's reg)."""
        total = 0.0
        for p in jax.tree_util.tree_leaves(params):
            total = total + weight * jnp.mean(jnp.square(p))
        return total


class FusionModel(nn.Module):
    """Thin module wrapper so the fusion layer follows the model API."""

    n_inputs: int
    n_classes: int

    @nn.compact
    def __call__(self, x):
        return FusionLayer(self.n_inputs, self.n_classes, name="fusion")(x)

    def init_params(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        x = jnp.zeros((1, self.n_inputs, self.n_classes))
        return self.init(rng, x)["params"]

    def count_params(self, params):
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def fuse_probabilities(params, view_probs):
    """Apply fusion weights to a (..., n_views, n_classes) stack.

    Functional form used inside the fused per-volume predict graph — no module
    application overhead in the hot path."""
    W = params["fusion"]["W"]
    b = params["fusion"]["b"]
    logits = jnp.sum(W * view_probs, axis=-2) + b[0]
    return jax.nn.softmax(logits, axis=-1)
