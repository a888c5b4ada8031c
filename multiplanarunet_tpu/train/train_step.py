"""Jitted train/eval steps over a device mesh.

One compiled XLA program per step: forward (bf16 optional) + loss + backward
+ optimizer update + in-graph metrics, with BatchNorm batch statistics
computed over the GLOBAL batch (sharded batches reduce across the mesh
automatically — the data-parallel equivalent of sync-BN, strictly stronger
than the reference's per-replica BN under MirroredStrategy).

The validation step returns per-class (true-positive, relevant, selected)
counts so the epoch-level Validation callback can compute exact precision /
recall / dice over the full validation set, matching the reference's
streaming confusion-count design (`mpunet/callbacks/validation.py:91-229`)
without its counting threads."""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @property
    def learning_rate(self):
        """Current injected learning rate (ReduceLROnPlateau target)."""
        return float(self.opt_state.hyperparams["learning_rate"])

    def with_learning_rate(self, lr):
        opt_state = self.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, dtype=opt_state.hyperparams["learning_rate"].dtype
        )
        return self.replace(opt_state=opt_state)


def create_train_state(variables, tx):
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )


def _reg_penalty(params, l1_reg, l2_reg):
    penalty = 0.0
    if not l1_reg and not l2_reg:
        return penalty
    leaves = [p for p in jax.tree_util.tree_leaves(params) if p.ndim > 1]
    if l2_reg:
        penalty += l2_reg * sum(jnp.sum(jnp.square(p)) for p in leaves)
    if l1_reg:
        penalty += l1_reg * sum(jnp.sum(jnp.abs(p)) for p in leaves)
    return penalty


def make_train_step(model, tx, loss_obj, metric_fns: Dict[str, Callable],
                    l1_reg=0.0, l2_reg=0.0, donate=True):
    """Build the jitted train step: (state, x, y, w) -> (state, logs)."""

    def step_fn(state: TrainState, x, y, w):
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats", "intermediates"],
            )
            loss = loss_obj(y, out, sample_weight=w)
            loss = loss + _reg_penalty(params, l1_reg, l2_reg)
            return loss, (out, mutated.get("batch_stats", state.batch_stats))

        (loss, (out, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        logs = {"loss": loss}
        for name, fn in metric_fns.items():
            logs[name] = fn(y, out)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
        )
        return new_state, logs

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def make_eval_step(model, loss_obj, metric_fns: Dict[str, Callable],
                   n_classes: int):
    """Build the jitted eval step returning loss, metrics and per-class
    confusion counts (tp, rel=|y==c|, sel=|pred==c|).

    `mask` (optional, (B,) 0/1) excludes batch elements from the confusion
    counts — used when the Validation callback pads a batch up to a multiple
    of the device count for mesh sharding."""

    def step_fn(params, batch_stats, x, y, w, mask=None):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        loss = loss_obj(y, out, sample_weight=w)
        logs = {"loss": loss}
        for name, fn in metric_fns.items():
            logs[name] = fn(y, out)
        yy = y
        if yy.shape[-1] == 1 and yy.ndim == out.ndim:
            yy = jnp.squeeze(yy, axis=-1)
        pred_cls = jnp.argmax(out, axis=-1)
        one_true = jax.nn.one_hot(yy.astype(jnp.int32), n_classes,
                                  dtype=jnp.float32)
        one_pred = jax.nn.one_hot(pred_cls, n_classes, dtype=jnp.float32)
        sp_axes = tuple(range(1, one_true.ndim - 1))
        tp = jnp.sum(one_true * one_pred, axis=sp_axes)  # (B, C)
        rel = jnp.sum(one_true, axis=sp_axes)
        sel = jnp.sum(one_pred, axis=sp_axes)
        if mask is not None:
            m = mask[:, None]
            tp, rel, sel = tp * m, rel * m, sel * m
        return logs, (tp.sum(0), rel.sum(0), sel.sum(0))

    return jax.jit(step_fn)


# ------------------------------------------------------------- multi-task
def make_multitask_train_step(model, tx, loss_obj,
                              metric_fns: Dict[str, Callable],
                              l1_reg=0.0, l2_reg=0.0, donate=True):
    """Train step over per-task batch tuples for MultiTaskUNet2D.

    `xs`/`ys`/`ws` are tuples with one entry per task (shapes may differ
    across tasks). One forward through the shared-encoder model per task
    input; total loss is the mean of per-task losses, so every step updates
    the shared encoder with gradients from ALL tasks (the reference never
    shipped a working version of this —
    `mpunet/preprocessing/data_preparation_funcs.py:237-240`)."""

    def step_fn(state: TrainState, xs, ys, ws):
        def loss_fn(params):
            outs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                xs, train=True, mutable=["batch_stats"],
            )
            losses = [loss_obj(y, out, sample_weight=w)
                      for y, out, w in zip(ys, outs, ws)]
            loss = sum(losses) / len(losses)
            loss = loss + _reg_penalty(params, l1_reg, l2_reg)
            return loss, (outs, losses,
                          mutated.get("batch_stats", state.batch_stats))

        (loss, (outs, losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        logs = {"loss": loss}
        for t, (y, out, task_loss) in enumerate(zip(ys, outs, losses)):
            logs[f"task_{t}/loss"] = task_loss
            for name, fn in metric_fns.items():
                logs[f"task_{t}/{name}"] = fn(y, out)
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt_state,
        )
        return new_state, logs

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def make_multitask_eval_step(model, loss_obj,
                             metric_fns: Dict[str, Callable],
                             n_classes_per_task):
    """Eval step over per-task batch tuples; returns per-task confusion
    counts as a tuple of (tp, rel, sel) triples."""
    n_classes_per_task = tuple(int(n) for n in n_classes_per_task)

    def step_fn(params, batch_stats, xs, ys, ws, masks=None):
        outs = model.apply(
            {"params": params, "batch_stats": batch_stats}, xs, train=False
        )
        losses = [loss_obj(y, out, sample_weight=w)
                  for y, out, w in zip(ys, outs, ws)]
        logs = {"loss": sum(losses) / len(losses)}
        counts = []
        for t, (y, out, nc) in enumerate(zip(ys, outs, n_classes_per_task)):
            logs[f"task_{t}/loss"] = losses[t]
            for name, fn in metric_fns.items():
                logs[f"task_{t}/{name}"] = fn(y, out)
            yy = y
            if yy.shape[-1] == 1 and yy.ndim == out.ndim:
                yy = jnp.squeeze(yy, axis=-1)
            pred_cls = jnp.argmax(out, axis=-1)
            one_true = jax.nn.one_hot(yy.astype(jnp.int32), nc,
                                      dtype=jnp.float32)
            one_pred = jax.nn.one_hot(pred_cls, nc, dtype=jnp.float32)
            sp_axes = tuple(range(1, one_true.ndim - 1))
            tp = jnp.sum(one_true * one_pred, axis=sp_axes)
            rel = jnp.sum(one_true, axis=sp_axes)
            sel = jnp.sum(one_pred, axis=sp_axes)
            if masks is not None:
                m = masks[t][:, None]
                tp, rel, sel = tp * m, rel * m, sel * m
            counts.append((tp.sum(0), rel.sum(0), sel.sum(0)))
        return logs, tuple(counts)

    return jax.jit(step_fn)


# precision_recall_dice lives in evaluate.metrics; re-exported for callers
from multiplanarunet_tpu.evaluate.metrics import precision_recall_dice  # noqa: E402,F401
