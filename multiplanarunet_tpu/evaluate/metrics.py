"""Evaluation metrics: numpy (offline eval) + JAX (in-graph train metrics).

Parity surface: `mpunet/evaluate/metrics.py` — numpy `dice`/`dice_all`/
`class_wise_kappa` for result CSVs, and sparse foreground recall/precision/
F1 metrics used during (fusion) training. The JAX variants are static-shape,
mask-based confusion-matrix computations that compile into the train step —
no boolean_mask-style dynamic shapes."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- numpy (eval)
def dice(y_true, y_pred, smooth=1.0):
    """Soerensen dice between two binary masks."""
    s1 = np.asarray(y_true).ravel().astype(bool)
    s2 = np.asarray(y_pred).ravel().astype(bool)
    return (smooth + 2.0 * np.logical_and(s1, s2).sum()) / (
        smooth + s1.sum() + s2.sum()
    )


def dice_all(y_true, y_pred, smooth=1.0, n_classes=None, ignore_zero=True,
             skip_if_no_y=False):
    """Per-class dice; NaN for classes absent from both masks."""
    if n_classes is None:
        classes = np.unique(y_true)
    else:
        classes = np.arange(max(2, n_classes))
    if ignore_zero:
        classes = classes[classes != 0]
    out = np.full(classes.shape, np.nan, np.float32)
    for i, c in enumerate(classes):
        s1 = np.asarray(y_true) == c
        if skip_if_no_y and not s1.any():
            continue
        s2 = np.asarray(y_pred) == c
        if s1.any() or s2.any():
            out[i] = dice(s1, s2, smooth=smooth)
    return out


def dice_from_counts(counts, smooth=1.0, ignore_zero=True):
    """Per-class dice from a (3, C) confusion-count matrix (tp, rel=|y==c|,
    sel=|pred==c|) — identical formula and NaN semantics to `dice_all` on
    the full masks (classes absent from BOTH masks -> NaN), but computable
    from device-side counts without fetching any class map."""
    tp, rel, sel = np.asarray(counts, np.float64)
    out = np.full(tp.shape, np.nan, np.float32)
    present = (rel + sel) > 0
    out[present] = (smooth + 2.0 * tp[present]) / (
        smooth + rel[present] + sel[present]
    )
    if ignore_zero:
        out = out[1:]
    return out


def class_wise_kappa(true, pred, n_classes=None, ignore_zero=True):
    from sklearn.metrics import cohen_kappa_score

    if n_classes is None:
        classes = np.unique(true)
    else:
        classes = np.arange(max(2, n_classes))
    if ignore_zero:
        classes = classes[classes != 0]
    out = np.full(classes.shape, np.nan, np.float32)
    t = np.asarray(true).ravel()
    p = np.asarray(pred).ravel()
    for i, c in enumerate(classes):
        s1 = t == c
        s2 = p == c
        if s1.any() or s2.any():
            out[i] = cohen_kappa_score(s1, s2)
    return out


def pred_to_class(pred, img_dims=None, threshold=0.5, has_batch_dim=False):
    """Probability map -> integer class map (argmax; threshold if binary)."""
    pred = np.asarray(pred)
    if pred.shape[-1] == 1:
        return (pred[..., 0] >= threshold).astype(np.uint8)
    return np.argmax(pred, axis=-1).astype(np.uint8)


def one_class_dice(y_true, y_pred, smooth=1.0, threshold=0.5):
    """Binary (single-output) dice on thresholded predictions (jax)."""
    pred = (y_pred > threshold).astype(jnp.float32)
    y_true = y_true.astype(jnp.float32)
    return (smooth + 2.0 * jnp.sum(y_true * pred)) / (
        smooth + jnp.sum(y_true) + jnp.sum(pred)
    )


# ---------------------------------------------------------------- jax (train)
def confusion_matrix(y_true, y_pred_cls, n_classes):
    """Static-shape confusion matrix via one-hot outer accumulation."""
    t = jax.nn.one_hot(y_true.reshape(-1), n_classes, dtype=jnp.float32)
    p = jax.nn.one_hot(y_pred_cls.reshape(-1), n_classes, dtype=jnp.float32)
    return t.T @ p  # rows: true, cols: predicted


def sparse_categorical_accuracy(y_true, y_pred):
    if y_true.shape[-1] == 1 and y_true.ndim == y_pred.ndim:
        y_true = jnp.squeeze(y_true, axis=-1)
    pred_cls = jnp.argmax(y_pred, axis=-1)
    return jnp.mean((pred_cls == y_true.astype(pred_cls.dtype)).astype(jnp.float32))


def sparse_fg_recall(y_true, y_pred, bg_class=0):
    """Fraction of true-foreground pixels predicted with the correct class."""
    if y_true.shape[-1] == 1 and y_true.ndim == y_pred.ndim:
        y_true = jnp.squeeze(y_true, axis=-1)
    pred_cls = jnp.argmax(y_pred, axis=-1)
    y_true = y_true.astype(pred_cls.dtype)
    fg = (y_true != bg_class).astype(jnp.float32)
    correct = (pred_cls == y_true).astype(jnp.float32)
    return jnp.sum(correct * fg) / jnp.maximum(jnp.sum(fg), 1.0)


def sparse_fg_precision(y_true, y_pred, bg_class=0):
    """Fraction of predicted-foreground pixels whose class is correct."""
    if y_true.shape[-1] == 1 and y_true.ndim == y_pred.ndim:
        y_true = jnp.squeeze(y_true, axis=-1)
    pred_cls = jnp.argmax(y_pred, axis=-1)
    y_true = y_true.astype(pred_cls.dtype)
    fg = (pred_cls != bg_class).astype(jnp.float32)
    correct = (pred_cls == y_true).astype(jnp.float32)
    return jnp.sum(correct * fg) / jnp.maximum(jnp.sum(fg), 1.0)


def _cm_precisions_recalls(y_true, y_pred):
    n_classes = y_pred.shape[-1]
    if y_true.shape[-1] == 1 and y_true.ndim == y_pred.ndim:
        y_true = jnp.squeeze(y_true, axis=-1)
    pred_cls = jnp.argmax(y_pred, axis=-1)
    cm = confusion_matrix(y_true, pred_cls, n_classes)
    tp = jnp.diag(cm)
    precisions = tp / jnp.maximum(jnp.sum(cm, axis=0), 1e-8)
    recalls = tp / jnp.maximum(jnp.sum(cm, axis=1), 1e-8)
    return precisions, recalls


def sparse_mean_fg_precision(y_true, y_pred):
    precisions, _ = _cm_precisions_recalls(y_true, y_pred)
    return jnp.mean(precisions[1:])


def sparse_mean_fg_recall(y_true, y_pred):
    _, recalls = _cm_precisions_recalls(y_true, y_pred)
    return jnp.mean(recalls[1:])


def sparse_mean_fg_f1(y_true, y_pred):
    precisions, recalls = _cm_precisions_recalls(y_true, y_pred)
    f1 = (2.0 * precisions * recalls) / jnp.maximum(precisions + recalls, 1e-8)
    return jnp.mean(f1[1:])


METRICS = {
    "one_class_dice": one_class_dice,
    "sparse_categorical_accuracy": sparse_categorical_accuracy,
    "sparse_fg_recall": sparse_fg_recall,
    "sparse_fg_precision": sparse_fg_precision,
    "sparse_mean_fg_precision": sparse_mean_fg_precision,
    "sparse_mean_fg_recall": sparse_mean_fg_recall,
    "sparse_mean_fg_f1": sparse_mean_fg_f1,
}


def precision_recall_dice(tp, rel, sel, ignore_bg=True):
    """Epoch-level per-class precision/recall/dice from confusion counts
    (the reference's epoch metrics, `callbacks/validation.py:59-89`)."""
    import numpy as np

    tp = np.asarray(tp, np.float64)
    rel = np.asarray(rel, np.float64)
    sel = np.asarray(sel, np.float64)
    precision = np.where(sel > 0, tp / np.maximum(sel, 1), 0.0)
    recall = np.where(rel > 0, tp / np.maximum(rel, 1), 0.0)
    dice = np.where(rel + sel > 0, 2 * tp / np.maximum(rel + sel, 1), 0.0)
    if ignore_bg:
        precision, recall, dice = precision[1:], recall[1:], dice[1:]
        rel = rel[1:]
    # Mean over classes present in the data (parity with the reference's
    # masking of absent classes)
    mask = rel > 0
    if mask.any():
        means = (precision[mask].mean(), recall[mask].mean(),
                 dice[mask].mean())
    else:
        means = (0.0, 0.0, 0.0)
    return (precision, recall, dice), means
