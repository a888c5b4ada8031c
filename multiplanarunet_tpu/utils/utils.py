"""General utilities: model-file selection, resume helpers, misc.

Parity surface (reference `mpunet/utils/utils.py`): best/last checkpoint
selection by filename pattern, learning-rate/epoch recovery from the training
CSV with truncation for resume, `set_bias_weights` class-frequency output-bias
initialization, `pred_to_class`, folder helpers, PID waiting."""

from __future__ import annotations

import os
import re
import time
from pathlib import Path

import numpy as np


def ensure_list_or_tuple(obj):
    return obj if isinstance(obj, (list, tuple)) else [obj]


def highlighted(string):
    length = max(len(s) for s in str(string).split("\n"))
    border = "-" * length
    return f"{border}\n{string}\n{border}"


def create_folders(folders, create_deep=False):
    maker = os.makedirs if create_deep else os.mkdir
    for f in ensure_list_or_tuple(folders):
        if f is not None and not os.path.exists(f):
            maker(f)


# ----------------------------------------------------------- model selection
_EPOCH_RE = re.compile(r"@epoch_(\d+)")
_VAL_DICE_RE = re.compile(r"val_dice_([\d.]+)\.")
_VAL_LOSS_RE = re.compile(r"val_loss_([\d.]+)\.")


def get_best_model(model_dir):
    """Select the best checkpoint file by pattern priority:
    val_dice (max) > val_loss (min) > any '@epoch' file (max epoch) >
    model_weights file."""
    model_dir = Path(model_dir)
    files = sorted(str(p) for p in model_dir.glob("*.npz"))
    if not files:
        raise OSError(f"No model files found in {model_dir}")

    dice_files = [(float(m.group(1)), f) for f in files
                  for m in [_VAL_DICE_RE.search(os.path.basename(f))] if m]
    if dice_files:
        return max(dice_files)[1]
    loss_files = [(float(m.group(1)), f) for f in files
                  for m in [_VAL_LOSS_RE.search(os.path.basename(f))] if m]
    if loss_files:
        return min(loss_files)[1]
    epoch_files = [(int(m.group(1)), f) for f in files
                   for m in [_EPOCH_RE.search(os.path.basename(f))] if m]
    if epoch_files:
        return max(epoch_files)[1]
    return files[-1]


def get_last_model(model_dir):
    """(path, epoch) of the checkpoint with the highest epoch number."""
    model_dir = Path(model_dir)
    epoch_files = []
    for f in sorted(model_dir.glob("*.npz")):
        m = _EPOCH_RE.search(f.name)
        if m:
            epoch_files.append((int(m.group(1)), str(f)))
    if not epoch_files:
        generic = model_dir / "model_weights.npz"
        if generic.exists():
            return str(generic), 0
        return None, 0
    epoch, path = max(epoch_files)
    return path, epoch


def get_lr_at_epoch(epoch, log_dir):
    """Learning rate recorded at `epoch` in logs/training.csv, if present.

    Returns (lr or None, column_name or None)."""
    log_path = Path(log_dir) / "training.csv"
    if not log_path.exists():
        return None, None
    import csv

    with open(log_path) as f:
        rows = list(csv.DictReader(f))
    if not rows:
        return None, None
    lr_col = next((c for c in rows[0] if c in ("lr", "learning_rate")), None)
    if lr_col is None:
        return None, None
    for row in rows:
        if int(float(row.get("epoch", -1))) == int(epoch):
            return float(row[lr_col]), lr_col
    return float(rows[-1][lr_col]), lr_col


def clear_csv_after_epoch(epoch, csv_path):
    """Truncate training.csv rows past `epoch` (resume semantics)."""
    csv_path = Path(csv_path)
    if not csv_path.exists():
        return
    lines = csv_path.read_text().splitlines()
    if not lines:
        return
    header, rows = lines[0], lines[1:]
    kept = [r for r in rows if r and int(float(r.split(",")[0])) <= epoch]
    csv_path.write_text("\n".join([header] + kept) + "\n")


def get_last_epoch(csv_path):
    csv_path = Path(csv_path)
    if not csv_path.exists():
        return 0
    lines = [l for l in csv_path.read_text().splitlines()[1:] if l.strip()]
    if not lines:
        return 0
    return int(float(lines[-1].split(",")[0]))


# ------------------------------------------------------------- label helpers
def pred_to_class(tensor, img_dims=3, has_batch_dim=False, threshold=0.5):
    """Probability tensor -> integer class map (argmax / threshold)."""
    tensor = np.asarray(tensor)
    tensor_dim = tensor.ndim
    dims = img_dims + int(has_batch_dim)
    if tensor_dim == dims:
        # Already integer class map
        return tensor
    if tensor.shape[-1] == 1:
        return (tensor[..., 0] >= threshold).astype(np.uint8)
    return np.argmax(tensor, axis=-1).astype(np.uint8)


def random_split(N, fractions, rng=None):
    rng = rng or np.random
    idx = rng.permutation(N)
    splits = (np.cumsum(fractions)[:-1] * N).astype(int)
    return np.split(idx, splits)


def estimate_class_frequencies(image_queue, n_classes, max_images=25,
                               logger=None):
    """Count label occurrences over (up to) `max_images` images from a queue."""
    counts = np.zeros(n_classes, np.int64)
    n = 0
    for image in image_queue.get_image_iterator(max_load=max_images):
        ctx = image.loaded_in_context if hasattr(image, "loaded_in_context") else None
        if ctx and not image.is_loaded:
            with image.loaded_in_context():
                counts += np.bincount(image.labels.ravel(), minlength=n_classes)
        else:
            counts += np.bincount(image.labels.ravel(), minlength=n_classes)
        n += 1
    if logger:
        logger(f"Estimated class counts over {n} images: {counts}")
    return counts


def compute_class_weights(class_counts):
    """Inverse-frequency class weights normalized to mean 1 (the
    'class_weights: True' auto-fill)."""
    counts = np.asarray(class_counts, np.float64)
    freqs = counts / counts.sum()
    weights = 1.0 / np.maximum(freqs, 1e-8)
    return weights / weights.mean()


def set_bias_weights(params, class_counts, out_layer="out_conv", logger=None):
    """Set the output 1x1 conv bias to log class frequencies.

    Starts the softmax output at the empirical class prior, which greatly
    speeds early convergence on heavily-imbalanced segmentation (the
    reference's `biased_output_layer` option, `utils/utils.py:179-242`)."""
    freqs = np.asarray(class_counts, np.float64)
    freqs = freqs / freqs.sum()
    bias = np.log(np.maximum(freqs, 1e-12)).astype(np.float32)
    if out_layer not in params or "bias" not in params[out_layer]:
        raise KeyError(f"No '{out_layer}/bias' in params")
    if params[out_layer]["bias"].shape != bias.shape:
        raise ValueError(
            f"Bias shape mismatch: {params[out_layer]['bias'].shape} vs "
            f"{bias.shape}"
        )
    params = dict(params)
    params[out_layer] = dict(params[out_layer], bias=bias)
    if logger:
        logger(f"Setting {out_layer} bias to log class priors: {bias}")
    return params


# ---------------------------------------------------------------- processes
def await_PIDs(pids, check_every=120, logger=None):
    """Block until the given PIDs no longer exist (job chaining)."""
    if isinstance(pids, str):
        pids = [int(p) for p in pids.split(",")]
    pids = [int(p) for p in ensure_list_or_tuple(pids)]
    log = logger or print
    while pids:
        alive = []
        for pid in pids:
            try:
                os.kill(pid, 0)
            except OSError:
                continue
            alive.append(pid)
        if not alive:
            return
        log(f"Waiting for PIDs {alive} to terminate...")
        pids = alive
        time.sleep(check_every)
