"""Callback framework + standard callbacks.

Keras-free reimplementation of the reference's callback stack
(`mpunet/callbacks/callbacks.py`, `mcp_clean.py` + the Keras builtins it
configures by name): epoch-level hooks driven by the Trainer with a shared
`logs` dict. Includes checkpointing with delete-previous-best, early
stopping, LR plateau reduction (mutating the injected optax learning rate),
CSV logging, timing, memory watchdog, FG-balancing and sample-image saving."""

from __future__ import annotations

import os
import time
from pathlib import Path

import numpy as np


class Callback:
    """Base class; the Trainer assigns itself before training starts."""

    trainer = None
    # Callbacks that persist artifacts (checkpoints, CSVs, images) are
    # dropped on non-main processes of a multi-process run: every process
    # computes identical logs (replicated train state, collective eval),
    # so exactly one writer suffices and concurrent writers would race on
    # the shared project directory.
    writes_files = False

    def set_trainer(self, trainer):
        self.trainer = trainer

    def on_train_begin(self, logs=None):
        pass

    def on_train_end(self, logs=None):
        pass

    def on_epoch_begin(self, epoch, logs=None):
        pass

    def on_epoch_end(self, epoch, logs=None):
        pass

    def on_batch_end(self, batch, logs=None):
        pass


def _improved(current, best, mode, min_delta=0.0):
    if mode == "max":
        return current > best + min_delta
    return current < best - min_delta


class ModelCheckPointClean(Callback):
    """Save the best checkpoint, deleting the previously saved best file
    (parity: `mpunet/callbacks/mcp_clean.py`). Filepath may format `epoch`
    and any logs key, e.g. './model/@epoch_{epoch:02d}_val_dice_{val_dice:.5f}.npz'."""
    writes_files = True

    def __init__(self, filepath, monitor="val_dice", save_best_only=True,
                 save_weights_only=True, verbose=1, mode="max", **kwargs):
        self.filepath = str(filepath)
        self.monitor = monitor
        self.save_best_only = save_best_only
        self.verbose = verbose
        self.mode = mode
        self.best = -np.inf if mode == "max" else np.inf
        self.previous_path = None

    def on_epoch_end(self, epoch, logs=None):
        logs = logs or {}
        current = logs.get(self.monitor)
        if current is None:
            return
        if self.save_best_only and not _improved(current, self.best, self.mode):
            return
        self.best = current
        fmt = {"epoch": epoch + 1, **{k: float(v) for k, v in logs.items()
                                      if np.isscalar(v) or np.ndim(v) == 0}}
        path = Path(self.filepath.format(**fmt))
        if not path.suffix:
            path = path.with_suffix(".npz")
        self.trainer.save_checkpoint(path, epoch=epoch + 1)
        if self.previous_path and self.previous_path != path:
            try:
                os.remove(self.previous_path)
            except OSError:
                pass
        self.previous_path = path
        if self.verbose:
            self.trainer.logger(
                f"[MCP] epoch {epoch + 1}: {self.monitor}={current:.5f} "
                f"saved to {path}"
            )


class EarlyStopping(Callback):
    def __init__(self, monitor="val_dice", min_delta=0, patience=10,
                 verbose=1, mode="max", **kwargs):
        self.monitor = monitor
        self.min_delta = min_delta
        self.patience = patience
        self.verbose = verbose
        self.mode = mode
        self.best = -np.inf if mode == "max" else np.inf
        self.wait = 0

    def on_epoch_end(self, epoch, logs=None):
        current = (logs or {}).get(self.monitor)
        if current is None:
            return
        if _improved(current, self.best, self.mode, self.min_delta):
            self.best = current
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                self.trainer.stop_training = True
                if self.verbose:
                    self.trainer.logger(
                        f"[EarlyStopping] no {self.monitor} improvement in "
                        f"{self.patience} epochs; stopping."
                    )


class ReduceLROnPlateau(Callback):
    """Multiplies the injected optax learning rate by `factor` on plateau."""

    def __init__(self, monitor="val_dice", factor=0.9, patience=2, verbose=1,
                 mode="max", min_delta=1e-4, min_lr=1e-8, **kwargs):
        self.monitor = monitor
        self.factor = factor
        self.patience = patience
        self.verbose = verbose
        self.mode = mode
        self.min_delta = min_delta
        self.min_lr = min_lr
        self.best = -np.inf if mode == "max" else np.inf
        self.wait = 0

    def on_epoch_end(self, epoch, logs=None):
        current = (logs or {}).get(self.monitor)
        if current is None:
            return
        if _improved(current, self.best, self.mode, self.min_delta):
            self.best = current
            self.wait = 0
            return
        self.wait += 1
        if self.wait >= self.patience:
            old = self.trainer.learning_rate
            new = max(old * self.factor, self.min_lr)
            self.trainer.set_learning_rate(new)
            self.wait = 0
            if self.verbose:
                self.trainer.logger(f"[RLOP] lr {old:.3g} -> {new:.3g}")


class CSVLogger(Callback):
    writes_files = True
    def __init__(self, filename="logs/training.csv", separator=",",
                 append=True, **kwargs):
        self.filename = Path(filename)
        self.sep = separator
        self.append = append
        self._keys = None
        self._file = None

    def on_train_begin(self, logs=None):
        self.filename.parent.mkdir(parents=True, exist_ok=True)
        exists = self.filename.exists() and self.append
        self._file = open(self.filename, "a" if self.append else "w")
        if exists and self.filename.stat().st_size > 0:
            with open(self.filename) as f:
                header = f.readline().strip()
            if header:
                self._keys = header.split(self.sep)[1:]

    def on_epoch_end(self, epoch, logs=None):
        logs = {k: v for k, v in (logs or {}).items()
                if np.isscalar(v) or np.ndim(v) == 0}
        if self._keys is None:
            self._keys = sorted(logs)
            self._file.write(self.sep.join(["epoch"] + self._keys) + "\n")
        row = [str(epoch)] + [
            f"{float(logs[k]):.6g}" if k in logs else "" for k in self._keys
        ]
        self._file.write(self.sep.join(row) + "\n")
        self._file.flush()

    def on_train_end(self, logs=None):
        if self._file:
            self._file.close()


class TrainTimer(Callback):
    """Logs per-epoch and cumulative train time; optional max_minutes stop
    (parity: `callbacks/callbacks.py:118-163`)."""

    def __init__(self, logger=None, max_minutes=None, verbose=1, **kwargs):
        self.logger = logger
        self.max_minutes = max_minutes
        self.verbose = verbose
        self.train_begin = None
        self.epoch_begin = None

    def on_train_begin(self, logs=None):
        self.train_begin = time.time()

    def on_epoch_begin(self, epoch, logs=None):
        self.epoch_begin = time.time()

    def on_epoch_end(self, epoch, logs=None):
        now = time.time()
        epoch_minutes = (now - self.epoch_begin) / 60
        total_minutes = (now - self.train_begin) / 60
        if logs is not None:
            logs["epoch_minutes"] = epoch_minutes
            logs["train_hours"] = total_minutes / 60
        log = self.logger or (self.trainer.logger if self.trainer else print)
        if self.verbose:
            log(f"[TrainTimer] epoch {epoch}: {epoch_minutes:.2f} min "
                f"(total {total_minutes / 60:.2f} h)")
        if self.max_minutes and total_minutes > self.max_minutes:
            log(f"[TrainTimer] max_minutes={self.max_minutes} exceeded; "
                f"stopping.")
            self.trainer.stop_training = True


class MemoryConsumption(Callback):
    """Logs host RSS every epoch; optionally stops training over a limit."""

    def __init__(self, max_gib=None, logger=None, set_limit=False, **kwargs):
        self.max_gib = max_gib
        self.logger = logger

    def on_epoch_end(self, epoch, logs=None):
        import resource

        rss_gib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024 ** 2
        if logs is not None:
            logs["memory_gib"] = rss_gib
        log = self.logger or (self.trainer.logger if self.trainer else print)
        log(f"[Memory] RSS ~{rss_gib:.2f} GiB")
        if self.max_gib and rss_gib > self.max_gib:
            log(f"[Memory] exceeds limit {self.max_gib} GiB; stopping.")
            self.trainer.stop_training = True


class DividerLine(Callback):
    def __init__(self, logger=None, **kwargs):
        self.logger = logger

    def on_epoch_end(self, epoch, logs=None):
        log = self.logger or (self.trainer.logger if self.trainer else print)
        log("-" * 60)


class LearningCurve(Callback):
    """Re-plots logs/curve.png from the CSV log each epoch."""
    writes_files = True

    def __init__(self, log_dir="logs", out_dir="logs", fname="curve.png",
                 logger=None, **kwargs):
        self.csv_path = Path(log_dir) / "training.csv"
        self.out_path = Path(out_dir) / fname

    def on_epoch_end(self, epoch, logs=None):
        if not self.csv_path.exists():
            return
        try:
            from multiplanarunet_tpu.utils.plotting import plot_training_curves

            plot_training_curves(self.csv_path, self.out_path)
        except Exception as e:  # plotting must never kill training
            if self.trainer:
                self.trainer.logger.warn(f"LearningCurve failed: {e}")


class DelayedCallback(Callback):
    """Wraps another callback, activating it from epoch `start_from`."""

    def __init__(self, callback, start_from=0, logger=None, **kwargs):
        self.callback = callback
        self.start_from = start_from

    @property
    def writes_files(self):
        return self.callback.writes_files

    def set_trainer(self, trainer):
        self.trainer = trainer
        self.callback.set_trainer(trainer)

    def on_train_begin(self, logs=None):
        self.callback.on_train_begin(logs)

    def on_train_end(self, logs=None):
        self.callback.on_train_end(logs)

    def on_epoch_begin(self, epoch, logs=None):
        if epoch >= self.start_from:
            self.callback.on_epoch_begin(epoch, logs)

    def on_epoch_end(self, epoch, logs=None):
        if epoch >= self.start_from:
            self.callback.on_epoch_end(epoch, logs)


class FGBatchBalancer(Callback):
    """Adapts the train sequence's fg fraction to 1 - val recall
    (parity: `callbacks/callbacks.py:166-209`)."""

    def __init__(self, train_data=None, logger=None, **kwargs):
        self.train_data = train_data

    def on_epoch_end(self, epoch, logs=None):
        recall = (logs or {}).get("val_recall")
        if recall is None:
            return
        seq = self.train_data or getattr(self.trainer, "train_sequence", None)
        if seq is None:
            return
        fraction = float(np.clip(1.0 - recall, 0.0, 1.0))
        seq.fg_batch_fraction = fraction
        self.trainer.logger(f"[FGBalancer] fg_batch_fraction -> {fraction:.3f}")


class MeanReduceLogArrays(Callback):
    """Replaces any array-valued logs entry with its mean (parity:
    `callbacks/callbacks.py:212-223`)."""

    def on_epoch_end(self, epoch, logs=None):
        for k, v in list((logs or {}).items()):
            if isinstance(v, (list, tuple, np.ndarray)) and np.ndim(v) > 0:
                logs[k] = float(np.mean(v))


class PrintLayerWeights(Callback):
    """Prints statistics of a parameter subtree each epoch (debugging)."""

    def __init__(self, layer=None, every=1, logger=None, **kwargs):
        self.layer = layer
        self.every = every
        self.logger = logger

    def on_epoch_end(self, epoch, logs=None):
        if epoch % self.every:
            return
        import jax

        params = self.trainer.state.params
        if self.layer is not None and self.layer in params:
            params = params[self.layer]
        leaves = jax.tree_util.tree_leaves(params)
        flat = np.concatenate([np.asarray(l).ravel() for l in leaves])
        log = self.logger or self.trainer.logger
        log(f"[Weights{'/' + self.layer if self.layer else ''}] "
            f"mean={flat.mean():.4g} std={flat.std():.4g} "
            f"min={flat.min():.4g} max={flat.max():.4g}")


class SavePredictionImages(Callback):
    """Saves sample (input | truth | prediction) panels each epoch (parity:
    `callbacks/callbacks.py:345-420`)."""
    writes_files = True

    def __init__(self, train_data=None, val_data=None, out_dir="images",
                 logger=None, **kwargs):
        self.train_data = train_data
        self.val_data = val_data
        self.out_dir = Path(out_dir)

    def on_epoch_end(self, epoch, logs=None):
        seq = self.val_data or self.train_data or getattr(
            self.trainer, "val_sequence", None
        ) or getattr(self.trainer, "train_sequence", None)
        if seq is None:
            return
        try:
            from multiplanarunet_tpu.utils.plotting import (
                save_prediction_panel,
            )

            X, y, _ = seq[0]
            probs = self.trainer.predict_batch(X)
            self.out_dir.mkdir(parents=True, exist_ok=True)
            save_prediction_panel(
                np.asarray(X), np.asarray(y), np.asarray(probs),
                self.out_dir / f"epoch_{epoch:03d}.png",
            )
        except Exception as e:  # plotting must never kill training
            self.trainer.logger.warn(f"SavePredictionImages failed: {e}")


class Profiler(Callback):
    """jax.profiler trace of selected epochs (the tracing subsystem; replaces
    the reference's TensorBoard profile_batch hook)."""
    writes_files = True

    def __init__(self, log_dir="./profile", epochs=(1,), logger=None,
                 **kwargs):
        self.log_dir = str(log_dir)
        self.epochs = set(epochs)
        self._active = False

    def on_epoch_begin(self, epoch, logs=None):
        if epoch in self.epochs and not self._active:
            import jax

            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def on_epoch_end(self, epoch, logs=None):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            self.trainer.logger(f"[Profiler] trace written to {self.log_dir}")

    def on_train_end(self, logs=None):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False


class SaveOutputAs2DImage(Callback):
    """Saves the model's output on a fixed sample as a 2D image per epoch
    (parity: `callbacks/callbacks.py:276-342`)."""
    writes_files = True

    def __init__(self, sequence=None, out_dir="images/outputs", every=1,
                 logger=None, **kwargs):
        self.sequence = sequence
        self.out_dir = Path(out_dir)
        self.every = every

    def on_epoch_end(self, epoch, logs=None):
        if epoch % self.every:
            return
        seq = self.sequence or getattr(self.trainer, "val_sequence", None) \
            or getattr(self.trainer, "train_sequence", None)
        if seq is None:
            return
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            X, _, _ = seq[0]
            probs = np.asarray(self.trainer.predict_batch(X))
            img = probs[0]
            if img.ndim == 4:  # 3D output -> middle slice
                img = img[img.shape[0] // 2]
            self.out_dir.mkdir(parents=True, exist_ok=True)
            fig, axes = plt.subplots(1, img.shape[-1],
                                     figsize=(3 * img.shape[-1], 3))
            for c, ax in enumerate(np.atleast_1d(axes)):
                ax.imshow(img[..., c], vmin=0, vmax=1)
                ax.set_title(f"class {c}")
                ax.axis("off")
            fig.tight_layout()
            fig.savefig(self.out_dir / f"output_epoch_{epoch:03d}.png",
                        dpi=80)
            plt.close(fig)
        except Exception as e:
            self.trainer.logger.warn(f"SaveOutputAs2DImage failed: {e}")
