"""Validation callback: full-set epoch evaluation with exact per-class stats.

Parity target: `mpunet/callbacks/validation.py` — at every epoch end, run the
model over `steps` validation batches, average the batch metrics, and
accumulate per-class TP / relevant / selected counts to produce epoch-level
precision, recall and dice per class (printed as a table and written into
`logs` as val_loss / val_<metric> / val_precision / val_recall / val_dice).

The reference needs a thread pool + a counting thread with a lock for this;
here the counts are computed inside the jitted eval step on device and
summed — no threads, no GIL."""

from __future__ import annotations

import numpy as np

from multiplanarunet_tpu.callbacks.callbacks import Callback
from multiplanarunet_tpu.evaluate.metrics import precision_recall_dice


class Validation(Callback):
    def __init__(self, val_sequence, steps, logger=None, verbose=True,
                 ignore_bg=True, **kwargs):
        self.sequence = val_sequence
        self.steps = int(steps)
        self.logger = logger
        self.verbose = verbose
        self.ignore_bg = ignore_bg

    def _log(self):
        return self.logger or (self.trainer.logger if self.trainer else print)

    def on_epoch_end(self, epoch, logs=None):
        logs = logs if logs is not None else {}
        trainer = self.trainer
        multitask = trainer.multitask
        n_classes_list = (list(trainer.n_classes) if multitask
                          else [trainer.n_classes])
        n_tasks = len(n_classes_list)
        # One-deep batch prefetch (sampling overlaps the device eval step).
        # The per-batch metric scalars and confusion counts fold into a
        # device-resident accumulator INSIDE the jitted step (the nested
        # jitted eval step traces inline), so the validation epoch runs with
        # ZERO per-batch host syncs and one final fetch — the previous loop
        # paid 4 blocking device->host round-trips per batch, which
        # serialized the pipeline on high-latency dispatch transports.
        import jax

        from concurrent.futures import ThreadPoolExecutor

        import jax.numpy as jnp

        if getattr(self, "_accum_step", None) is None:
            def _accum(params, batch_stats, X, y, w, mask, acc):
                step_logs, counts = trainer.eval_step(
                    params, batch_stats, X, y, w, mask)
                if not multitask:
                    counts = (counts,)
                # Undo the padded-batch denominator in the mean loss (pads
                # carry zero sample weight): factor = n_padded / n_true,
                # computed in-graph from the validity mask so it is correct
                # for multi-process meshes too (global pad / global true).
                if mask is None:
                    factor = jnp.float32(1.0)
                else:
                    m = mask[0] if isinstance(mask, (tuple, list)) else mask
                    factor = jnp.float32(m.shape[0]) / jnp.sum(m)
                new_logs = {
                    k: acc["logs"][k]
                    + (v * factor if k.endswith("loss") else v)
                    for k, v in step_logs.items()
                }
                # Counts are exact integers (one-hot sums, 0/1 mask); int32
                # accumulation keeps them exact across arbitrarily many
                # batches (f32 would round past 2^24). Overflows only past
                # 2^31 voxels of one class per epoch.
                new_counts = tuple(
                    tuple(a + b.astype(jnp.int32)
                          for a, b in zip(acc_t, cnt_t))
                    for acc_t, cnt_t in zip(acc["counts"], counts)
                )
                return {"logs": new_logs, "counts": new_counts}

            self._accum_step = jax.jit(_accum)

        acc = None
        with ThreadPoolExecutor(max_workers=1) as prefetcher:
            future = prefetcher.submit(self.sequence.__getitem__, 0)
            for i in range(self.steps):
                X, y, w = future.result()
                if i + 1 < self.steps:
                    future = prefetcher.submit(
                        self.sequence.__getitem__, i + 1
                    )
                # Shard eval batches over the mesh like the train path (pads
                # to a device-count multiple; the mask keeps counts exact).
                X, y, w, mask, _ = trainer._shard_eval(X, y, w)
                if acc is None:
                    # Zero seed with the step's metric keys — trace-only,
                    # nothing is compiled or dispatched.
                    log_spec, _ = jax.eval_shape(
                        trainer.eval_step, trainer.state.params,
                        trainer.state.batch_stats, X, y, w, mask)
                    acc = {
                        "logs": {k: np.float32(0) for k in log_spec},
                        "counts": tuple(
                            tuple(np.zeros(nc, np.int32) for _ in range(3))
                            for nc in n_classes_list
                        ),
                    }
                # synced_dispatch: multi-process ranks AOT-compile the
                # collective eval program in lockstep (see Trainer)
                acc = trainer.synced_dispatch(
                    "val_accum", self._accum_step,
                    trainer.state.params, trainer.state.batch_stats,
                    X, y, w, mask, acc,
                )
        # The epoch's single host sync
        acc = jax.tree_util.tree_map(np.asarray, acc)
        tp = [np.asarray(c[0], np.float64) for c in acc["counts"]]
        rel = [np.asarray(c[1], np.float64) for c in acc["counts"]]
        sel = [np.asarray(c[2], np.float64) for c in acc["counts"]]

        for key, total in acc["logs"].items():
            logs[f"val_{key}"] = float(total) / self.steps

        mps, mrs, mds, tables = [], [], [], []
        for t in range(n_tasks):
            (precision, recall, dice), (mp, mr, md) = precision_recall_dice(
                tp[t], rel[t], sel[t], ignore_bg=self.ignore_bg
            )
            mps.append(mp)
            mrs.append(mr)
            mds.append(md)
            tables.append((precision, recall, dice))
            if multitask:
                logs[f"val_task_{t}/dice"] = md
        # Across tasks, val_dice is the task mean (single task: unchanged)
        logs["val_precision"] = float(np.mean(mps))
        logs["val_recall"] = float(np.mean(mrs))
        logs["val_dice"] = float(np.mean(mds))

        if self.verbose:
            log = self._log()
            log(f"\n--- Validation epoch {epoch} "
                f"(loss={logs.get('val_loss', float('nan')):.4f}) ---")
            for t in range(n_tasks):
                if multitask:
                    log(f"[task {t}]")
                precision, recall, dice = tables[t]
                classes = np.arange(1 if self.ignore_bg else 0,
                                    n_classes_list[t])
                log(f"{'class':>8} {'precision':>10} {'recall':>10} "
                    f"{'dice':>10}")
                for i, c in enumerate(classes):
                    log(f"{c:>8} {precision[i]:>10.4f} {recall[i]:>10.4f} "
                        f"{dice[i]:>10.4f}")
                log(f"{'mean':>8} {mps[t]:>10.4f} {mrs[t]:>10.4f} "
                    f"{mds[t]:>10.4f}")


class ValDiceScores(Callback):
    """Array-based validation dice over a fixed (X, y) pair — the fusion
    trainer's lightweight epoch metric (parity:
    `callbacks/validation.py:308-354`)."""

    def __init__(self, validation_data, n_classes, batch_size=2 ** 17,
                 logger=None, **kwargs):
        self.X_val, self.y_val = validation_data
        self.n_classes = int(n_classes)
        self.batch_size = int(batch_size)
        self.logger = logger

    def eval(self):
        import jax
        import jax.numpy as jnp

        from multiplanarunet_tpu.evaluate.metrics import dice_all

        if getattr(self, "_argmax_fn", None) is None:
            # Jitted (one dispatch, cached per shape): fetch class ids, not
            # the full softmax, without a per-batch eager argmax RPC
            self._argmax_fn = jax.jit(lambda o: jnp.argmax(o, -1))
        preds = []
        for i in range(0, len(self.X_val), self.batch_size):
            out = self.trainer.predict_batch(self.X_val[i:i + self.batch_size])
            preds.append(np.asarray(self._argmax_fn(out)))
        pred = np.concatenate(preds)
        dices = dice_all(
            np.asarray(self.y_val).squeeze(), pred,
            n_classes=self.n_classes, ignore_zero=True,
        )
        return np.nanmean(dices)

    def on_epoch_end(self, epoch, logs=None):
        mean_dice = float(self.eval())
        if logs is not None:
            logs["val_dice"] = mean_dice
        (self.logger or self.trainer.logger)(
            f"[ValDiceScores] epoch {epoch}: val_dice={mean_dice:.5f}"
        )
