"""Trainer: compiles the train/eval steps and drives the epoch loop.

Parity surface: `mpunet/train/trainer.py` — `compile_model` resolves
optimizer/loss/metrics by name; `fit` assembles the callback stack (with the
Validation callback first), imposes the epoch length from images_per_epoch /
batch_size, saves sample images before training, and retries with a smaller
batch size on device OOM (`trainer.py:140-161`).

TPU specifics: one jitted step per batch (donated state, no host round-trips
besides the scalar logs), data-parallel over a `jax.sharding.Mesh` with the
batch axis sharded and parameters replicated (XLA inserts the gradient
all-reduce over ICI), and global-batch BatchNorm statistics."""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from multiplanarunet_tpu.callbacks.funcs import init_callback_objects
from multiplanarunet_tpu.callbacks.validation import Validation
from multiplanarunet_tpu.logging import ScreenLogger
from multiplanarunet_tpu.models import checkpoint as ckpt
from multiplanarunet_tpu.parallel import mesh as mesh_lib
from multiplanarunet_tpu.train.train_step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_multitask_eval_step,
    make_multitask_train_step,
    make_train_step,
)
from multiplanarunet_tpu.train.utils import (
    ensure_sparse,
    init_losses,
    init_metrics,
    init_optimizer,
)


def _is_oom_error(e):
    text = str(e)
    return "RESOURCE_EXHAUSTED" in text or "Out of memory" in text


class Trainer:
    """Drives training of a flax model over batch sampler sequences."""

    def __init__(self, model, variables, logger=None, mesh=None):
        self.model = model
        self.variables = variables
        self.logger = logger or ScreenLogger()
        self.mesh = mesh if mesh is not None else mesh_lib.get_mesh()
        self.n_devices = len(self.mesh.devices.ravel())
        # Multi-host: each process samples + pads only its local share of
        # the global batch (shard_batch assembles the global jax.Array)
        self.n_processes = jax.process_count()
        self._n_local_devices = max(1, self.n_devices // self.n_processes)
        # Sampler prefetch depth (see _fit). Kept at 1: the sequences
        # pipeline their own candidate round-trips internally
        # (multi_planar._getitem_pooled lookahead), and the remote-device
        # transport does not tolerate concurrent transfers from several
        # threads (measured INVALID_ARGUMENT under depth 3). The
        # reference's workers=5 generator parallelism
        # (`mpunet/train/trainer.py:246-257`) maps to this single
        # dispatch pipeline on TPU.
        self._prefetch_depth = 1

        self.tx = None
        self.loss_obj = None
        self.metric_fns = None
        self.state: TrainState | None = None
        self.train_step = None
        self.eval_step = None
        self._predict_fn = None
        self.stop_training = False
        self.train_sequence = None
        self.val_sequence = None
        self._synced_programs = {}

    # -------------------------------------------------- collective dispatch
    def synced_dispatch(self, key, fn, *args):
        """Dispatch a jitted program containing cross-process collectives.

        Single-process: a plain call. Multi-process: the first call per
        (key, leaf shapes/dtypes) AOT-compiles the program, holds every
        rank at a host-level coordination barrier until the whole group
        finished compiling, then executes the compiled object (cached and
        reused for all later calls). Gloo's TCP context initialization has
        a hard 30 s deadline: first-dispatch skew of a whole compile time
        — e.g. one rank hitting the persistent compile cache while the
        other compiles for minutes — killed the first collective of a
        2-process `mp train` (measured in tests/test_distributed_cli.py).
        Lockstep compilation also keeps multi-minute TPU-pod first
        compiles inside their collective timeouts."""
        if self.n_processes <= 1:
            return fn(*args)
        import jax

        sig = (key,) + tuple(
            (tuple(getattr(x, "shape", ())), str(getattr(x, "dtype", "")))
            for x in jax.tree_util.tree_leaves(args))
        compiled = self._synced_programs.get(sig)
        if compiled is None:
            from multiplanarunet_tpu.parallel import process_barrier

            compiled = fn.lower(*args).compile()
            # Ranks meet new signatures in the same (deterministic) order,
            # so the counter-derived barrier name matches across the group
            process_barrier(f"compile-{key}-{len(self._synced_programs)}")
            self._synced_programs[sig] = compiled
        return compiled(*args)

    # ------------------------------------------------------------- compile
    def compile_model(self, optimizer, optimizer_kwargs=None, loss=None,
                      metrics=(), loss_kwargs=None, check_sparse=True,
                      l1_reg=0.0, l2_reg=0.0, **kwargs):
        metrics = list(metrics or [])
        if check_sparse:
            ensure_sparse([loss] + metrics)
        self.tx = init_optimizer(optimizer, logger=self.logger,
                                 **(optimizer_kwargs or {}))
        self.loss_obj = init_losses(loss, logger=self.logger,
                                    **(loss_kwargs or {}))[0]
        self.metric_fns = init_metrics(metrics, logger=self.logger)
        self.state = create_train_state(self.variables, self.tx)
        if self.n_devices > 1:
            self.state = mesh_lib.replicate(self.state, self.mesh)
        l1 = float(l1_reg) if l1_reg else 0.0
        l2 = float(l2_reg) if l2_reg else 0.0
        n_classes = getattr(self.model, "n_classes", None)
        if self.multitask:
            self.train_step = make_multitask_train_step(
                self.model, self.tx, self.loss_obj, self.metric_fns,
                l1_reg=l1, l2_reg=l2,
            )
            self.eval_step = make_multitask_eval_step(
                self.model, self.loss_obj, self.metric_fns, n_classes
            )
        else:
            self.train_step = make_train_step(
                self.model, self.tx, self.loss_obj, self.metric_fns,
                l1_reg=l1, l2_reg=l2,
            )
            self.eval_step = make_eval_step(
                self.model, self.loss_obj, self.metric_fns, n_classes
            )
        self.logger("Trainer compiled.")
        return self

    # --------------------------------------------------------------- state
    @property
    def multitask(self):
        """True for models taking per-task input tuples (MultiTaskUNet2D)."""
        return isinstance(getattr(self.model, "n_classes", None),
                          (list, tuple))

    @property
    def n_classes(self):
        return self.model.n_classes

    @property
    def learning_rate(self):
        return self.state.learning_rate

    def set_learning_rate(self, lr):
        self.state = self.state.with_learning_rate(lr)

    def save_checkpoint(self, path, epoch=None):
        params = jax.device_get(self.state.params)
        batch_stats = jax.device_get(self.state.batch_stats)
        ckpt.save_weights(path, params, batch_stats,
                          meta={"epoch": epoch} if epoch is not None else None)

    def predict_batch(self, X):
        if self._predict_fn is None:
            self._predict_fn = jax.jit(
                lambda params, bs, x: self.model.apply(
                    {"params": params, "batch_stats": bs}, x, train=False
                )
            )
        return self._predict_fn(self.state.params, self.state.batch_stats, X)

    # ----------------------------------------------------------------- fit
    def _shard(self, X, y, w):
        if self.multitask and isinstance(X, (list, tuple)):
            sharded = [self._shard(x, yy, ww) for x, yy, ww in zip(X, y, w)]
            return (tuple(s[0] for s in sharded), tuple(s[1] for s in sharded),
                    tuple(s[2] for s in sharded))
        if self.n_devices <= 1:
            return X, y, w
        pad = mesh_lib.pad_batch_to_multiple(
            X.shape[0], self._n_local_devices) - X.shape[0]
        if pad:
            import jax.numpy as jnp

            X = jnp.concatenate([X, X[:pad]])
            y = jnp.concatenate([y, y[:pad]])
            w = np.concatenate([w, np.zeros(pad, w.dtype)])
        return mesh_lib.shard_batch((X, y, np.asarray(w)), self.mesh)

    def _shard_eval(self, X, y, w):
        """Shard an eval batch over the mesh like `_shard`, returning also a
        validity mask (0 for the pad-replicated tail) so the Validation
        callback's confusion counts stay exact under padding."""
        if self.multitask and isinstance(X, (list, tuple)):
            parts = [self._shard_eval(x, yy, ww)
                     for x, yy, ww in zip(X, y, w)]
            masks = tuple(p[3] for p in parts)
            if all(m is None for m in masks):
                masks = None
            return (tuple(p[0] for p in parts), tuple(p[1] for p in parts),
                    tuple(p[2] for p in parts), masks, parts[0][4])
        n_true = int(X.shape[0])
        if self.n_devices <= 1:
            return X, y, w, None, n_true
        # Build the validity mask over the process-LOCAL padded piece BEFORE
        # sharding: each process pads its own slice, and shard_batch expects
        # local data in the multi-process case (it assembles the global
        # array from per-process pieces, in the same order as X/y/w).
        local_pad = mesh_lib.pad_batch_to_multiple(
            n_true, self._n_local_devices)
        mask = np.ones(local_pad, np.float32)
        mask[n_true:] = 0.0
        X, y, w = self._shard(X, y, w)
        mask = mesh_lib.shard_batch(mask, self.mesh)
        return X, y, w, mask, n_true

    def fit(self, train, val=None, batch_size=16, n_epochs=10, callbacks=(),
            train_im_per_epoch=2500, val_im_per_epoch=3500, init_epoch=0,
            verbose=True, no_im=False, **fit_kwargs):
        """Run the epoch loop; returns the history list of per-epoch logs.

        Retries with batch_size-2 on device OOM like the reference."""
        self.train_sequence = train
        self.val_sequence = val
        if not no_im:
            try:
                from multiplanarunet_tpu.utils.plotting import save_images

                save_images(train[0], val[0] if val is not None else None,
                            Path("images"), self.logger)
            except Exception as e:
                self.logger.warn(f"Could not save sample images: {e}")

        while batch_size >= 1:
            try:
                return self._fit(
                    train, val, batch_size=batch_size, n_epochs=n_epochs,
                    callbacks=callbacks, train_im_per_epoch=train_im_per_epoch,
                    val_im_per_epoch=val_im_per_epoch, init_epoch=init_epoch,
                    verbose=verbose,
                )
            except Exception as e:  # noqa: BLE001 - OOM backoff
                if not _is_oom_error(e):
                    raise
                batch_size -= 2
                self.logger.warn(
                    f"Device OOM; retrying with batch_size={batch_size}"
                )
                if batch_size < 1:
                    raise
                train.batch_size = batch_size
                if val is not None:
                    val.batch_size = batch_size

    def _fit(self, train, val, batch_size, n_epochs, callbacks,
             train_im_per_epoch, val_im_per_epoch, init_epoch, verbose):
        # Multi-host data parallelism: `batch_size` is the GLOBAL batch;
        # each process's sequence samples only its local share (the random
        # samplers are independent per host, which IS the sharded input
        # pipeline). Steps/epoch stay defined by the global batch.
        local_bs = batch_size
        if self.n_processes > 1:
            if batch_size % self.n_processes:
                raise ValueError(
                    f"batch_size={batch_size} not divisible by "
                    f"{self.n_processes} processes")
            from multiplanarunet_tpu.parallel import local_batch_slice

            _, local_bs = local_batch_slice(batch_size)
        train.batch_size = local_bs
        steps_per_epoch = max(1, int(train_im_per_epoch / batch_size))
        cb_objs = []
        if val is not None:
            val.batch_size = local_bs
            val_steps = max(1, int(val_im_per_epoch / batch_size))
            cb_objs.append(Validation(val, val_steps, logger=self.logger,
                                      verbose=verbose))
        extra, self.cb_dict = init_callback_objects(callbacks, self.logger)
        cb_objs += extra
        if self.n_processes > 1:
            from multiplanarunet_tpu.parallel import is_main_process

            if not is_main_process():
                # Exactly one writer per shared project dir: logs are
                # replicated (psum'd loss, collective eval), so non-main
                # processes drop artifact-persisting callbacks instead of
                # racing the main process on checkpoints/CSVs/images.
                dropped = [type(cb).__name__ for cb in cb_objs
                           if cb.writes_files]
                cb_objs = [cb for cb in cb_objs if not cb.writes_files]
                if dropped:
                    self.logger(f"Non-main process: dropped file-writing "
                                f"callbacks {dropped}")
        for cb in cb_objs:
            cb.set_trainer(self)

        history = []
        self.stop_training = False
        for cb in cb_objs:
            cb.on_train_begin({})
        self.logger(
            f"Training for {n_epochs} epochs of {steps_per_epoch} steps "
            f"(batch {batch_size}, {self.n_devices} device(s))"
        )
        epoch = init_epoch
        for epoch in range(init_epoch, n_epochs):
            logs = {}
            for cb in cb_objs:
                cb.on_epoch_begin(epoch, logs)
            accum = {}
            # Pipelined batch sampling: several worker threads each build a
            # future batch while the device executes the current step. The
            # sampler's device kernels serialize with the train step on the
            # chip anyway — the depth exists to OVERLAP the samplers' host
            # round-trips (candidate presence fetches are latency-, not
            # bandwidth-bound on remote transports), which a single worker
            # serializes into the step wall. Batches are independent random
            # draws; staging (DeviceVolumePool) is thread-safe.
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            depth = min(self._prefetch_depth, steps_per_epoch)
            with ThreadPoolExecutor(max_workers=depth) as prefetcher:
                futures = deque(
                    prefetcher.submit(train.__getitem__, i)
                    for i in range(depth)
                )
                for step in range(steps_per_epoch):
                    X, y, w = futures.popleft().result()
                    if step + depth < steps_per_epoch:
                        futures.append(prefetcher.submit(
                            train.__getitem__, step + depth
                        ))
                    X, y, w = self._shard(X, y, w)
                    self.state, step_logs = self.synced_dispatch(
                        "train_step", self.train_step, self.state, X, y, w
                    )
                    for k, v in step_logs.items():
                        accum.setdefault(k, []).append(v)
            # One host sync per epoch for the scalar means
            for k, vals in accum.items():
                logs[k] = float(np.mean([np.asarray(v) for v in vals]))
            logs["lr"] = self.learning_rate
            for cb in cb_objs:
                cb.on_epoch_end(epoch, logs)
            if verbose:
                summary = " - ".join(
                    f"{k}: {v:.4f}" for k, v in logs.items()
                    if np.isscalar(v) and np.isfinite(v)
                )
                self.logger(f"Epoch {epoch + 1}/{n_epochs} - {summary}")
            history.append(logs)
            if self.stop_training:
                break
        for cb in cb_objs:
            cb.on_train_end({})
        self._stop_queues(train, val)
        return history

    @staticmethod
    def _stop_queues(train, val):
        for seq in (train, val):
            queue = getattr(seq, "image_pair_queue", None)
            pool = getattr(queue, "loading_pool", None)
            if pool is not None:
                # Let daemon loader threads exit with the process
                pool.de_register_dataset(queue.dataset.identifier)
