"""A/B the validation epoch's host-sync strategy.

The Validation callback folds per-batch metric scalars and confusion
counts into a device-resident accumulator inside the jitted eval step, so
an epoch costs ONE blocking fetch. The path it replaced fetched 4 scalars
+ 3 count vectors per batch. On the remote-dispatch transport each
blocking fetch is a full round-trip, so the old epoch was latency-bound.

This probe replays the SAME pre-sampled batches through both strategies
(the old loop is emulated inline — it is ~15 lines) and reports s/epoch.

Usage: python benchmarks/validation_epoch_probe.py [batch] [dim] [steps]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from multiplanarunet_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from multiplanarunet_tpu.bin.toy_data import create_dataset
    from multiplanarunet_tpu.callbacks.validation import Validation
    from multiplanarunet_tpu.image import ImagePairLoader
    from multiplanarunet_tpu.image.queue import EagerQueue
    from multiplanarunet_tpu.logging import ScreenLogger
    from multiplanarunet_tpu.models import UNet, init_model_variables
    from multiplanarunet_tpu.parallel import get_mesh
    from multiplanarunet_tpu.sequences import get_sequence
    from multiplanarunet_tpu.train import Trainer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 25

    import tempfile
    from pathlib import Path

    root = Path(tempfile.mkdtemp(prefix="val_probe_"))
    rng = np.random.RandomState(3)
    create_dataset(root / "val", 3, 160, 1, rng, "val")
    loader = ImagePairLoader(base_dir=root / "val", no_log=True)
    loader.set_scaler_and_bg_values(bg_value=1.0, scaler="RobustScaler",
                                    compute_now=True)
    queue = EagerQueue(loader, logger=ScreenLogger(False))
    views = np.asarray([[0, 0, 1.0], [1.0, 0, 0], [0, 1.0, 0]], np.float64)
    seq = get_sequence(
        queue, intrp_style="iso_live", views=views, dim=dim,
        batch_size=batch, n_classes=4, real_space_span=140.0,
        noise_sd=0.0, is_validation=True, logger=ScreenLogger(False),
        no_log=True,
    )
    seq.batch_size = batch

    model = UNet(n_classes=4, dim=dim, n_channels=1, depth=4,
                 complexity_factor=2, dtype=jnp.bfloat16)
    variables = init_model_variables(model, rng=jax.random.PRNGKey(0))
    mesh = get_mesh(jax.devices()[:1])
    trainer = Trainer(model, variables, logger=ScreenLogger(False),
                      mesh=mesh)
    trainer.compile_model(
        optimizer="Adam", optimizer_kwargs={"lr": 1e-4},
        loss="SparseCategoricalCrossentropy",
        metrics=["sparse_categorical_accuracy"])

    # Pre-sample a fixed batch set so both strategies replay identical data
    # with zero sampling cost inside the timed region.
    batches = [jax.tree_util.tree_map(np.asarray, seq[i]) for i in range(3)]

    class _Replay:
        def __init__(self, b):
            self.batches = b
            self.batch_size = batch

        def __getitem__(self, i):
            return self.batches[i % len(self.batches)]

    replay = _Replay(batches)

    def old_epoch():
        tp = np.zeros(4)
        rel = np.zeros(4)
        sel = np.zeros(4)
        batch_logs = []
        for i in range(steps):
            X, y, w = replay[i]
            Xs, ys, ws, mask, n_true = trainer._shard_eval(X, y, w)
            step_logs, counts = trainer.eval_step(
                trainer.state.params, trainer.state.batch_stats,
                Xs, ys, ws, mask)
            step_logs = {k: float(v) for k, v in step_logs.items()}
            n_pad = int(Xs.shape[0])
            if n_pad != n_true:
                for k in step_logs:
                    if k.endswith("loss"):
                        step_logs[k] *= n_pad / n_true
            batch_logs.append(step_logs)
            tp += np.asarray(counts[0])
            rel += np.asarray(counts[1])
            sel += np.asarray(counts[2])
        return {k: float(np.mean([b[k] for b in batch_logs]))
                for k in batch_logs[0]}

    cb = Validation(replay, steps=steps, logger=ScreenLogger(False),
                    verbose=False)
    cb.set_trainer(trainer)

    def new_epoch():
        logs = {}
        cb.on_epoch_end(0, logs)
        return logs

    results = {}
    for name, fn in (("old_per_batch_fetch", old_epoch),
                     ("new_device_accum", new_epoch)):
        fn()  # warmup / compile
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = fn()
            ts.append(time.time() - t0)
        results[name] = (min(ts), out)
        print(f"{name}: {min(ts):.3f}s/epoch "
              f"({min(ts) / steps * 1000:.1f} ms/batch, "
              f"runs {[round(t, 3) for t in ts]})", flush=True)

    lo = results["old_per_batch_fetch"][1]
    ln = results["new_device_accum"][1]
    print("val_loss old=%.6f new=%.6f" % (lo["loss"], ln["val_loss"]))
    print("speedup: %.2fx" % (results["old_per_batch_fetch"][0]
                              / results["new_device_accum"][0]))


if __name__ == "__main__":
    main()
