"""jax.profiler trace + per-op attribution of e2e TRAINING (VERDICT r4
item 3: e2e training is sampler-bound — ~140 ms of sampler device work
vs a 75 ms step at batch 16 / dim 128).

Runs the real multi-planar sequence -> Trainer.train_step loop (the same
wiring as benchmarks/train_profile_probe.py), traces N steady-state
steps, and aggregates leaf device time per fused HLO op (the xplane
parser from profile_predict.py). Sampler kernels
(_pool_candidate_labels / _finish_batch_fused) and the train step are
separate jit programs, so their fusions are distinguishable by op
attribution in the table.

Usage: python benchmarks/profile_train.py [batch] [dim] [steps]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from benchmarks.profile_predict import parse_xplanes  # noqa: E402


def main():
    from multiplanarunet_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax

    from multiplanarunet_tpu.bin.toy_data import create_dataset
    from multiplanarunet_tpu.image import ImagePairLoader
    from multiplanarunet_tpu.image.queue import EagerQueue
    from multiplanarunet_tpu.logging import ScreenLogger
    from multiplanarunet_tpu.models import UNet, init_model_variables
    from multiplanarunet_tpu.sequences import get_sequence
    from multiplanarunet_tpu.train import Trainer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import tempfile
    from pathlib import Path

    root = Path(tempfile.mkdtemp(prefix="train_trace_"))
    rng = np.random.RandomState(3)
    create_dataset(root / "train", 4, 160, 1, rng, "train")
    loader = ImagePairLoader(base_dir=root / "train", no_log=True)
    loader.set_scaler_and_bg_values(bg_value=1.0, scaler="RobustScaler",
                                    compute_now=True)
    queue = EagerQueue(loader, logger=ScreenLogger(False))
    views = np.asarray(
        [[0, 0, 1.0], [1.0, 0, 0], [0, 1.0, 0],
         [0.577, 0.577, 0.577], [-0.577, 0.577, 0.577],
         [0.577, -0.577, 0.577]], np.float32)
    seq = get_sequence(
        queue, intrp_style="iso_live", views=views, dim=dim,
        batch_size=batch, n_classes=3, real_space_span=160.0,
        noise_sd=0.1, is_validation=False, logger=ScreenLogger(False),
        no_log=True,
        augmenters=[{"cls_name": "Elastic2D",
                     "kwargs": {"alpha": [0, 450], "sigma": [20, 30],
                                "apply_prob": 0.333}}],
    )
    seq.batch_size = batch
    model = UNet(n_classes=3, dim=dim, n_channels=1, depth=4,
                 complexity_factor=2)
    variables = init_model_variables(model, rng=jax.random.PRNGKey(0))
    trainer = Trainer(model, variables, logger=ScreenLogger(False))
    trainer.compile_model(
        optimizer="Adam", optimizer_kwargs={"lr": 1e-4},
        loss="SparseCategoricalCrossentropy", metrics=[])

    def one_step(i):
        X, y, w = seq[i]
        X, y, w = trainer._shard(X, y, w)
        trainer.state, logs = trainer.train_step(trainer.state, X, y, w)
        return logs

    print("warmup (compile both sampler phases + step)...", flush=True)
    for i in range(4):
        logs = one_step(i)
    print(f"warmup loss={float(logs['loss']):.4f}", flush=True)
    t0 = time.time()
    for i in range(steps):
        one_step(i)
    _ = float(np.asarray(trainer.state.params["out_conv"]["bias"][0]))
    dt = time.time() - t0
    print(f"steady e2e: {dt / steps * 1e3:.1f} ms/step "
          f"({batch * steps / dt:.1f} img/s)", flush=True)

    log_dir = os.environ.get("MP_PROFILE_DIR", "/tmp/mp_train_profile")
    # clear stale xplanes: the parser aggregates EVERY trace in the dir,
    # so a leftover run silently contaminates the op table
    import shutil

    shutil.rmtree(log_dir, ignore_errors=True)
    print("tracing...", flush=True)
    with jax.profiler.trace(log_dir):
        for i in range(steps):
            one_step(i)
        _ = float(np.asarray(trainer.state.params["out_conv"]["bias"][0]))
    print(f"traced {steps} steps", flush=True)
    parse_xplanes(log_dir, top=40)


if __name__ == "__main__":
    main()
