"""Interleaved A/B of the training sampler's host->device transfer
strategy (VERDICT r4 item 2): the packed single-blob transfer
(`_blob_layout`, MP_SAMPLER_PACKED=1, default) vs per-array transfers
(MP_SAMPLER_PACKED=0 — one jnp.asarray RPC per param, ~17/batch, plus an
eager per-batch jax.random.split).

Both arms run the LAZY walk; arms alternate per segment within one
process and one seq/trainer instance so transport-window drift hits both
equally (the env var is consulted at batch START — lookahead batches
started under the previous arm are drained by the warm steps at each
boundary). Ends with the async step-only floor (re-feed one staged
batch), the number VERDICT r4's 1.3x done-bar is defined against.

Usage: python benchmarks/sampler_packed_ab.py [batch] [dim]
       [steps_per_seg] [rounds]
"""
from __future__ import annotations

import os
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
    from multiplanarunet_tpu.image import ImagePairLoader
    from multiplanarunet_tpu.image.queue import EagerQueue
    from multiplanarunet_tpu.logging import ScreenLogger
    from multiplanarunet_tpu.models import UNet, init_model_variables
    from multiplanarunet_tpu.parallel import get_mesh
    from multiplanarunet_tpu.sequences import get_sequence
    from multiplanarunet_tpu.train import Trainer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    seg = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    import tempfile
    from pathlib import Path

    root = Path(tempfile.mkdtemp(prefix="packed_ab_"))
    rng = np.random.RandomState(3)
    create_dataset(root / "train", 4, 160, 1, rng, "train")
    loader = ImagePairLoader(base_dir=root / "train", no_log=True)
    loader.set_scaler_and_bg_values(bg_value=1.0, scaler="RobustScaler",
                                    compute_now=True)
    queue = EagerQueue(loader, logger=ScreenLogger(False))
    views = np.asarray(
        [[0, 0, 1.0], [1.0, 0, 0], [0, 1.0, 0],
         [0.577, 0.577, 0.577], [-0.577, 0.577, 0.577],
         [0.577, -0.577, 0.577]], np.float64)
    seq = get_sequence(
        queue, intrp_style="iso_live", views=views, dim=dim,
        batch_size=batch, n_classes=4, real_space_span=140.0,
        noise_sd=0.1, is_validation=False, logger=ScreenLogger(False),
        no_log=True,
        augmenters=[{"cls_name": "Elastic2D",
                     "kwargs": {"alpha": [0, 450], "sigma": [20, 30],
                                "apply_prob": 0.333}}],
    )
    seq.batch_size = batch

    model = UNet(n_classes=4, dim=dim, n_channels=1, depth=4,
                 complexity_factor=2, dtype=jnp.bfloat16)
    variables = init_model_variables(model, rng=jax.random.PRNGKey(0))
    trainer = Trainer(model, variables, logger=ScreenLogger(False),
                      mesh=get_mesh(jax.devices()[:1]))
    trainer.compile_model(
        optimizer="Adam", optimizer_kwargs={"lr": 1e-4},
        loss="SparseCategoricalCrossentropy",
        metrics=["sparse_categorical_accuracy"])
    print(f"device: {jax.devices()[0]} | batch={batch} dim={dim} "
          f"seg={seg} rounds={rounds}", flush=True)

    def sync(logs):
        np.asarray(jnp.ravel(logs["loss"])[:1])

    state = trainer.state
    results = {"packed": [], "perarray": []}
    arms = [("packed", "1"), ("perarray", "0")]
    step_i = 0
    for r in range(rounds):
        for name, env in arms:
            os.environ["MP_SAMPLER_PACKED"] = env
            # drain lookahead batches started under the previous arm +
            # warm this arm's compile before timing
            for _ in range(2):
                X, y, w = seq[step_i]
                state, logs = trainer.train_step(state, X, y,
                                                 np.asarray(w))
                step_i += 1
            sync(logs)
            t0 = time.time()
            for _ in range(seg):
                X, y, w = seq[step_i]
                state, logs = trainer.train_step(state, X, y,
                                                 np.asarray(w))
                step_i += 1
            sync(logs)
            dt = (time.time() - t0) / seg
            results[name].append(dt)
            print(f"  round {r} {name:9s}: {dt * 1e3:7.1f} ms/step "
                  f"({batch / dt:6.1f} img/s)", flush=True)
    os.environ.pop("MP_SAMPLER_PACKED", None)
    # pure-step floor: re-feed one staged batch, one sync at the end —
    # the async-pipelined rate a perfect (free) sampler would allow
    X, y, w = seq[step_i]
    w = np.asarray(w)
    state, logs = trainer.train_step(state, X, y, w)
    sync(logs)
    t0 = time.time()
    for _ in range(seg):
        state, logs = trainer.train_step(state, X, y, w)
    sync(logs)
    floor = (time.time() - t0) / seg
    print(f"step-only floor: {floor * 1e3:7.1f} ms/step "
          f"({batch / floor:6.1f} img/s)", flush=True)
    for name in ("packed", "perarray"):
        med = float(np.median(results[name]))
        print(f"{name:9s} median {med * 1e3:7.1f} ms/step "
              f"({batch / med:6.1f} img/s)", flush=True)
    deltas = [b - a for a, b in zip(results["packed"],
                                    results["perarray"])]
    print(f"pairwise perarray-packed: mean {np.mean(deltas) * 1e3:+.1f} ms,"
          f" median {np.median(deltas) * 1e3:+.1f} ms", flush=True)
    med = float(np.median(results["packed"]))
    print(f"packed e2e / step-floor ratio: {med / floor:.2f}", flush=True)


if __name__ == "__main__":
    main()
