"""Separate the sampler's HOST/dispatch cost from its device kernels.

The packed-gather A/B showed removing ~20 ms of measured sampler device
work moved e2e 0 ms — so the sampler-side gap must be host work + H2D
transfer dispatch (every jnp.asarray of a per-batch numpy param is its
own transfer RPC on the remote tunnel). This probe times, at batch B:

  seq-only        seq[i] in a loop, one final device sync
  seq-nosync      seq[i] in a loop, NO final sync (pure host+dispatch)
  start-only      _start_pooled_batch alone (host draw + 1 dispatch)
  finish-only     _finish_pooled_batch on pre-started states

Usage: python benchmarks/sampler_host_probe.py [batch] [dim] [n]
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
    from multiplanarunet_tpu.sequences import get_sequence

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    import tempfile
    from pathlib import Path

    root = Path(tempfile.mkdtemp(prefix="host_probe_"))
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
        augmenters=None if os.environ.get("MP_PROBE_NOAUG") else [
            {"cls_name": "Elastic2D",
             "kwargs": {"alpha": [0, 450], "sigma": [20, 30],
                        "apply_prob": 0.333}}],
    )
    seq.batch_size = batch
    print(f"device: {jax.devices()[0]} | batch={batch} dim={dim} n={n}",
          flush=True)

    def sync(x):
        np.asarray(jnp.ravel(x)[:1])

    # warmup / compile
    X, y, w = seq[0]
    sync(X)

    t0 = time.time()
    for i in range(n):
        X, y, w = seq[i]
    sync(X)
    print(f"seq-only (synced once): {(time.time() - t0) / n * 1e3:7.1f} "
          f"ms/batch", flush=True)

    t0 = time.time()
    outs = []
    for i in range(n):
        outs.append(seq[i])
    dt_host = (time.time() - t0) / n
    sync(outs[-1][0])
    print(f"seq-nosync (host+dispatch): {dt_host * 1e3:7.1f} ms/batch",
          flush=True)

    t0 = time.time()
    states = [seq._start_pooled_batch() for _ in range(n)]
    print(f"start-only: {(time.time() - t0) / n * 1e3:7.1f} ms/batch",
          flush=True)
    t0 = time.time()
    for st in states:
        X, y, w = seq._finish_pooled_batch(st)
    sync(X)
    print(f"finish-only (synced once): {(time.time() - t0) / n * 1e3:7.1f} "
          f"ms/batch", flush=True)


if __name__ == "__main__":
    main()
