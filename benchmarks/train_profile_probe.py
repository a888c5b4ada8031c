"""Attribute the training step time (VERDICT r2 item 3).

Times, separately and end-to-end, on toy data at the reference-default
training shape (batch 16, dim 128, depth-4 cf=2 U-Net):

  sampler.candidates   _pool_candidate_labels kernel + presence fetch
  sampler.select       host accept/retry loop
  sampler.image        sample_plane_batch_pool kernel
  sampler.augment      elastic augmentation + prepare_batches
  sampler.total        full __getitem__
  step.device          jitted train step on a staged batch
  e2e                  trainer-style loop (prefetch thread) steps/s

Usage: python benchmarks/train_profile_probe.py [batch] [dim] [steps]
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
    from multiplanarunet_tpu.image import ImagePairLoader
    from multiplanarunet_tpu.image.queue import EagerQueue
    from multiplanarunet_tpu.logging import ScreenLogger
    from multiplanarunet_tpu.models import UNet, init_model_variables
    from multiplanarunet_tpu.parallel import get_mesh
    from multiplanarunet_tpu.sequences import get_sequence
    from multiplanarunet_tpu.train import Trainer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    import tempfile
    from pathlib import Path

    root = Path(tempfile.mkdtemp(prefix="train_probe_"))
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
    mesh = get_mesh(jax.devices()[:1])
    trainer = Trainer(model, variables, logger=ScreenLogger(False),
                      mesh=mesh)
    trainer.compile_model(
        optimizer="Adam", optimizer_kwargs={"lr": 1e-4},
        loss="SparseCategoricalCrossentropy",
        metrics=["sparse_categorical_accuracy"])

    def sync_tree(t):
        for x in jax.tree_util.tree_leaves(t):
            if hasattr(x, "block_until_ready"):
                np.asarray(jnp.ravel(x)[:1])

    # ---- sampler decomposition: wrap the pooled path's stage functions
    import multiplanarunet_tpu.sequences.multi_planar as mp_seq

    stats = {}

    def timed(name, fn, sync_out=None):
        def w(*a, **k):
            t0 = time.time()
            out = fn(*a, **k)
            # skip the sync when called under an outer jit trace
            # (sample_plane_batch_pool runs inside _pool_candidate_labels)
            traced = any(isinstance(leaf, jax.core.Tracer)
                         for leaf in jax.tree_util.tree_leaves(out))
            if sync_out is not None and not traced:
                np.asarray(jnp.ravel(sync_out(out))[:1])
            if not traced:
                stats.setdefault(name, []).append(time.time() - t0)
            return out

        return w

    orig_cand = mp_seq._pool_candidate_labels
    mp_seq._pool_candidate_labels = timed(
        "candidates", orig_cand, sync_out=lambda o: o[1])
    orig_img = mp_seq.sample_plane_batch_pool
    mp_seq.sample_plane_batch_pool = timed(
        "image", orig_img, sync_out=lambda o: o)
    seq.augment = timed("augment", seq.augment,
                        sync_out=lambda o: o[0])
    seq.select_candidate = timed("select", seq.select_candidate)

    t_get = []
    for i in range(6):
        t0 = time.time()
        X, y, w = seq[i]
        sync_tree((X, y))
        t_get.append(time.time() - t0)
    print(f"sampler.total per batch: {min(t_get):.3f}s "
          f"(runs {[round(t, 3) for t in t_get]})", flush=True)
    for name, ts_ in stats.items():
        per_batch = np.sum(ts_) / 6
        print(f"  sampler.{name}: {per_batch:.4f}s/batch "
              f"(min call {min(ts_):.4f})", flush=True)
    mp_seq._pool_candidate_labels = orig_cand
    mp_seq.sample_plane_batch_pool = orig_img
    del seq.augment, seq.select_candidate  # restore class methods
    stats.clear()

    # ---- train step alone on a staged batch
    X, y, w = seq[0]
    state = trainer.state
    t0 = time.time()
    state, logs = trainer.train_step(state, X, y, np.asarray(w))
    sync_tree(logs)
    print(f"step.compile+run: {time.time() - t0:.3f}s", flush=True)
    ts = []
    for _ in range(5):
        t0 = time.time()
        state, logs = trainer.train_step(state, X, y, np.asarray(w))
        sync_tree(logs)
        ts.append(time.time() - t0)
    print(f"step.device per step: {min(ts):.3f}s "
          f"(runs {[round(t, 3) for t in ts]})", flush=True)
    trainer.state = state

    # fwd+bwd FLOPs rough: 3x fwd; fwd ~ sum over convs. Use XLA's count.
    try:
        comp = jax.jit(trainer.train_step).lower(
            state, X, y, np.asarray(w)).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        if ca and "flops" in ca:
            fl = ca["flops"]
            print(f"step flops {fl / 1e12:.2f}T -> "
                  f"{fl / 1e12 / min(ts):.1f} TFLOP/s "
                  f"({fl / 1e12 / min(ts) / 197 * 100:.0f}% of bf16 peak)",
                  flush=True)
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", flush=True)

    # ---- end-to-end loop with pipelined prefetch (trainer style)
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    # depth > 1 is unsafe: the remote transport rejects concurrent
    # transfers, and the sequence pipelines its own candidate round-trips
    for depth in (1,):
        state = trainer.state
        with ThreadPoolExecutor(max_workers=depth) as pool:
            futures = deque(pool.submit(seq.__getitem__, i)
                            for i in range(depth))
            t0 = time.time()
            for s in range(steps):
                X, y, w = futures.popleft().result()
                if s + depth < steps:
                    futures.append(pool.submit(seq.__getitem__, s + depth))
                state, logs = trainer.train_step(state, X, y,
                                                 np.asarray(w))
            sync_tree(logs)
            dt = (time.time() - t0) / steps
        print(f"e2e per step (depth {depth}): {dt:.3f}s -> "
              f"{batch / dt:.1f} images/s", flush=True)


if __name__ == "__main__":
    main()
