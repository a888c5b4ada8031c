"""Measure the async predict pipeline: cohort wall time with the IO-thread
prefetch (decode + scale + device staging of image i+1 overlapped with
inference of image i, as `mp predict` does) vs a fully serial loop.

Usage:  python benchmarks/predict_pipeline_probe.py [n_images] [size]

Writes toy volumes to a temp dir so the probe includes the real nii.gz
decode cost, then times both loops over the same cohort on the live device.
"""

from __future__ import annotations

import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from multiplanarunet_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax

    from multiplanarunet_tpu.bin.toy_data import create_toy_image
    from multiplanarunet_tpu.image import ImagePairLoader
    from multiplanarunet_tpu.io import nifti
    from multiplanarunet_tpu.models import UNet, init_model_variables
    from multiplanarunet_tpu.ops import geometry
    from multiplanarunet_tpu.utils.fusion import MultiViewPredictor

    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    dim = 128
    n_views = 3
    n_classes = 4

    root = Path(tempfile.mkdtemp(prefix="pipe_probe_"))
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.RandomState(0)
    for i in range(n_images):
        img, lab = create_toy_image(size, n_channels=1, rng=rng)
        nifti.save(img.astype(np.float32), root / "images" / f"im{i}.nii.gz",
                   affine=np.eye(4))
        nifti.save(lab.astype(np.uint8), root / "labels" / f"im{i}.nii.gz",
                   affine=np.eye(4))
    log(f"cohort: {n_images} x {size}^3 at {root}")

    import jax.numpy as jnp

    model = UNet(n_classes=n_classes, dim=dim, n_channels=1, depth=4,
                 complexity_factor=2, dtype=jnp.bfloat16)
    variables = init_model_variables(model, rng=jax.random.PRNGKey(0))
    views = geometry.sample_random_views_with_angle_restriction(
        n_views, 60, rng=np.random.RandomState(42))
    predictor = MultiViewPredictor(
        model, variables, sample_dim=dim, real_space_span=float(size - 1),
        n_classes=n_classes, chunk=32,
    )

    def fresh_loader():
        loader = ImagePairLoader(base_dir=str(root), predict_mode=True)
        loader.set_scaler_and_bg_values("1pct", "RobustScaler")
        return loader

    def predict_one(img):
        fused, _ = predictor.predict_image(
            img, views, n_planes="same+8", return_per_view=False)
        return fused

    def load_and_stage(img):
        img.load()
        predictor.prestage(img, views, n_planes="same+8")
        return img

    # Warm all compiled graphs on the first image (not timed)
    loader = fresh_loader()
    img0 = load_and_stage(loader.images[0])
    predict_one(img0)
    img0.unload()
    img0.interpolator  # no-op; keep linters quiet

    def run_serial():
        loader = fresh_loader()
        t0 = time.time()
        for img in loader.images:
            load_and_stage(img)
            predict_one(img)
            img.unload()
        return time.time() - t0

    def run_pipelined():
        loader = fresh_loader()
        pool = ThreadPoolExecutor(max_workers=1)
        imgs = list(loader.images)
        t0 = time.time()
        nxt = pool.submit(load_and_stage, imgs[0])
        for i in range(len(imgs)):
            img = nxt.result()
            if i + 1 < len(imgs):
                nxt = pool.submit(load_and_stage, imgs[i + 1])
            predict_one(img)
            img.unload()
        pool.shutdown()
        return time.time() - t0

    results = {}
    for name, fn in (("serial", run_serial), ("pipelined", run_pipelined),
                     ("serial2", run_serial), ("pipelined2", run_pipelined)):
        dt = fn()
        results[name] = dt
        log(f"{name}: {dt:.2f} s ({dt / n_images:.2f} s/image)")
    serial = min(results["serial"], results["serial2"])
    piped = min(results["pipelined"], results["pipelined2"])
    print(f"serial {serial:.2f} s, pipelined {piped:.2f} s, "
          f"speedup {serial / piped:.2f}x over {n_images} x {size}^3")


if __name__ == "__main__":
    main()
