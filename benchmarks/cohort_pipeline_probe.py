"""Measure cohort-level speedup from the predict IO/compute overlap.

`mp predict` overlaps host work for image i+1 (nii decode + scaling +
host->device staging) with device inference of image i via a 1-worker IO
pool (bin/predict.py). This probe times the same loop over a synthetic
cohort of real nii.gz files twice — serial (load/stage inline) vs
pipelined — and reports wall s/volume for both.

Usage: python benchmarks/cohort_pipeline_probe.py [size] [n_images] [stage]
                                                  [modes]
where stage is bf16 (default) or u8 (quantized H2D staging) and modes is
a comma-separated subset of serial,pipelined,pipelined3,combined
(default all) — trimming modes shortens a run's exposure to the remote
transport's bad windows (a wedged transfer RPC can stall a mode for tens
of minutes).
"""
import sys

sys.path.insert(0, ".")
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np


def main():
    from multiplanarunet_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax

    from multiplanarunet_tpu.image import ImagePair, ImagePairLoader
    from multiplanarunet_tpu.io import nifti
    from multiplanarunet_tpu.models import UNet, init_model_variables
    from multiplanarunet_tpu.ops import geometry
    from multiplanarunet_tpu.utils.fusion import MultiViewPredictor

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    stage_dtype = sys.argv[3] if len(sys.argv) > 3 else "bf16"
    modes = (set(sys.argv[4].split(",")) if len(sys.argv) > 4
             else {"serial", "pipelined", "pipelined3", "combined"})
    n_classes, n_channels, n_views = 7, 1, 6

    tmp = Path(tempfile.mkdtemp(prefix="cohort_probe_"))
    rng = np.random.RandomState(0)
    print(f"writing {n_images} {size}^3 nii.gz images to {tmp} ...",
          flush=True)
    for i in range(n_images):
        vol = rng.rand(size, size, size).astype(np.float32)
        nifti.save(vol, tmp / f"img_{i}.nii.gz", affine=np.eye(4))

    def build_loader():
        loader = ImagePairLoader(predict_mode=True, initialize_empty=True)
        for i in range(n_images):
            loader.add_image(ImagePair(str(tmp / f"img_{i}.nii.gz")))
        loader.set_scaler_and_bg_values(bg_value=0.0, scaler="MinMaxScaler",
                                        compute_now=False)
        return loader

    model = UNet(n_classes=n_classes, dim=size, n_channels=n_channels,
                 depth=4, complexity_factor=2,
                 dtype=jax.numpy.bfloat16)
    variables = init_model_variables(model, rng=jax.random.PRNGKey(0))
    views = geometry.sample_random_views_with_angle_restriction(
        n_views, 60, rng=np.random.RandomState(42))
    fusion_params = {"fusion": {
        "W": np.ones((n_views, n_classes), np.float32),
        "b": np.zeros((1, n_classes), np.float32),
    }}
    predictor = MultiViewPredictor(
        model, variables, sample_dim=size, real_space_span=float(size - 1),
        n_classes=n_classes, stage_dtype=stage_dtype)
    print(f"stage_dtype={stage_dtype}")
    predictor.mesh = None

    def predict_one(image):
        fused, _ = predictor.predict_image(
            image, views, fusion_params=fusion_params, n_planes="same+20",
            return_per_view=False)
        return fused

    # Warmup / compile on one image
    loader = build_loader()
    img0 = loader.get_by_id("img_0")
    img0.load()
    t0 = time.time()
    predict_one(img0)
    img0.unload()
    print(f"warmup (compile) {time.time() - t0:.1f} s", flush=True)

    def run_serial():
        loader = build_loader()
        t0 = time.time()
        for i in range(n_images):
            img = loader.get_by_id(f"img_{i}")
            img.load()
            predictor.prestage(img, views)
            fused = predict_one(img)
            assert fused.shape[:3] == (size, size, size)
            img.unload()
        return time.time() - t0

    def run_pipelined():
        loader = build_loader()
        pool = ThreadPoolExecutor(max_workers=1)

        def _preload(idx):
            if idx < n_images:
                img = loader.get_by_id(f"img_{idx}")
                img.load()
                predictor.prestage(img, views)
                return img
            return None

        t0 = time.time()
        nxt = pool.submit(_preload, 0)
        for i in range(n_images):
            img = nxt.result()
            nxt = pool.submit(_preload, i + 1)
            fused = predict_one(img)
            assert fused.shape[:3] == (size, size, size)
            img.unload()
        dt = time.time() - t0
        pool.shutdown(wait=False)
        return dt

    def run_pipelined3():
        """Input pool + deferred-fetch output pool (the bin/predict.py
        structure): fetch of image i-1's result overlaps compute of i."""
        loader = build_loader()
        in_pool = ThreadPoolExecutor(max_workers=1)
        out_pool = ThreadPoolExecutor(max_workers=1)

        def _preload(idx):
            if idx < n_images:
                img = loader.get_by_id(f"img_{idx}")
                img.load()
                predictor.prestage(img, views)
                return img
            return None

        def _finalize(img, fetch):
            fused = fetch()
            assert fused.shape[:3] == (size, size, size)
            img.unload()

        t0 = time.time()
        nxt = in_pool.submit(_preload, 0)
        out = None
        for i in range(n_images):
            img = nxt.result()
            nxt = in_pool.submit(_preload, i + 1)
            if out is not None:
                out.result()
            fetch, _ = predictor.predict_image(
                img, views, fusion_params=fusion_params,
                n_planes="same+20", return_per_view=False,
                defer_fetch=True)
            out = out_pool.submit(_finalize, img, fetch)
        out.result()
        dt = time.time() - t0
        in_pool.shutdown(wait=False)
        out_pool.shutdown(wait=False)
        return dt

    def run_pipelined_combined():
        """3-stage overlap on a SINGLE IO thread: fetch of image i-1's
        result THEN staging of image i+1 run back-to-back on one worker
        while the device computes image i — same overlap as pipelined-3
        but with no two host threads ever transferring concurrently (the
        remote transport serializes, and can error, on concurrent
        transfers)."""
        loader = build_loader()
        pool = ThreadPoolExecutor(max_workers=1)

        def _io(prev_img, prev_fetch, idx):
            if prev_fetch is not None:
                fused = prev_fetch()
                assert fused.shape[:3] == (size, size, size)
                prev_img.unload()
            if idx < n_images:
                img = loader.get_by_id(f"img_{idx}")
                img.load()
                predictor.prestage(img, views)
                return img
            return None

        t0 = time.time()
        nxt = pool.submit(_io, None, None, 0)
        for i in range(n_images):
            img = nxt.result()
            fetch, _ = predictor.predict_image(
                img, views, fusion_params=fusion_params,
                n_planes="same+20", return_per_view=False,
                defer_fetch=True)
            nxt = pool.submit(_io, img, fetch, i + 1)
        nxt.result()
        dt = time.time() - t0
        pool.shutdown(wait=False)
        return dt

    # Interleave to cancel drift; report best of 2 each
    runners = {"serial": run_serial, "pipelined": run_pipelined,
               "pipelined3": run_pipelined3,
               "combined": run_pipelined_combined}
    times = {m: [] for m in runners if m in modes}
    for _ in range(2):
        for m, fn in runners.items():
            if m in modes:
                times[m].append(fn())
                print(f"  [{m}] {times[m][-1]:.2f} s cohort", flush=True)
    best = {m: min(v) for m, v in times.items()}
    for m, t in best.items():
        print(f"{m + ':':<13} {t:.2f} s cohort  "
              f"({t / n_images:.2f} s/volume)")
    s = best.get("serial")
    if s:
        print("speedup:      " + "  ".join(
            f"{s / t:.2f}x ({m})" for m, t in best.items()
            if m != "serial"))


if __name__ == "__main__":
    main()
