"""Per-stage timing of the 512^3 fused predict path (VERDICT r2 item 2).

Breaks one view's pipeline into its three stages and times each alone
(forcing a real sync after every call — the remote transport's
block_until_ready can return early):

  stack:  shear plane-stack resample (volume -> (512, 512, P_pad, C))
  unet:   U-Net over the plane stack (lax.scan, chunk sweep)
  remap:  slab-scanned gather remap + fusion accumulation (current 512 mode)

Usage: python benchmarks/predict_512_probe.py [size] [chunk ...]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x[..., :1, :1].astype(jnp.float32)))


def main():
    from multiplanarunet_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from multiplanarunet_tpu.image.volume_sampler import VolumeSampler
    from multiplanarunet_tpu.models import UNet, init_model_variables
    from multiplanarunet_tpu.ops import geometry
    from multiplanarunet_tpu.utils.fusion import MultiViewPredictor

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    chunks = [int(c) for c in sys.argv[2:]] or [16]
    n_classes, n_channels = 7, 1

    rng = np.random.RandomState(0)
    volume_np = rng.rand(size, size, size, n_channels).astype(np.float32)
    affine = np.eye(4)

    class _Image:
        def __init__(self):
            self.shape = np.array([size, size, size, n_channels])
            self.affine = affine
            self.interpolator = VolumeSampler(
                volume_np, None, affine, bg_value=[0.0] * n_channels)
            self.predict_mode = True

    image = _Image()
    model = UNet(n_classes=n_classes, dim=size, n_channels=n_channels,
                 depth=4, complexity_factor=2, dtype=jnp.bfloat16)
    variables = init_model_variables(model, rng=jax.random.PRNGKey(0))

    views = geometry.sample_random_views_with_angle_restriction(
        6, 60, rng=np.random.RandomState(42))

    for chunk in chunks:
        predictor = MultiViewPredictor(
            model, variables, sample_dim=size,
            real_space_span=float(size - 1), n_classes=n_classes,
            chunk=chunk)
        sampler = image.interpolator
        offsets, n_valid = predictor._prepare_offsets(image, "same+20")
        bases = [geometry.plane_basis(v, noise_sd=0.0) for v in views]
        true_shape = tuple(int(s) for s in image.shape[:3])
        Mts = [predictor._remap_transform(image, b, true_shape)
               for b in bases]
        fns = predictor._plan_shear_views(image, bases, Mts, offsets,
                                          n_valid)
        print(f"chunk={chunk} P_pad={len(offsets)} n_valid={n_valid} "
              f"shear_plans={'ok' if fns else 'NONE'}", flush=True)
        if fns is None:
            return
        unet_fn = predictor._build_unet_stack()
        volume = sampler.device_volume_unpacked()
        out_shape = tuple(int(s) for s in volume.shape[:3])

        # which remap mode did planning pick per view?
        kinds = []
        for v, (sf, rf) in enumerate(fns):
            kinds.append("shear" if rf.__qualname__.find("_shear_fn") >= 0
                         else "gather-slab")
        print(f"remap kinds: {kinds}", flush=True)

        for v in range(2):  # two views is enough signal
            stack_fn, remap_fn = fns[v]
            w_v = np.ones((n_classes,), np.float32)

            t0 = time.time()
            stack = stack_fn(volume)
            sync(stack)
            t_stack_c = time.time() - t0
            t0 = time.time()
            stack = stack_fn(volume)
            sync(stack)
            t_stack = time.time() - t0

            t0 = time.time()
            pred = unet_fn(variables, stack)
            sync(pred)
            t_unet_c = time.time() - t0
            t0 = time.time()
            pred = unet_fn(variables, stack)
            sync(pred)
            t_unet = time.time() - t0

            del stack
            accum = jnp.zeros(out_shape + (n_classes,), jnp.float32)
            t0 = time.time()
            accum, _ = remap_fn(pred, accum, w_v, want_argmax=False)
            sync(accum)
            t_remap_c = time.time() - t0
            del accum
            accum = jnp.zeros(out_shape + (n_classes,), jnp.float32)
            t0 = time.time()
            accum, _ = remap_fn(pred, accum, w_v, want_argmax=False)
            sync(accum)
            t_remap = time.time() - t0
            del accum, pred

            print(f"view {v}: stack {t_stack:.2f}s (compile+run "
                  f"{t_stack_c:.2f}) | unet {t_unet:.2f}s ({t_unet_c:.2f}) "
                  f"| remap[{kinds[v]}] {t_remap:.2f}s ({t_remap_c:.2f})",
                  flush=True)

        # Rough speed-of-light for the unet stage (scaled from the
        # VERDICT r2 estimate of 2.7e15 FLOPs for 6 x 532 planes at 512^2)
        P = len(offsets)
        flops = 2.7e15 / 6 * (P / 532) * (size / 512) ** 2
        print(f"unet floor at 100% MXU: {flops / 197e12:.2f}s per view",
              flush=True)


if __name__ == "__main__":
    main()
