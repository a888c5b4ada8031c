"""Interleaved same-process A/B of the 512^3 big-volume strategies
(VERDICT r3 items 4 + 8).

Arms (alternating per round so transport-window drift cancels):

  default   auto channel grouping (group 2 at 7 classes) + view
            inflight=2 pipeline — the round-3 production mode
  width7    MP_SHEAR_CH_GROUP=7: FULL-width bf16 remap (one group) —
            halves the pass count the grouped remap pays per view
  mega      MP_FUSE_BIG=1: the fused multi-view megagraph even above the
            big-volume threshold (one compile, ~3 RPCs/volume; XLA sees
            whole liveness so the eager-queue HBM hazard that motivated
            the per-view drain does not apply). OOM is caught and
            reported as a result, not a crash.

All arms share ONE predictor: the shear-fn cache keys on (plan,
ch_group) and the mega cache on fn ids, so switching env between calls
is safe. Usage: python benchmarks/big_volume_ab.py [size] [rounds]
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

    from multiplanarunet_tpu.image.volume_sampler import VolumeSampler
    from multiplanarunet_tpu.models import UNet, init_model_variables
    from multiplanarunet_tpu.ops import geometry
    from multiplanarunet_tpu.utils.fusion import MultiViewPredictor

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_views, n_classes = 6, 7
    rng = np.random.RandomState(0)
    volume = rng.rand(size, size, size, 1).astype(np.float32)

    class _Image:
        shape = np.array([size, size, size, 1])
        affine = np.eye(4)
        predict_mode = True

        def __init__(self):
            self.interpolator = VolumeSampler(volume, None, self.affine,
                                              bg_value=[0.0])

    image = _Image()
    import jax.numpy as jnp

    model = UNet(n_classes=n_classes, dim=size, n_channels=1, depth=4,
                 complexity_factor=2, dtype=jnp.bfloat16)
    variables = init_model_variables(model, rng=jax.random.PRNGKey(0))
    views = geometry.sample_random_views_with_angle_restriction(
        n_views, 60, rng=np.random.RandomState(42))
    fusion_params = {"fusion": {
        "W": np.ones((n_views, n_classes), np.float32),
        "b": np.zeros((1, n_classes), np.float32)}}
    predictor = MultiViewPredictor(
        model, variables, sample_dim=size, real_space_span=float(size - 1),
        n_classes=n_classes)

    ARMS = ("default", "width7", "mega")

    def run(arm):
        os.environ.pop("MP_SHEAR_CH_GROUP", None)
        os.environ.pop("MP_FUSE_BIG", None)
        if arm == "width7":
            os.environ["MP_SHEAR_CH_GROUP"] = "7"
        elif arm == "mega":
            os.environ["MP_FUSE_BIG"] = "1"
        t0 = time.time()
        try:
            predictor.predict_image(
                image, views, fusion_params=fusion_params,
                n_planes="same+20", return_per_view=False)
            return time.time() - t0
        except Exception as e:  # noqa: BLE001 — OOM is a RESULT here
            # Run-time HBM OOM (RESOURCE_EXHAUSTED) or compile-time OOM
            # surfaced as an INTERNAL remote-compile failure (measured
            # 2026-08-19: the 512^3 6-view megagraph needs 20.59 GB of
            # HBM temps vs 15.75 available — compile refuses)
            if ("RESOURCE_EXHAUSTED" in repr(e)
                    or "Out of memory" in repr(e)
                    or (arm == "mega" and "INTERNAL" in repr(e))):
                print(f"  {arm}: OOM/compile-failure after "
                      f"{time.time() - t0:.1f} s: {repr(e)[:160]}",
                      flush=True)
                import gc

                gc.collect()
                return None
            raise
        finally:
            os.environ.pop("MP_SHEAR_CH_GROUP", None)
            os.environ.pop("MP_FUSE_BIG", None)

    times = {a: [] for a in ARMS}
    for a in ARMS:
        t = run(a)
        print(f"warmup {a}: "
              f"{'OOM' if t is None else f'{t:.1f} s'}", flush=True)
        if t is None:
            times[a] = None
    for r in range(rounds):
        for a in ARMS:
            if times[a] is None:
                continue
            t = run(a)
            if t is None:
                times[a] = None
                continue
            times[a].append(t)
            print(f"  round {r} {a}: {t:.2f} s", flush=True)
    for a in ARMS:
        if times[a]:
            print(f"{a}: median {np.median(times[a]):.2f} s "
                  f"(n={len(times[a])})", flush=True)
        elif times[a] is None:
            print(f"{a}: OOM", flush=True)


if __name__ == "__main__":
    main()
