"""Interleaved same-process A/B of the dilated decoder inside the REAL
fused 6-view predict (bench.py workload). The transport window drifts
minutes-scale (VALIDATION 23), so arms alternate A,B,A,B,... and are
compared pairwise.

Usage: python benchmarks/dilated_ab.py [size] [pairs]
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

    from multiplanarunet_tpu.image.volume_sampler import VolumeSampler
    from multiplanarunet_tpu.models import UNet, init_model_variables
    from multiplanarunet_tpu.ops import geometry
    from multiplanarunet_tpu.utils.fusion import MultiViewPredictor

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
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
    model = UNet(n_classes=n_classes, dim=size, n_channels=1, depth=4,
                 complexity_factor=2, dtype=jnp.bfloat16)
    variables = init_model_variables(model, rng=jax.random.PRNGKey(0))
    views = geometry.sample_random_views_with_angle_restriction(
        n_views, 60, rng=np.random.RandomState(42))
    fusion_params = {"fusion": {
        "W": np.ones((n_views, n_classes), np.float32),
        "b": np.zeros((1, n_classes), np.float32)}}

    def make(flag):
        os.environ["MP_PREDICT_DILATED"] = flag
        return MultiViewPredictor(
            model, variables, sample_dim=size,
            real_space_span=float(size - 1), n_classes=n_classes)

    pred_a, pred_b = make("0"), make("1")
    print(f"A naive dilated_upconv={pred_a.model.dilated_upconv} | "
          f"B dilated dilated_upconv={pred_b.model.dilated_upconv}",
          flush=True)

    def run(p):
        t0 = time.time()
        p.predict_image(image, views, fusion_params=fusion_params,
                        n_planes="same+20", return_per_view=False)
        return time.time() - t0

    print(f"warmup A {run(pred_a):.2f} s | warmup B {run(pred_b):.2f} s",
          flush=True)
    deltas = []
    for i in range(pairs):
        ta, tb = run(pred_a), run(pred_b)
        deltas.append(ta - tb)
        print(f"  pair {i}: naive {ta:.3f} s  dilated {tb:.3f} s  "
              f"delta {ta - tb:+.3f}", flush=True)
    print(f"mean pairwise delta (naive - dilated): "
          f"{np.mean(deltas):+.3f} s  (median {np.median(deltas):+.3f})",
          flush=True)


if __name__ == "__main__":
    main()
