"""Sweep the predict-graph U-Net chunk size (planes per lax.scan step).

The fused predict graph runs the U-Net over the plane stack in chunks; the
chunk trades MXU occupancy (bigger batch on the early, memory-bound levels)
against pad waste (P is padded up to a chunk multiple) and VMEM/HBM
pressure. Times ONLY the scan'd U-Net forward on a 276-plane 256^2 stack.

Usage: python benchmarks/unet_chunk_probe.py [dim] [chunk ...]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from multiplanarunet_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from multiplanarunet_tpu.models import UNet, init_model_variables

    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    chunks = [int(c) for c in sys.argv[2:]] or [16, 32, 64, 92, 138]
    n_classes, n_channels = 7, 1
    n_planes = dim + 20

    model = UNet(n_classes=n_classes, dim=dim, n_channels=n_channels,
                 depth=4, complexity_factor=2, dtype=jnp.bfloat16)
    variables = init_model_variables(model, rng=jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    stack = jnp.asarray(
        rng.rand(n_planes, dim, dim, n_channels).astype(np.float32)
    ).astype(jnp.bfloat16)

    for chunk in chunks:
        P_pad = -(-n_planes // chunk) * chunk
        planes = jnp.concatenate(
            [stack, jnp.zeros((P_pad - n_planes, dim, dim, n_channels),
                              stack.dtype)], 0)

        @jax.jit
        def fwd(planes, chunk=chunk, P_pad=P_pad):
            cs = planes.reshape(P_pad // chunk, chunk, dim, dim, n_channels)

            def body(_, x):
                return None, model.apply(variables, x, train=False)

            _, probs = jax.lax.scan(body, None, cs)
            return probs.reshape(P_pad, dim, dim, n_classes)

        out = fwd(planes)
        float(jnp.sum(out[0, 0, 0]))  # force full sync
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = fwd(planes)
        float(jnp.sum(out[:, 0, 0]))
        dt = (time.time() - t0) / reps
        print(f"chunk {chunk:4d} (P_pad {P_pad:4d}): {dt * 1e3:7.1f} ms "
              f"per 276-plane stack  ({dt / P_pad * 1e3:.2f} ms/plane)",
              flush=True)


if __name__ == "__main__":
    main()
