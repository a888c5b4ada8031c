"""Measure the host<->device transport bandwidth of this environment.

The predict cohort pipeline is gated by the tunnel that carries H2D volume
staging and D2H result fetches (CLAUDE.md: ~15 MB/s nominal, but it swings
by multiples run-to-run). This probe times raw device_put / np.asarray
round trips at the exact sizes the 256^3 predict path ships:

- H2D: uint8 volume staging, 16 MiB (256^3 x 1 channel, u8 stage_dtype)
- D2H: nibble-packed fused class map, 8 MiB (256^3 / 2)

and prints MB/s for each plus the implied serial transfer seconds per
volume. Compare against the compute floor (bench.py) to bound what any
software pipeline can achieve: per-volume wall >= max(compute,
non-overlappable transfer).

Usage: python benchmarks/transport_probe.py [n_reps]
"""
import sys

sys.path.insert(0, ".")
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    dev = jax.devices()[0]
    print(f"device: {dev}")

    h2d = np.random.RandomState(0).randint(
        0, 255, size=(256, 256, 256), dtype=np.uint8)

    h2d_mb = h2d.nbytes / 1e6
    d2h_mb = 256 * 256 * 128 / 1e6

    import functools

    @functools.partial(jax.jit, static_argnums=())
    def _make(v):
        return jnp.full((256, 256, 128), v, jnp.uint8)

    for rep in range(n_reps):
        t0 = time.time()
        buf = jax.device_put(h2d, dev)
        float(jnp.sum(buf[:1, :1, :1]))
        t_h2d = time.time() - t0

        # Fresh device array each rep: jax.Array caches its host copy, so
        # re-fetching the same buffer would time a no-op after rep 0.
        d2h_dev = _make(jnp.uint8(rep + 3))
        float(jnp.sum(d2h_dev[:1, :1, :1]))  # sync compute out of the timing
        t0 = time.time()
        host = np.asarray(d2h_dev)
        t_d2h = time.time() - t0
        assert host[0, 0, 0] == rep + 3

        total = t_h2d + t_d2h
        print(f"rep {rep}: H2D {h2d_mb:.0f} MB in {t_h2d:.2f} s "
              f"({h2d_mb / t_h2d:.1f} MB/s) | "
              f"D2H {d2h_mb:.0f} MB in {t_d2h:.2f} s "
              f"({d2h_mb / t_d2h:.1f} MB/s) | "
              f"serial transfer {total:.2f} s/volume", flush=True)
        del buf


if __name__ == "__main__":
    main()
