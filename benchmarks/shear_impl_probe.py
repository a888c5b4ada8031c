"""Time the two shear-pass implementations (take_along_axis vs MXU einsum)
on the live device at bench-like shapes (256^3 remap + plane-stack plans).

Usage: python benchmarks/shear_impl_probe.py [size]
"""
import sys

sys.path.insert(0, ".")
import time

import numpy as np


def main():
    from multiplanarunet_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from multiplanarunet_tpu.ops import geometry
    from multiplanarunet_tpu.ops.shear import (
        plan_plane_stack,
        plan_view_remap,
        shear_resample,
    )

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    size = int(args[0]) if args else 256
    dim, n_classes, P_pad = size, 7, size + 32
    span = float(size - 1)
    g0 = float(-(span // 2))
    g_step = (-2.0 * g0) / (dim - 1)
    bounds = (span + 20 * span / (dim - 1)) / 2
    offs = np.linspace(-bounds, bounds, size + 20)
    o0, o_step = float(offs[0]), float(offs[1] - offs[0])
    origin = -(np.array([size] * 3) - 1) / 2.0
    spacing = np.ones(3)
    views = geometry.sample_random_views_with_angle_restriction(
        6, 60, rng=np.random.RandomState(42))

    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(size, size, size, 1).astype(np.float32)
                      ).astype(jnp.bfloat16)
    pred = jnp.asarray(
        rng.rand(dim, dim, P_pad, n_classes).astype(np.float32)
    ).astype(jnp.bfloat16)

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    def time_fn(fn, *args):
        out = fn(*args)
        sync(out)
        t0 = time.time()
        for _ in range(3):
            out = fn(*args)
        sync(out)
        return (time.time() - t0) / 3

    for v, view in enumerate(views):
        basis = geometry.plane_basis(view, noise_sd=0.0)
        s_plan, s_Nc = plan_plane_stack(
            basis, np.eye(3), origin, spacing, g0, g_step, o0, o_step,
            (size, size, size), dim, P_pad)
        A = np.eye(3)
        center = A @ ((np.array([size] * 3) - 1) / 2.0)
        inv_b = np.linalg.inv(basis.astype(np.float64))
        M, t = inv_b @ A, -inv_b @ center
        r_plan, r_Nc = plan_view_remap(
            M, t, g0, g_step, o0, o_step, (dim, dim, P_pad),
            (size, size, size))
        fill1 = np.zeros(1, np.float32)
        fillc = np.eye(n_classes, dtype=np.float32)[0]
        row = [f"view {v}:"]
        impls = ("take", "matmul", "pallas") if "--pallas" in sys.argv \
            else ("take", "matmul")
        for impl in impls:
            fs = jax.jit(lambda x, p=s_plan, b=s_Nc, i=impl: shear_resample(
                x, p, fill1, method="cubic", compute_dtype=jnp.bfloat16,
                exact_bounds=b + ((size,) * 3,), impl=i))
            fr = jax.jit(lambda x, p=r_plan, b=r_Nc, i=impl: shear_resample(
                x, p, fillc, method="linear", compute_dtype=jnp.bfloat16,
                out_dtype=jnp.float32,
                exact_bounds=b + ((dim, dim, size + 20),), impl=i))
            ts = time_fn(fs, vol)
            tr = time_fn(fr, pred)
            row.append(f"{impl}: stack {ts * 1e3:6.1f} ms  "
                       f"remap {tr * 1e3:6.1f} ms")
        print("   ".join(row), flush=True)


if __name__ == "__main__":
    main()
