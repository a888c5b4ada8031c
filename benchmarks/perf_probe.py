"""Stage-level performance probes for the fused predict path (live TPU).

Answers, with measurements rather than guesses:
  A. per-stage wall time of the per-view graph (plane gather / U-Net / remap)
  B. the raw XLA gather throughput ceiling on this chip (rows/s vs row width)
  C. U-Net forward variants (upsample impl, scan chunk size)

Usage: python benchmarks/perf_probe.py [A|B|C ...] [--size 256]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
import time

import numpy as np


def sync(x):
    """Force a real device sync (block_until_ready can return early on the
    remote transport; a scalar fetch cannot)."""
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32
                         else x))


def timeit(fn, n=3, warmup=1):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def setup(size, n_classes=7):
    import jax
    import jax.numpy as jnp

    from multiplanarunet_tpu.models import UNet, init_model_variables

    model = UNet(n_classes=n_classes, dim=size, n_channels=1, depth=4,
                 complexity_factor=2, dtype=jnp.bfloat16)
    variables = init_model_variables(model, rng=jax.random.PRNGKey(0))
    return model, variables


def probe_A(size):
    """Stage split of the per-view graph."""
    import jax
    import jax.numpy as jnp

    from multiplanarunet_tpu.ops import geometry
    from multiplanarunet_tpu.ops.interp import (
        map_view_pred_affine, pack_corners, sample_plane_stack_packed,
    )

    model, variables = setup(size)
    chunk = 32 if size <= 256 else 8
    n_planes = size + 20
    P_pad = -(-n_planes // chunk) * chunk
    span = float(size - 1)
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(size, size, size, 1).astype(np.float32))
    packed = jax.jit(pack_corners)(vol.astype(jnp.bfloat16))
    sync(packed)
    origin = jnp.asarray([-(size - 1) / 2.0] * 3, jnp.float32)
    spacing = jnp.ones(3, jnp.float32)
    rot = jnp.eye(3, dtype=jnp.float32)
    view = geometry.get_random_views(1, rng=np.random.RandomState(1))[0]
    basis = jnp.asarray(geometry.plane_basis(view, noise_sd=0.0))
    bound = (span + 20 * span / (size - 1)) / 2
    offsets = jnp.asarray(np.linspace(-bound, bound, P_pad), jnp.float32)
    fill = jnp.zeros(1, jnp.float32)
    valid = jnp.asarray([size] * 3)

    g_fn = jax.jit(lambda packed: sample_plane_stack_packed(
        packed, origin, spacing, rot, basis, offsets, span, size, fill,
        valid_shape=valid))
    t_gather = timeit(lambda: sync(g_fn(packed)))
    log(f"A.gather  (stack {size}x{size}x{P_pad}): {t_gather * 1e3:.0f} ms")

    stack = g_fn(packed)
    planes = jnp.moveaxis(stack, 2, 0).astype(jnp.bfloat16)

    def unet_fn(planes):
        chunks = planes.reshape(P_pad // chunk, chunk, size, size, 1)

        def body(_, xs):
            return None, model.apply(variables, xs, train=False)

        _, probs = jax.lax.scan(body, None, chunks)
        return probs

    u_fn = jax.jit(unet_fn)
    t_unet = timeit(lambda: sync(u_fn(planes)))
    log(f"A.unet    ({P_pad} planes, chunk {chunk}): {t_unet * 1e3:.0f} ms")

    probs = u_fn(planes)
    pred = jnp.moveaxis(probs.reshape(P_pad, size, size, -1), 0, 2).astype(
        jnp.bfloat16)
    g0 = np.float32(-(span // 2))
    g_step = np.float32((-2.0 * g0) / (size - 1))
    A = np.eye(3, dtype=np.float64)
    center = A @ ((np.asarray([size] * 3) - 1) / 2.0)
    inv_basis = np.linalg.inv(np.asarray(basis, np.float64))
    M = jnp.asarray((inv_basis @ A).astype(np.float32))
    t = jnp.asarray((-inv_basis @ center).astype(np.float32))
    o0 = np.float32(-bound)
    o_step = np.float32(2 * bound / (P_pad - 1))

    r_fn = jax.jit(lambda pred: map_view_pred_affine(
        pred, g0, g_step, o0, o_step, M, t, (size, size, size), n_planes))
    t_remap = timeit(lambda: sync(r_fn(pred)))
    log(f"A.remap   ({size}^3 voxels): {t_remap * 1e3:.0f} ms")
    log(f"A.total per view ~ {(t_gather + t_unet + t_remap) * 1e3:.0f} ms"
        f" -> x6 views = {(t_gather + t_unet + t_remap) * 6:.2f} s")


def probe_B(size):
    """Raw gather ceiling: rows/s for flat row gathers at various widths."""
    import jax
    import jax.numpy as jnp

    n_rows = size * size * (size + 20)
    n_idx = size ** 3
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, n_rows, n_idx).astype(np.int32))
    seq_idx = jnp.asarray(
        (np.arange(n_idx) % n_rows).astype(np.int32))  # sequential
    for width, dtype in ((8, jnp.bfloat16), (16, jnp.bfloat16),
                         (56, jnp.bfloat16)):
        table = jnp.asarray(
            rng.rand(n_rows, width).astype(np.float32)).astype(dtype)
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        dt = timeit(lambda: sync(f(table, idx)))
        dt_seq = timeit(lambda: sync(f(table, seq_idx)))
        log(f"B.gather {n_idx / 1e6:.1f}M rows of ({width},){dtype.__name__}:"
            f" random {dt * 1e3:.0f} ms ({n_idx / dt / 1e6:.0f} M rows/s),"
            f" sequential {dt_seq * 1e3:.0f} ms")
    # Elementwise gather (width 1) and small-table gather for comparison
    table1 = jnp.asarray(rng.rand(n_rows).astype(np.float32))
    f1 = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    dt = timeit(lambda: sync(f1(table1, idx)))
    log(f"B.gather {n_idx / 1e6:.1f}M scalars f32: {dt * 1e3:.0f} ms "
        f"({n_idx / dt / 1e6:.0f} M/s)")
    small = jnp.asarray(rng.rand(64 ** 3, 8).astype(np.float32))
    idx_small = jnp.asarray(rng.randint(0, 64 ** 3, n_idx).astype(np.int32))
    dt = timeit(lambda: sync(f(small, idx_small)))
    log(f"B.gather {n_idx / 1e6:.1f}M rows of (8,)f32 from small "
        f"(1MB) table: {dt * 1e3:.0f} ms ({n_idx / dt / 1e6:.0f} M rows/s)")


def probe_C(size):
    """U-Net forward variants."""
    import jax
    import jax.numpy as jnp

    n_planes = size + 20
    rng = np.random.RandomState(0)

    model, variables = setup(size)
    for chunk in (16, 32, 64):
        P_pad = -(-n_planes // chunk) * chunk
        planes = jnp.asarray(
            rng.rand(P_pad, size, size, 1).astype(np.float32)
        ).astype(jnp.bfloat16)

        def unet_fn(planes, chunk=chunk, P_pad=P_pad):
            chunks = planes.reshape(P_pad // chunk, chunk, size, size, 1)

            def body(_, xs):
                return None, model.apply(variables, xs, train=False)

            _, probs = jax.lax.scan(body, None, chunks)
            return probs

        u_fn = jax.jit(unet_fn)
        try:
            dt = timeit(lambda: sync(u_fn(planes)))
            log(f"C.unet chunk={chunk}: {dt * 1e3:.0f} ms ({P_pad} planes, "
                f"{dt / P_pad * 1e3:.2f} ms/plane)")
        except Exception as e:  # noqa: BLE001
            log(f"C.unet chunk={chunk}: FAILED {e}")


def probe_D(size):
    """Per-level ablation of the U-Net forward: time each encoder/decoder
    block on its real shapes to locate the hot levels."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from multiplanarunet_tpu.models.unet import ConvBNBlock

    B = 32
    cf = float(np.sqrt(2.0))
    rng = np.random.RandomState(0)
    total = 0.0
    # Encoder blocks at each level + the bottom
    shapes = []
    filters = 64
    s = size
    c_in = 1
    for i in range(4):
        c_out = int(filters * cf)
        shapes.append((f"enc_L{i}", s, c_in, c_out))
        c_in, filters, s = c_out, filters * 2, s // 2
    shapes.append(("bottom", s, c_in, int(filters * cf)))
    # Decoder conv pairs see concat(skip, up) channels at doubled spatial
    filters_d = filters
    for i in range(4):
        filters_d //= 2
        s *= 2
        c_cat = int(filters_d * cf) * 2
        shapes.append((f"dec_L{i}", s, c_cat, int(filters_d * cf)))

    for name, s, c_in, c_out in shapes:
        block = ConvBNBlock(c_out, (3, 3), "relu", jnp.bfloat16, name=name)
        x = jnp.asarray(rng.rand(B, s, s, c_in).astype(np.float32)).astype(
            jnp.bfloat16)
        variables = jax.jit(
            lambda r, x: block.init(r, x, train=False))(jax.random.PRNGKey(0), x)
        f = jax.jit(lambda v, x: block.apply(v, x, train=False))
        dt = timeit(lambda: sync(f(variables, x)))
        total += dt
        gmacs = 9 * (c_in * c_out + c_out * c_out) * s * s * B / 1e9
        log(f"D.{name:8s} {s:4d}^2 c{c_in:4d}->{c_out:4d}: {dt * 1e3:6.1f} ms"
            f"  ({2 * gmacs / dt / 1e3:.0f} GFLOP/s... {gmacs:.1f} GMAC)")
    log(f"D.sum of conv blocks: {total * 1e3:.0f} ms for batch {B} "
        f"({total / B * 1e3:.2f} ms/plane)")


def probe_E(size):
    """Shear-resampler primitives: are slice-takes and vmapped dynamic
    slices bandwidth-bound on this chip (vs the per-element gather ceiling)?
    Shapes model one remap pass at `size`^3 x 7 classes bf16."""
    import jax
    import jax.numpy as jnp

    C = 7
    P = size + 32
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.rand(size, size, P * C).astype(np.float32)).astype(
        jnp.bfloat16)  # (X, Y, P*C) — one pass works on the flattened minor
    nbytes = A.size * 2
    log(f"E: pass array {A.shape} bf16 = {nbytes / 1e6:.0f} MB")

    # E1: scale pass — shared index vector along one axis (slice gather)
    idx = jnp.asarray(
        np.clip(np.round(np.arange(size) * 1.08), 0, size - 1).astype(
            np.int32))
    f1 = jax.jit(lambda A, idx: jnp.take(A, idx, axis=1))
    dt = timeit(lambda: sync(f1(A, idx)))
    log(f"E1.slice-take axis1 (shared idx): {dt * 1e3:.0f} ms "
        f"({2 * nbytes / dt / 1e9:.0f} GB/s)")

    # E2: shear pass — per-slab dynamic_slice along the minor axis + lerp
    n_vec = jnp.asarray(rng.randint(0, 24, size).astype(np.int32))
    f_vec = jnp.asarray(rng.rand(size).astype(np.float32))
    out_w = (P - 32) * C

    def shear(A, n_vec, f_vec):
        def per_slab(slab, n, f):
            a = jax.lax.dynamic_slice(slab, (0, n * C), (size, out_w))
            b = jax.lax.dynamic_slice(slab, (0, (n + 1) * C), (size, out_w))
            return (1.0 - f) * a.astype(jnp.float32) + f * b.astype(
                jnp.float32)

        return jax.vmap(per_slab)(A, n_vec, f_vec).astype(jnp.bfloat16)

    f2 = jax.jit(shear)
    dt = timeit(lambda: sync(f2(A, n_vec, f_vec)))
    log(f"E2.vmapped dynamic_slice shear+lerp: {dt * 1e3:.0f} ms "
        f"({3 * nbytes / dt / 1e9:.0f} GB/s)")

    # E3: the same shear via per-element take_along_axis (the bad way)
    k = jnp.arange(P - 32, dtype=jnp.int32)
    idx2 = (n_vec[:, None] + k[None, :])  # (X, P-32)

    def shear_taa(A, idx2):
        A4 = A.reshape(size, size, P, C)
        g = jnp.take_along_axis(A4, idx2[:, None, :, None], axis=2)
        return g

    f3 = jax.jit(shear_taa)
    dt = timeit(lambda: sync(f3(A, idx2)))
    log(f"E3.take_along_axis shear (per-element): {dt * 1e3:.0f} ms")

    # E4: transpose cost (needed if passes must move the minor axis)
    f4 = jax.jit(lambda A: jnp.swapaxes(A.reshape(size, size, P, C), 0, 2))
    dt = timeit(lambda: sync(f4(A)))
    log(f"E4.transpose (swap 0<->2): {dt * 1e3:.0f} ms")


def main():
    from multiplanarunet_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax

    args = [a for a in sys.argv[1:]]
    size = 256
    if "--size" in args:
        i = args.index("--size")
        size = int(args[i + 1])
        del args[i:i + 2]
    which = args or ["A", "B", "C"]
    log(f"device: {jax.devices()[0]}, size={size}")
    for w in which:
        {"A": probe_A, "B": probe_B, "C": probe_C, "D": probe_D,
         "E": probe_E}[w](size)


if __name__ == "__main__":
    main()
