"""Pallas TPU kernel for one elementary shear pass (banded resample).

A shear pass contracts axis `m` of a rank-4 array A against a BANDED
interpolation matrix W[q, t, s] = K(s - pos(q, t)), pos = alpha*(t+out_lo)
+ beta*(q+q_lo) + gamma - in_lo (ops/shear.py). The XLA `impl="matmul"`
executor materializes the full (nq, T, S) W in HBM and runs a dense einsum
— S times wider than the kernel's 2/4-tap support. This Pallas kernel
exploits the band:

- grid over (r, q, t) output tiles;
- per tile, one async DMA pulls ONLY the source window
  [s0, s0 + S_TILE) that the tile's tap support can touch (s0 computed on
  the host per (t, q) tile from the pass coefficients, passed via scalar
  prefetch so the index math is resolved before the kernel body runs);
- W is evaluated in VMEM registers from iota (never touches HBM);
- the contraction runs on the MXU per q-row of the tile.

Out-of-range taps (outside [0, L_in)) get kernel weight 0 against the
window's zero... no — they fall outside the DMA window entirely; the host
guarantees the window covers the full in-range tap support of every
position in the tile, so dropping everything outside the window equals the
dense impl's treatment of taps outside [0, L_in).

Falls back to interpret mode off-TPU (tests run it on CPU bit-for-bit
against the take/matmul executors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _largest_divisor(n, cap):
    for d in range(min(n, cap), 0, -1):
        if n % d == 0:
            return d
    return 1


def _support(method):
    """(lo, hi) tap offsets relative to floor(pos)."""
    if method == "linear":
        return 0, 1
    if method == "cubic":
        return -1, 2
    raise ValueError(f"pallas pass does not support method {method!r}")


def _kernel_weights_f32(x, method):
    ax = jnp.abs(x)
    if method == "linear":
        return jnp.maximum(1.0 - ax, 0.0)
    near = 1.5 * ax ** 3 - 2.5 * ax ** 2 + 1.0
    far = -0.5 * ax ** 3 + 2.5 * ax ** 2 - 4.0 * ax + 2.0
    return jnp.where(ax <= 1.0, near, jnp.where(ax <= 2.0, far, 0.0))


def _plan_tiles(op, q_extent, r_extent, n_ch, method):
    """Host-side tile planning for one pass.

    Returns (TT, QB, RB, S_TILE, s_start) where s_start is an
    (n_t_tiles, n_q_tiles) int32 array of window starts along the pass
    axis, guaranteed to cover every in-range tap of the tile."""
    T, L_in = op.out_extent, op.in_extent
    TT = _largest_divisor(T, 128)
    QB = _largest_divisor(q_extent, 8) if op.q is not None else 1
    # r x C rides as the minor (lane-ish) extent of the matmul
    rb_cap = max(1, 4096 // max(1, n_ch))
    RB = _largest_divisor(r_extent, min(r_extent, rb_cap))
    lo_off, hi_off = _support(method)

    n_t, n_q = T // TT, q_extent // QB if op.q is not None else 1
    ts = np.arange(T, dtype=np.float64)
    pos_t = op.alpha * (ts + op.out_lo) + op.gamma - op.in_lo
    qs = np.arange(q_extent, dtype=np.float64) + op.q_lo
    beta_q = op.beta * qs if op.q is not None else np.zeros(1)

    span = 0
    s_start = np.zeros((n_t, n_q), np.int64)
    s_hi_all = np.zeros((n_t, n_q), np.int64)
    for ti in range(n_t):
        pt = pos_t[ti * TT:(ti + 1) * TT]
        for qi in range(n_q):
            bq = beta_q[qi * QB:(qi + 1) * QB] if op.q is not None \
                else beta_q
            lo = np.floor(pt.min() + bq.min()) + lo_off
            hi = np.floor(pt.max() + bq.max()) + hi_off
            s_lo = max(0, int(lo))
            s_hi = min(L_in - 1, int(hi))
            if s_hi < s_lo:  # tile entirely out of range
                s_lo, s_hi = 0, 0
            s_start[ti, qi] = s_lo
            s_hi_all[ti, qi] = s_hi
            span = max(span, s_hi - s_lo + 1)
    S_TILE = min(L_in, -(-span // 8) * 8)
    s_start = np.minimum(s_start, L_in - S_TILE)
    assert np.all(s_hi_all <= s_start + S_TILE - 1)
    return TT, QB, RB, S_TILE, s_start.astype(np.int32)


@functools.lru_cache(maxsize=512)
def _build_pass_call(key):
    """Compile-cached pallas_call for one (pass geometry, shapes) config.

    key: (m, q, alpha, beta, gamma, out_lo, in_lo, q_lo, L_in, T,
          full_shape, TT, QB, RB, S_TILE, method, dtype_name, interpret)"""
    (m, q, alpha, beta, gamma, out_lo, in_lo, q_lo, L_in, T,
     full_shape, TT, QB, RB, S_TILE, method, dtype_name, interpret) = key
    dtype = jnp.dtype(dtype_name)
    # Axis roles in the rank-4 array (C last). r = the spatial axis that is
    # neither m nor q (with no q, fold both remaining axes via r0/r1).
    spatial = [0, 1, 2]
    spatial.remove(m)
    if q is not None:
        spatial.remove(q)
        (r,) = spatial
    else:
        r = spatial[0]  # grid over this one; the other rides in the block
        r2 = spatial[1]
    C = full_shape[3]

    n_t = T // TT
    n_q = (full_shape[q] // QB) if q is not None else 1
    n_r = full_shape[r] // RB

    # Block shapes in array-axis order
    win_shape = [0, 0, 0, C]
    out_blk = [0, 0, 0, C]
    win_shape[m], out_blk[m] = S_TILE, TT
    if q is not None:
        win_shape[q] = out_blk[q] = QB
        win_shape[r] = out_blk[r] = RB
    else:
        win_shape[r] = out_blk[r] = RB
        win_shape[r2] = out_blk[r2] = full_shape[r2]

    def out_index(ri, qi, ti, *_pref):
        idx = [0, 0, 0, 0]
        idx[m] = ti
        if q is not None:
            idx[q] = qi
        idx[r] = ri
        return tuple(idx)

    def kernel(s_start_ref, a_any, out_ref, win, sem):
        ri = pl.program_id(0)
        qi = pl.program_id(1)
        ti = pl.program_id(2)
        s0 = s_start_ref[ti, qi]

        sl = [slice(None)] * 4
        sl[m] = pl.ds(s0, S_TILE)
        if q is not None:
            sl[q] = pl.ds(qi * QB, QB)
        sl[r] = pl.ds(ri * RB, RB)
        cp = pltpu.make_async_copy(a_any.at[tuple(sl)], win, sem)
        cp.start()
        cp.wait()

        # Positions of this tile (QBx x TT), window-relative
        t_idx = jax.lax.broadcasted_iota(jnp.float32, (QB, TT), 1) \
            + (ti * TT + out_lo)
        pos = alpha * t_idx + gamma - in_lo
        if q is not None:
            qv = jax.lax.broadcasted_iota(jnp.float32, (QB, TT), 0) \
                + (qi * QB + q_lo)
            pos = pos + beta * qv
        pos = pos - s0.astype(jnp.float32)
        s_idx = jax.lax.broadcasted_iota(jnp.float32, (QB, TT, S_TILE), 2)
        W = _kernel_weights_f32(s_idx - pos[..., None], method)
        # Taps landing outside [0, L_in) carry no data (dense-impl parity);
        # the window covers all in-range taps by construction
        s_abs = s_idx + s0.astype(jnp.float32)
        W = jnp.where((s_abs >= 0) & (s_abs <= L_in - 1), W, 0.0)
        W = W.astype(dtype)

        x = win[:]  # window block, array-axis order
        # Move to canonical (q-block, S_TILE, lanes) / no-q: (S_TILE, lanes)
        perm = ([q, m, r] if q is not None else [m, r, r2]) + [3]
        xc = jnp.transpose(x, perm)
        if q is not None:
            xc = xc.reshape(QB, S_TILE, RB * C)
            out = jax.lax.dot_general(
                W, xc, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (QB, TT, RB*C)
            out = out.reshape(QB, TT, RB, C).astype(dtype)
            inv = np.argsort(perm).tolist()
            out_ref[:] = jnp.transpose(out, inv)
        else:
            R2 = full_shape[r2]
            xc = xc.reshape(S_TILE, RB * R2 * C)
            out = jax.lax.dot_general(
                W[0], xc, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TT, RB*R2*C)
            out = out.reshape(TT, RB, R2, C).astype(dtype)
            inv = np.argsort(perm).tolist()
            out_ref[:] = jnp.transpose(out, inv)

    out_shape_full = list(full_shape)
    out_shape_full[m] = T

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_r, n_q, n_t),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(tuple(out_blk), out_index,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(tuple(win_shape), dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(tuple(out_shape_full), dtype),
        grid_spec=grid_spec,
        interpret=bool(interpret),
    )


def pass_pallas(A, op, method="linear", interpret=None):
    """Pallas executor for one shear pass — same semantics as
    `ops.shear._pass_jnp` (rank-4 A, channels last incl. validity)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    m, q = op.m, op.q
    spatial = [a for a in (0, 1, 2) if a != m and a != q]
    q_extent = A.shape[q] if q is not None else 1
    r_extent = A.shape[spatial[0]]
    n_ch = A.shape[3] * (A.shape[spatial[1]] if q is None else 1)
    TT, QB, RB, S_TILE, s_start = _plan_tiles(
        op, q_extent, r_extent, n_ch, method)
    key = (m, q, float(op.alpha), float(op.beta), float(op.gamma),
           float(op.out_lo), float(op.in_lo), float(op.q_lo),
           int(op.in_extent), int(op.out_extent),
           tuple(int(s) for s in A.shape), TT, QB, RB, S_TILE, method,
           str(A.dtype), bool(interpret))
    call = _build_pass_call(key)
    return call(jnp.asarray(s_start), A)
