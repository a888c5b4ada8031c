"""Pallas TPU kernel for one elementary shear pass (banded resample).

A shear pass contracts axis `m` of a rank-4 array A against a BANDED
interpolation matrix W[q, t, s] = K(s - pos(q, t)), pos = alpha*(t+out_lo)
+ beta*(q+q_lo) + gamma - in_lo (ops/shear.py). The XLA `impl="matmul"`
executor materializes the full (nq, T, S) W in HBM and runs a dense einsum
— S times wider than the kernel's 2/4-tap support. This Pallas kernel
exploits the band:

- the wrapper canonicalizes A to (Q, S, R*C) with one XLA transpose
  (bandwidth-trivial next to the contraction; Mosaic's reshape/layout
  rules make in-kernel axis shuffles a losing game);
- grid over (q, rc, t) output tiles;
- per tile, one async DMA pulls ONLY the source window
  [s0, s0 + S_TILE) that the tile's tap support can touch (s0 computed on
  the host per (t, q) tile from the pass coefficients, delivered via
  scalar prefetch);
- the window DMA is DOUBLE-BUFFERED across grid steps: each step first
  issues the copy for the NEXT tile into the other slot, then waits on
  its own — the HBM pull of tile i+1 overlaps tile i's MXU contraction
  (tile arithmetic intensity sits near the v5e ridge point, so the
  serial start/wait variant was ~2x off its own roofline and lost to
  the XLA dense einsum 18 vs 10.6 ms on the 6-pass 256^3 probe);
- W is evaluated in VMEM from iota (never touches HBM);
- one 2D MXU dot per q row of the tile.

Taps outside [0, L_in) get weight 0 (dense-impl parity); the host
guarantees the window covers the full in-range tap support of every
position in the tile.

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


def _largest_divisor(n, cap, quantum=1):
    """Largest divisor of n that is <= cap and a multiple of quantum;
    falls back to n itself (Mosaic block dims must be quantum-aligned OR
    equal to the full array dim)."""
    for d in range(min(n, cap), 0, -1):
        if n % d == 0 and d % quantum == 0:
            return d
    return n


def _support(method):
    """(lo, hi) tap offsets relative to floor(pos)."""
    if method == "linear":
        return 0, 1
    if method == "cubic":
        return -1, 2
    raise ValueError(f"pallas pass does not support method {method!r}")


def _kernel_weights_f32(x, method):
    # Single source of truth for the interpolation kernels — the matmul
    # and pallas executors must never diverge numerically
    from multiplanarunet_tpu.ops.shear import _kernel_weights

    return _kernel_weights(x, method, jnp)


def _plan_tiles(alpha, beta, gamma, out_lo, in_lo, q_lo, T, L_in,
                q_extent, rc_extent, method):
    """Host-side tile planning for one pass.

    Returns (TT, QB, RCB, S_TILE, s_start) where s_start is an
    (n_t_tiles, n_q_tiles) int32 array of window starts along the pass
    axis, guaranteed to cover every in-range tap of the tile."""
    TT = _largest_divisor(T, 128, quantum=8)
    QB = _largest_divisor(q_extent, 8)
    # rc_extent is pre-padded to a multiple of 128 by the wrapper (lane
    # tiling applies to DMA slices along the minor dim)
    RCB = _largest_divisor(rc_extent, min(rc_extent, 512), quantum=128)
    lo_off, hi_off = _support(method)

    n_t, n_q = T // TT, q_extent // QB
    ts = np.arange(T, dtype=np.float64)
    pos_t = alpha * (ts + out_lo) + gamma - in_lo
    beta_q = beta * (np.arange(q_extent, dtype=np.float64) + q_lo)

    # Window starts must be 8-aligned (HBM sublane tiling on the sliced
    # dim); the wrapper pads the canonical S up to S_pad = ceil8(L_in)
    # (padded taps carry kernel weight 0, so they never contribute)
    S_pad = -(-L_in // 8) * 8
    span = 0
    s_start = np.zeros((n_t, n_q), np.int64)
    s_hi_all = np.zeros((n_t, n_q), np.int64)
    for ti in range(n_t):
        pt = pos_t[ti * TT:(ti + 1) * TT]
        for qi in range(n_q):
            bq = beta_q[qi * QB:(qi + 1) * QB]
            lo = np.floor(pt.min() + bq.min()) + lo_off
            hi = np.floor(pt.max() + bq.max()) + hi_off
            s_lo = (max(0, int(lo)) // 8) * 8
            s_hi = min(L_in - 1, int(hi))
            if s_hi < s_lo:  # tile entirely out of range
                s_lo, s_hi = 0, 0
            s_start[ti, qi] = s_lo
            s_hi_all[ti, qi] = s_hi
            span = max(span, s_hi - s_lo + 1)
    S_TILE = min(S_pad, -(-span // 8) * 8)
    s_start = np.minimum(s_start, S_pad - S_TILE)
    assert np.all(s_hi_all <= s_start + S_TILE - 1)
    return TT, QB, RCB, S_TILE, S_pad, s_start.astype(np.int32)


@functools.lru_cache(maxsize=512)
def _build_pass_call(key):
    """Compile-cached pallas_call for one (pass geometry, shapes) config.

    Operates on canonical (Q, S_pad, RC) input -> (Q, T, RC) output.
    key: (alpha, beta, gamma, out_lo, in_lo, q_lo, L_in, T, Q, RC,
          TT, QB, RCB, S_TILE, S_pad, method, dtype_name, interpret)"""
    (alpha, beta, gamma, out_lo, in_lo, q_lo, L_in, T, Q, RC,
     TT, QB, RCB, S_TILE, S_pad, method, dtype_name, interpret) = key
    dtype = jnp.dtype(dtype_name)
    n_t, n_q, n_rc = T // TT, Q // QB, RC // RCB

    def kernel(s_start_ref, a_any, out_ref, win, sem):
        qi = pl.program_id(0)
        ri = pl.program_id(1)
        ti = pl.program_id(2)
        # Double-buffered window pipeline: grid steps run sequentially
        # (last grid dim innermost) and scratch/semaphores persist across
        # them, so step s issues step s+1's window copy into the other
        # slot before waiting on its own — DMA rides under the MXU dot.
        step = (qi * n_rc + ri) * n_t + ti
        total = n_q * n_rc * n_t

        def dma_for(s, slot):
            t2 = jax.lax.rem(s, n_t)
            r2 = jax.lax.rem(s // n_t, n_rc)
            q2 = s // (n_t * n_rc)
            s0 = pl.multiple_of(s_start_ref[t2, q2], 8)
            return pltpu.make_async_copy(
                a_any.at[pl.ds(q2 * QB, QB), pl.ds(s0, S_TILE),
                         pl.ds(r2 * RCB, RCB)],
                win.at[slot], sem.at[slot],
            )

        slot = jax.lax.rem(step, 2)

        @pl.when(step == 0)
        def _():
            dma_for(step, slot).start()

        @pl.when(step + 1 < total)
        def _():
            dma_for(step + 1, 1 - slot).start()

        dma_for(step, slot).wait()

        s0 = pl.multiple_of(s_start_ref[ti, qi], 8)
        # Tile positions (QB x TT), window-relative. Mosaic iota is
        # integer-typed; cast after.
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (QB, TT), 1
                                         ).astype(jnp.float32) \
            + ((ti * TT).astype(jnp.float32) + out_lo)
        qv = jax.lax.broadcasted_iota(jnp.int32, (QB, TT), 0
                                      ).astype(jnp.float32) \
            + ((qi * QB).astype(jnp.float32) + q_lo)
        pos = alpha * t_idx + beta * qv + (gamma - in_lo) \
            - s0.astype(jnp.float32)
        s_idx = jax.lax.broadcasted_iota(jnp.int32, (QB, TT, S_TILE), 2
                                         ).astype(jnp.float32)
        W = _kernel_weights_f32(s_idx - pos[..., None], method)
        # Taps landing outside [0, L_in) carry no data (dense-impl parity)
        s_abs = s_idx + s0.astype(jnp.float32)
        W = jnp.where((s_abs >= 0) & (s_abs <= L_in - 1), W, 0.0)
        W = W.astype(dtype)

        # One batched MXU contraction over the QB rows
        res = jax.lax.dot_general(
            W, win[slot],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (QB, TT, RCB)
        out_ref[:] = res.astype(dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_q, n_rc, n_t),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (QB, TT, RCB), lambda qi, ri, ti, *_: (qi, ti, ri),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, QB, S_TILE, RCB), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    del S_pad  # input is already padded by the wrapper
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Q, T, RC), dtype),
        grid_spec=grid_spec,
        interpret=bool(interpret),
    )


def pass_pallas(A, op, method="linear", interpret=None):
    """Pallas executor for one shear pass — same semantics as
    `ops.shear._pass_jnp` (rank-4 A, channels last incl. validity)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    m, q = op.m, op.q
    beta, q_lo = float(op.beta), float(getattr(op, "q_lo", 0) or 0)
    spatial = [a for a in (0, 1, 2) if a != m and a != q]
    if q is None:  # synthesize a coefficient-free q axis (single code path)
        q, beta, q_lo = spatial[0], 0.0, 0.0
        spatial = spatial[1:]
    r = spatial[0]
    Q, S, R, C = A.shape[q], A.shape[m], A.shape[r], A.shape[3]
    T = int(op.out_extent)
    RC = R * C
    RC_pad = -(-RC // 128) * 128

    TT, QB, RCB, S_TILE, S_pad, s_start = _plan_tiles(
        float(op.alpha), beta, float(op.gamma), float(op.out_lo),
        float(op.in_lo), q_lo, T, int(op.in_extent), Q, RC_pad, method)
    key = (float(op.alpha), beta, float(op.gamma), float(op.out_lo),
           float(op.in_lo), q_lo, int(op.in_extent), T, Q, RC_pad,
           TT, QB, RCB, S_TILE, S_pad, method, str(A.dtype),
           bool(interpret))
    call = _build_pass_call(key)

    # Canonicalize (XLA-land; bandwidth-trivial next to the contraction);
    # pad S to a multiple of 8 (DMA window starts are sublane-aligned) and
    # RC to a multiple of 128 (lane tiling applies to DMA slice extents)
    At = jnp.transpose(A, (q, m, r, 3)).reshape(Q, S, RC)
    if S_pad != S or RC_pad != RC:
        At = jnp.pad(At, ((0, 0), (0, S_pad - S), (0, RC_pad - RC)))
    out = call(jnp.asarray(s_start), At)
    out = out[:, :, :RC].reshape(Q, T, R, C)
    inv = np.argsort((q, m, r, 3))
    return jnp.transpose(out, tuple(int(i) for i in inv))
