"""Shear-decomposed affine resampling (the non-gather resampler).

Both hot resampling stages of multi-planar inference — plane-stack
extraction (volume -> oblique plane stack) and prediction remapping (plane
stack -> voxel grid) — are affine warps of regular grids. The natural XLA
formulation is a per-point gather, but measured on a v5e the XLA gather
ceiling is ~54-71 M rows/s regardless of layout (benchmarks/perf_probe.py,
probe B), which pins both stages at ~250 ms per view at 256^3.

This module instead factors the affine index map into a sequence of
ELEMENTARY passes, each resampling along ONE axis `m` at positions
``alpha * t + beta * v[q] + gamma`` where `q` is one OTHER axis. Such a
pass is a `take_along_axis` whose index array varies along only two of the
array's axes — XLA lowers it to large contiguous slices (bandwidth-bound)
rather than per-element gathers (probe E3: the same op with full-rank
indices costs ~10x more). A general 3x3 affine needs at most 6 shear + 3
scale passes (Gaussian elimination; the pivot permutation is a free array
transpose).

Out-of-bounds handling: a validity channel rides along as an extra channel;
reads outside the stored data zero both data and validity, and the final
step replaces low-validity voxels with the caller's fill vector (dividing
surviving voxels by their validity so border blending stays unbiased).

Accuracy: with method="linear" every pass blends linearly; the composition
is a separable approximation of trilinear interpolation. The exact-gather
kernels in `ops.interp` remain available for parity-critical evaluation
(reference semantics: `mpunet/utils/fusion/fuse_and_predict.py:92-137`).
"""

from __future__ import annotations

from itertools import permutations

import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------ factorization
class _Op:
    """One elementary pass: resample axis `m` at alpha*t + beta*v[q] + gamma.

    All geometry is resolved at plan time (static in the compiled program)."""

    __slots__ = ("m", "q", "alpha", "beta", "gamma",
                 "in_extent", "in_lo", "out_extent", "out_lo", "q_lo")

    def __init__(self, m, q, alpha, beta):
        self.m, self.q = m, q
        self.alpha, self.beta = float(alpha), float(beta)
        self.gamma = 0.0

    def matrix(self):
        M = np.eye(3)
        M[self.m, self.m] = self.alpha
        if self.q is not None:
            M[self.m, self.q] = self.beta
        return M

    def __repr__(self):
        return (f"Op(m={self.m}, q={self.q}, a={self.alpha:.4f}, "
                f"b={self.beta:.4f}, g={self.gamma:.4f}, "
                f"in={getattr(self, 'in_extent', '?')}"
                f"@{getattr(self, 'in_lo', '?')}, "
                f"out={getattr(self, 'out_extent', '?')}"
                f"@{getattr(self, 'out_lo', '?')})")


_ELIM_ORDER = [(1, 0), (2, 0), (2, 1), (0, 1), (0, 2), (1, 2)]
# The last op touching each row also carries that row's scale (alpha) —
# folding the diag into the shears makes a general affine SIX passes, not
# 6 shears + 3 scales (each pass is a full HBM roundtrip).
_FINAL_FOR_ROW = {(2, 1), (0, 2), (1, 2)}


def _peel(Np):
    """Factor Np = E(1,0) E(2,0) E(2,1) E(0,1) E(0,2) E(1,2), the product
    taken in EXECUTION order (first executed = leftmost factor). Each E is
    identity except row m = (alpha at m, beta at q); row-reduction of Np to
    the identity by E^-1 steps (row_m <- (row_m - beta*row_q)/alpha) gives
    the coefficients. Returns (ops, ok)."""
    R = np.array(Np, np.float64)
    ops = []
    for (m, q) in _ELIM_ORDER:
        piv = R[q, q]
        if abs(piv) < 1e-9:
            return None, False
        beta = R[m, q] / piv
        R[m, :] = R[m, :] - beta * R[q, :]
        alpha = 1.0
        if (m, q) in _FINAL_FOR_ROW:
            alpha = R[m, m]
            if abs(alpha) < 1e-9:
                return None, False
            R[m, :] = R[m, :] / alpha
        ops.append(_Op(m, q, alpha, beta))
    off = R - np.eye(3)
    if np.max(np.abs(off)) > 1e-6 * max(1.0, float(np.max(np.abs(Np)))):
        return None, False
    return ops, True


def _compose(ops):
    """Composite (M, t): A_K[v] = A_0[M v + t] for ops in execution order."""
    M = np.eye(3)
    t = np.zeros(3)
    for op in ops:
        E = op.matrix()
        g = np.zeros(3)
        g[op.m] = op.gamma
        t = M @ g + t
        M = M @ E
    return M, t


def factor_affine(N):
    """Pick a row permutation + elementary-op sequence whose composite
    matrix equals N[perm, :], minimizing the largest |coefficient| (bounds
    intermediate extent growth). Returns (perm, ops) or (None, None)."""
    N = np.asarray(N, np.float64)
    best = None
    for perm in permutations(range(3)):
        ops, ok = _peel(N[list(perm), :])
        if not ok:
            continue
        worst = max(
            max(abs(o.beta) for o in ops),
            max(max(abs(o.alpha), 1.0 / abs(o.alpha)) for o in ops),
        )
        if best is None or worst < best[0]:
            best = (worst, perm, ops)
    if best is None:
        return None, None
    return best[1], best[2]


# ------------------------------------------------------------------ planning
class ShearPlan:
    """Static execution plan for one (N, c, src_shape, out_shape) resample."""

    __slots__ = ("perm", "out_perm", "ops", "src_shape", "out_shape",
                 "src_t_shape", "valid", "stages")

    def __repr__(self):
        body = "\n  ".join(repr(o) for o in self.ops)
        return (f"ShearPlan(perm={self.perm}, out_perm={self.out_perm}, "
                f"valid={self.valid},\n  {body})")


def _finish_plan(plan, perm, out_perm, ops, c_rp, out_shape_p, round_extent):
    """Solve translations + interval bookkeeping for one factorization.
    `out_shape_p` is the PLANNED (column-permuted) output box; plan.out_shape
    stays the true one (the executor transposes back at the end)."""
    plan.perm = perm
    plan.out_perm = out_perm
    plan.ops = ops

    # Solve gammas for the translation on one op per output axis (the last
    # op touching each axis — their translation effects span R^3)
    gamma_ops, seen = [], set()
    for op in reversed(ops):
        if op.m not in seen:
            seen.add(op.m)
            gamma_ops.append(op)
    _, base_t = _compose(ops)
    cols = []
    for g_op in gamma_ops:
        g_op.gamma = 1.0
        _, t1 = _compose(ops)
        cols.append(t1 - base_t)
        g_op.gamma = 0.0
    gammas = np.linalg.solve(np.stack(cols, axis=1), c_rp - base_t)
    for g_op, g in zip(gamma_ops, gammas):
        g_op.gamma = float(g)

    # ---- interval bookkeeping -------------------------------------------
    src_t_shape = tuple(plan.src_shape[p] for p in perm)
    plan.src_t_shape = src_t_shape
    K = len(ops)

    # Backward need B[i]: indices stage i must answer for. Margins cover the
    # widest tap footprint (cubic: [floor(pos)-1, floor(pos)+2]).
    B = [None] * (K + 1)
    B[K] = [(0.0, float(out_shape_p[a] - 1)) for a in range(3)]
    for i in range(K, 0, -1):
        op = ops[i - 1]
        prev = list(B[i])
        vm = B[i][op.m]
        vq = B[i][op.q] if op.q is not None else (0.0, 0.0)
        cands_m = [op.alpha * vm[0], op.alpha * vm[1]]
        cands_q = [op.beta * vq[0], op.beta * vq[1]]
        lo = min(cands_m) + min(cands_q) + op.gamma - 1.0
        hi = max(cands_m) + max(cands_q) + op.gamma + 2.0
        prev[op.m] = (np.floor(lo), np.ceil(hi))
        B[i - 1] = prev

    # Forward data D[i]: indices of stage i that can hold real data
    D = [None] * (K + 1)
    D[0] = [(0.0, float(src_t_shape[a] - 1)) for a in range(3)]
    for i in range(1, K + 1):
        op = ops[i - 1]
        cur = list(D[i - 1])
        sm = D[i - 1][op.m]
        vq = cur[op.q] if op.q is not None else (0.0, 0.0)
        lo = sm[0] - max(op.beta * vq[0], op.beta * vq[1]) - op.gamma
        hi = sm[1] - min(op.beta * vq[0], op.beta * vq[1]) - op.gamma
        lo, hi = sorted((lo / op.alpha, hi / op.alpha))
        cur[op.m] = (np.floor(lo) - 2.0, np.ceil(hi) + 2.0)
        D[i] = cur

    # Desired stored interval per stage/axis = B ∩ D (clamped non-empty)
    want = []
    for i in range(K + 1):
        row = []
        for a in range(3):
            lo = max(B[i][a][0], D[i][a][0])
            hi = min(B[i][a][1], D[i][a][1])
            if hi < lo:
                lo, hi = 0.0, 1.0
            row.append((lo, hi))
        want.append(row)
    # Boundary stages are fixed: A_0 = transposed source, A_K = output box
    want[0] = [(0.0, float(src_t_shape[a] - 1)) for a in range(3)]
    want[K] = [(0.0, float(out_shape_p[a] - 1)) for a in range(3)]

    # An op only changes its own axis, so along every other axis the stored
    # window must be IDENTICAL between consecutive stages. For each axis,
    # stages split into segments at the passes acting on it; within a
    # segment use the union of wants (boundary stages pin their segment).
    stages = [[None] * 3 for _ in range(K + 1)]
    for a in range(3):
        seg_start = 0
        boundaries = [i + 1 for i, op in enumerate(ops) if op.m == a]
        for seg_end in boundaries + [K + 1]:
            seg = range(seg_start, min(seg_end, K + 1))
            lo = min(want[i][a][0] for i in seg)
            hi = max(want[i][a][1] for i in seg)
            lo_i = int(np.floor(lo))
            length = int(np.ceil(hi)) - lo_i + 1
            if round_extent and 0 not in seg and K not in seg:
                length = -(-length // round_extent) * round_extent
            if 0 in seg:
                lo_i, length = 0, src_t_shape[a]
            if K in seg:
                lo_i, length = 0, out_shape_p[a]
            for i in seg:
                stages[i][a] = (lo_i, length)
            seg_start = seg_end
    plan.stages = stages

    for i, op in enumerate(ops):
        op.in_lo, op.in_extent = stages[i][op.m]
        op.out_lo, op.out_extent = stages[i + 1][op.m]
        op.q_lo = stages[i + 1][op.q][0] if op.q is not None else 0
    return plan


def plan_affine_resample(N, c, src_shape, out_shape, round_extent=16):
    """Plan passes realizing out[v] = src[N v + c] (fill outside).

    N, c take an OUTPUT index to a SOURCE fractional index. Intermediate
    extents round up to `round_extent` so nearby views share compiled
    shapes. plan.valid False => numerically singular; use the gather path.

    Searches all (source-axis, output-axis) permutation pairs — the source
    perm is a free input transpose, the output perm a cheap final
    transpose — and keeps the factorization with the smallest total stage
    footprint (the passes are bandwidth-bound, so stage voxels ~ runtime).
    """
    N = np.asarray(N, np.float64)
    c = np.asarray(c, np.float64)
    plan = ShearPlan()
    plan.src_shape = tuple(int(s) for s in src_shape)
    plan.out_shape = tuple(int(s) for s in out_shape)

    best = None
    for out_perm in permutations(range(3)):
        Nc = N[:, list(out_perm)]
        out_shape_p = tuple(plan.out_shape[k] for k in out_perm)
        for perm in permutations(range(3)):
            ops, ok = _peel(Nc[list(perm), :])
            if not ok:
                continue
            cand = ShearPlan()
            cand.src_shape = plan.src_shape
            cand.out_shape = plan.out_shape
            cand.valid = True
            try:
                _finish_plan(cand, perm, out_perm, ops, c[list(perm)],
                             out_shape_p, round_extent)
            except np.linalg.LinAlgError:
                continue
            # Score: (alias tier, footprint). A pass with |alpha| > 1
            # subsamples its axis (aliasing — linear/cubic taps skip source
            # samples), so alias-free factorizations (every |alpha| <= 1)
            # win outright; footprint breaks ties. Float math — ill-
            # conditioned candidates produce extents that overflow int64.
            alias = max(1.0, max(abs(o.alpha) for o in ops))
            cost = sum(
                float(np.prod([float(e) for (_, e) in st]))
                for st in cand.stages
            )
            score = (round(alias, 6), cost)
            if best is None or score < best[0]:
                best = (score, cand)
    if best is None:
        plan.valid = False
        plan.perm, plan.out_perm, plan.ops, plan.stages = None, None, [], []
        return plan
    return best[1]


# ------------------------------------------------------------------ executors
def _tap_parts(pos, xp, method):
    """(index, weight) taps for one pass at fractional positions `pos`.
    method: 'nearest' (1 tap), 'linear' (2), 'cubic' (Catmull-Rom, 4 —
    sharper composition: separable linear passes stack ~3 lerps per axis,
    tripling the blur variance of joint trilinear; Catmull-Rom keeps the
    passband flat and is exact on cubic fields)."""
    if method == "nearest":
        if xp is np:
            return [(np.round(pos).astype(np.int64), None)]
        return [(xp.round(pos).astype(xp.int32), None)]
    i0f = xp.floor(pos)
    f = pos - i0f
    idx0 = i0f.astype(np.int64 if xp is np else xp.int32)
    if method == "linear":
        return [(idx0, 1.0 - f), (idx0 + 1, f)]
    if method != "cubic":
        raise ValueError(f"unknown method {method!r}")
    f2, f3 = f * f, f * f * f
    return [
        (idx0 - 1, -0.5 * f + f2 - 0.5 * f3),
        (idx0, 1.0 - 2.5 * f2 + 1.5 * f3),
        (idx0 + 1, 0.5 * f + 2.0 * f2 - 1.5 * f3),
        (idx0 + 2, -0.5 * f2 + 0.5 * f3),
    ]


def _lift(x, m, q, L_out):
    """(nq, L_out) plane -> rank-4 array with L_out at axis m, nq at axis q
    (q may be None), 1 elsewhere (broadcast form for take_along_axis)."""
    nq = x.shape[0]
    shape = [1, 1, 1, 1]
    shape[m] = L_out
    if q is not None:
        shape[q] = nq
        if q > m:
            x = x.T  # flat order must follow increasing axis order
    return x.reshape(shape)


def _pass_positions(A, op, xp):
    """Fractional source positions of one pass: (nq, L_out) (nq=1 if the
    pass has no q dependence)."""
    L_out = op.out_extent
    t = xp.arange(L_out, dtype=xp.float32)
    pos = op.alpha * (t + op.out_lo) + op.gamma - op.in_lo
    if op.q is not None:
        b = xp.arange(A.shape[op.q], dtype=xp.float32) + op.q_lo
        return pos[None, :] + op.beta * b[:, None]
    return pos[None, :]


def _kernel_weights(x, method, xp):
    """Interpolation kernel evaluated at signed offsets x (tap - position)."""
    ax = xp.abs(x)
    if method == "linear":
        return xp.maximum(1.0 - ax, 0.0)
    if method == "cubic":  # Catmull-Rom (a = -0.5)
        near = 1.5 * ax ** 3 - 2.5 * ax ** 2 + 1.0
        far = -0.5 * ax ** 3 + 2.5 * ax ** 2 - 4.0 * ax + 2.0
        return xp.where(ax <= 1.0, near, xp.where(ax <= 2.0, far, 0.0))
    raise ValueError(f"method {method!r} has no kernel-weight form")


def _pass_jnp(A, op, method="linear", impl="take"):
    """Apply one elementary pass to A (rank 4, channels last, validity as
    the last channel — zeros outside data make masked reads correct).

    impl="take": per-tap take_along_axis (bandwidth-bound; best on CPU and
    for `nearest`). impl="matmul": build the (nq, L_out, L_in) banded
    interpolation matrix from the kernel in-graph and contract it on the
    MXU — on TPU the matmul units are effectively free next to HBM
    bandwidth, so the pass becomes one dense contraction with no
    gather/select work at all (out-of-range taps simply have zero weight)."""
    m, q = op.m, op.q
    L_out, L_in = op.out_extent, op.in_extent
    if impl == "pallas" and method != "nearest":
        from multiplanarunet_tpu.ops.pallas_shear import pass_pallas

        return pass_pallas(A, op, method)
    pos = _pass_positions(A, op, jnp)
    if impl == "matmul" and method != "nearest":
        s = jnp.arange(L_in, dtype=jnp.float32)
        W = _kernel_weights(s[None, None, :] - pos[..., None], method, jnp)
        W = W.astype(A.dtype)  # (nq, L_out, L_in)
        labels = ["a", "b", "c", "d"]
        in_sub = list(labels)
        in_sub[m] = "s"
        out_sub = list(labels)
        out_sub[m] = "t"
        w_sub = (labels[q] if q is not None else "") + "ts"
        if q is None:
            W = W[0]
        return jnp.einsum(
            f"{w_sub},{''.join(in_sub)}->{''.join(out_sub)}", W, A,
            preferred_element_type=jnp.float32,
        ).astype(A.dtype)
    parts = _tap_parts(pos, jnp, method)
    out = None
    for idx, w in parts:
        valid = (idx >= 0) & (idx < L_in)
        g = jnp.take_along_axis(
            A, _lift(jnp.clip(idx, 0, L_in - 1), m, q, L_out), axis=m
        )
        term = g * _lift(valid, m, q, L_out).astype(A.dtype)
        if w is not None:
            term = term * _lift(w, m, q, L_out).astype(A.dtype)
        out = term if out is None else out + term
    return out


def exact_inside_mask(N, c, src_shape, out_shape):
    """Boolean inside-mask computed in closed form: a voxel is inside iff
    N v + c lies within [0, n-1] on every source axis (the exact gather
    rule, `ops.interp._index_parts`). Affine in v -> built from iota."""
    N = np.asarray(N, np.float64)
    c = np.asarray(c, np.float64)
    X, Y, Z = out_shape
    ii = jnp.arange(X, dtype=jnp.float32)[:, None, None]
    jj = jnp.arange(Y, dtype=jnp.float32)[None, :, None]
    kk = jnp.arange(Z, dtype=jnp.float32)[None, None, :]
    inside = True
    for a in range(3):
        r = (np.float32(N[a, 0]) * ii + np.float32(N[a, 1]) * jj
             + np.float32(N[a, 2]) * kk + np.float32(c[a]))
        inside = inside & (r >= 0.0) & (r <= np.float32(src_shape[a] - 1))
    return inside


def shear_resample(src, plan: ShearPlan, fill, method="linear",
                   compute_dtype=jnp.float32, exact_bounds=None,
                   out_dtype=None, impl="take"):
    """Execute a ShearPlan on device.

    src: (S0, S1, S2, C). Returns out_shape + (C,) in out_dtype (defaults
    to compute_dtype) with `fill` (C,) where the map lands outside src.
    Jittable; `plan` must be closed over (static). compute_dtype=bfloat16
    halves the bandwidth of every pass (the passes are bandwidth-bound);
    the final validity division then runs in out_dtype.

    exact_bounds: optional (N, c) or (N, c, bounds_shape) of the planned
    affine; when given, the inside/outside decision uses the closed-form
    exact rule (agrees with the gather path) instead of the carried
    validity channel, which erodes ~1 voxel per pass at volume borders.
    bounds_shape overrides src's shape in the rule (e.g. to treat padded
    tail planes as out-of-bounds)."""
    C = src.shape[-1]
    out_dtype = out_dtype or compute_dtype
    A = src.astype(compute_dtype)
    valid0 = jnp.ones(A.shape[:3] + (1,), compute_dtype)
    if exact_bounds is not None and len(exact_bounds) > 2:
        bshape = tuple(int(s) for s in exact_bounds[2])
        if bshape != tuple(src.shape[:3]):
            # src is bucket-padded beyond its true extent: zero BOTH the
            # data and the validity there, so blending taps that reach
            # past the true upper edge renormalize out via the final
            # validity division (mirror of the lower-edge window
            # masking). With validity 1 on zero pads, a cubic tap within
            # 2 voxels of the true edge darkens intensities by up to ~6%;
            # on the remap side the padded tail planes hold U-Net outputs
            # of padded inputs — garbage that must not blend in.
            mask = valid0
            for a, (size, lim) in enumerate(zip(src.shape[:3], bshape)):
                if size != lim:
                    idx = jnp.arange(size) < lim
                    mask = mask * idx.astype(compute_dtype).reshape(
                        tuple(size if i == a else 1 for i in range(3))
                        + (1,))
            valid0 = mask
            A = A * valid0
    A = jnp.concatenate([A, valid0], axis=-1)
    A = jnp.transpose(A, plan.perm + (3,))
    for op in plan.ops:
        A = _pass_jnp(A, op, method, impl=impl)
    if plan.out_perm != (0, 1, 2):
        inv = tuple(int(i) for i in np.argsort(plan.out_perm))
        A = jnp.transpose(A, inv + (3,))
    data = A[..., :C].astype(out_dtype)
    valid = A[..., C].astype(out_dtype)
    if exact_bounds is not None:
        N, c = exact_bounds[0], exact_bounds[1]
        bshape = exact_bounds[2] if len(exact_bounds) > 2 else plan.src_shape
        ok = exact_inside_mask(N, c, bshape, plan.out_shape)
    else:
        ok = valid > 0.5
    # Undo border darkening (blending with zero pads) by dividing by the
    # carried validity; clamp so exact-inside voxels with tiny validity
    # (deep shear corners) stay bounded
    safe = jnp.maximum(valid, 0.05)[..., None]
    fill = jnp.asarray(fill, out_dtype)
    return jnp.where(ok[..., None], data / safe, fill)


# ------------------------------------------------- application-level planners
def plan_plane_stack(basis, rot, origin, spacing, g0, g_step, o0, o_step,
                     vol_shape, dim, n_planes):
    """Plan the FORWARD resample: volume (X,Y,Z) -> oblique plane stack
    (dim, dim, n_planes). Plane sample (i, j, p) sits at real position
    u*(g0+i*g_step) + v*(g0+j*g_step) + n_hat*(o0+p*o_step), rotated by
    `rot` and converted to voxel indices via (pos - origin)/spacing
    (the shear equivalent of `ops.interp.sample_plane_stack_packed`).

    Returns (plan, (N, c)) for shear_resample(exact_bounds=(N, c))."""
    basis = np.asarray(basis, np.float64)
    rot = np.asarray(rot, np.float64)
    origin = np.asarray(origin, np.float64)
    spacing = np.asarray(spacing, np.float64)
    # real position = B @ diag(step) @ (i,j,p) + B @ (g0, g0, o0)
    B = basis  # columns u, v, n_hat
    steps = np.diag([g_step, g_step, o_step])
    starts = B @ np.array([g0, g0, o0])
    N = (1.0 / spacing)[:, None] * (rot @ B @ steps)
    c = (rot @ starts - origin) / spacing
    plan = plan_affine_resample(N, c, vol_shape,
                                (int(dim), int(dim), int(n_planes)))
    return plan, (N, c)


def plan_view_remap(M, t, g0, g_step, o0, o_step, pred_shape, out_shape):
    """Plan the BACKWARD resample: prediction stack (d, d, P) -> voxel grid.
    Voxel index v maps to plane coords M v + t; plane coords convert to
    stack indices via (coord - (g0, g0, o0)) / (g_step, g_step, o_step)
    (the shear equivalent of `ops.interp.map_view_pred_affine`).

    Returns (plan, (N, c))."""
    M = np.asarray(M, np.float64)
    t = np.asarray(t, np.float64)
    starts = np.array([g0, g0, o0], np.float64)
    steps = np.array([g_step, g_step, o_step], np.float64)
    N = M / steps[:, None]
    c = (t - starts) / steps
    plan = plan_affine_resample(N, c, pred_shape, out_shape)
    return plan, (N, c)


# ---------------------------------------------------------------- numpy twin
def _pass_np(A, op, method="linear"):
    m, q = op.m, op.q
    L_out, L_in = op.out_extent, op.in_extent
    t = np.arange(L_out, dtype=np.float64)
    pos = op.alpha * (t + op.out_lo) + op.gamma - op.in_lo
    if q is not None:
        b = np.arange(A.shape[q], dtype=np.float64) + op.q_lo
        pos = pos[None, :] + op.beta * b[:, None]
    else:
        pos = pos[None, :]
    parts = _tap_parts(pos, np, method)

    def lift(x):
        nq = x.shape[0]
        shape = [1, 1, 1, 1]
        shape[m] = L_out
        if q is not None:
            shape[q] = nq
            if q > m:
                x = x.T
        return x.reshape(shape)

    out = None
    for idx, w in parts:
        valid = (idx >= 0) & (idx < L_in)
        idx_l = lift(np.clip(idx, 0, L_in - 1))
        tgt = list(A.shape)
        tgt[m] = L_out
        g = np.take_along_axis(A, np.broadcast_to(idx_l, tgt), axis=m)
        term = g * lift(valid)
        if w is not None:
            term = term * lift(w)
        out = term if out is None else out + term
    return out


def shear_resample_np(src, plan: ShearPlan, fill, method="linear",
                      exact_bounds=None):
    """Numpy reference implementation of `shear_resample` (tests)."""
    C = src.shape[-1]
    A = np.concatenate(
        [np.asarray(src, np.float64),
         np.ones(src.shape[:3] + (1,), np.float64)], axis=-1)
    A = np.transpose(A, plan.perm + (3,))
    for op in plan.ops:
        A = _pass_np(A, op, method)
    if plan.out_perm != (0, 1, 2):
        A = np.transpose(A, tuple(np.argsort(plan.out_perm)) + (3,))
    data, valid = A[..., :C], A[..., C]
    if exact_bounds is not None:
        N, c = exact_bounds[0], exact_bounds[1]
        bshape = exact_bounds[2] if len(exact_bounds) > 2 else plan.src_shape
        ii, jj, kk = np.meshgrid(*[np.arange(s) for s in plan.out_shape],
                                 indexing="ij")
        pts = np.stack([ii, jj, kk], -1).astype(np.float64) @ \
            np.asarray(N, np.float64).T + np.asarray(c, np.float64)
        n = np.asarray(bshape, np.float64)
        ok = np.all((pts >= 0) & (pts <= n - 1), axis=-1)
    else:
        ok = valid > 0.5
    safe = np.maximum(valid, 0.05)[..., None]
    fill = np.asarray(fill, np.float64)
    return np.where(ok[..., None], data / safe, fill)
