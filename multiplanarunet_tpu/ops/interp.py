"""On-device uniform-grid interpolation kernels (JAX/XLA).

This is the numerical heart of the framework. In the reference everything —
training slice sampling, inference plane stacks, prediction remapping, 3D box
recon — funnels through a vendored scipy ``RegularGridInterpolator`` running
per-channel numpy under thread pools (`mpunet/interpolation/
regular_grid_interpolator.py`, `view_interpolator.py`, 7-thread pools in
`sequences/isotrophic_live_view_sequence_2d.py:76-88` and
`utils/fusion/fuse_and_predict.py:117-124`). Here the same math is one fused
XLA computation over the volume resident in HBM:

  * the sample axes are always *uniform* (centered voxel axes spaced by pixdim;
    plane axes are linspace), so index lookup is a multiply-add, not a
    searchsorted;
  * all channels interpolate in a single vectorized gather (channels ride the
    minor axis of the gathered rows);
  * out-of-bounds points blend to a per-channel fill vector, supporting both
    per-channel background values and the one-hot "background softmax" fill
    used when remapping predictions (`utils/fusion/fuse_and_predict.py:98-104`);
  * plane/box grids are generated *inside* the kernel from (basis, offset)
    parameters — the query grids never touch host memory.

Boundary semantics match the reference interpolator: a point is out of bounds
iff it lies outside ``[axis[0], axis[-1]]`` on any axis; in-bounds cell indices
clamp to ``[0, n-2]``; nearest rounds half-down (``frac <= 0.5`` picks the
lower neighbor).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _flat_gather(vol_flat, ix, iy, iz, D1, D2):
    """Gather rows (..., C) from a flattened (D0*D1*D2, C) volume."""
    flat = (ix * D1 + iy) * D2 + iz
    return jnp.take(vol_flat, flat.reshape(-1), axis=0).reshape(flat.shape + (vol_flat.shape[-1],))


def _index_parts(points, origin, spacing, shape3):
    """Fractional index computation shared by linear/nearest gathers.

    `shape3` may be a static tuple OR a traced (3,) array — the latter lets
    one compiled kernel serve volumes padded to a common bucket shape, with
    the true per-image extents supplied at run time.

    Returns (i0 [int32 (...,3)], frac [f32 (...,3)], oob [bool (...,)]).
    """
    t = (points - origin) / spacing  # (..., 3)
    n = jnp.asarray(shape3, dtype=points.dtype)
    oob = jnp.any((t < 0.0) | (t > (n - 1.0)), axis=-1)
    i0 = jnp.clip(jnp.floor(t), 0.0, n - 2.0).astype(jnp.int32)
    frac = t - i0.astype(points.dtype)
    return i0, frac, oob


def grid_gather(values, origin, spacing, points, method="linear", fill=None,
                valid_shape=None):
    """Interpolate `values` defined on a uniform 3D grid at real-space `points`.

    Args:
      values:  (D0, D1, D2, C) array.
      origin:  (3,) real-space position of voxel (0,0,0) on each axis.
      spacing: (3,) axis step.
      points:  (..., 3) real-space query positions.
      method:  'linear' | 'nearest' | 'knn' (7-point neighbor vote).
      fill:    scalar or (C,) out-of-bounds fill; 0 if None.
      valid_shape: optional (3,) int array giving the TRUE spatial extent when
        `values` is padded to a larger bucket shape; bounds checks and index
        clamping then use the true extent (padding is never read).

    Returns: (..., C) interpolated values, dtype follows `values` promotion.
    """
    values = jnp.asarray(values)
    if values.ndim != 4:
        raise ValueError(f"values must be rank-4 (D0,D1,D2,C), got {values.shape}")
    D0, D1, D2, C = values.shape
    points = jnp.asarray(points)
    origin = jnp.asarray(origin, dtype=points.dtype)
    spacing = jnp.asarray(spacing, dtype=points.dtype)
    if fill is None:
        fill = jnp.zeros((C,), dtype=values.dtype)
    else:
        fill = jnp.broadcast_to(jnp.asarray(fill, dtype=values.dtype), (C,))

    bounds = (D0, D1, D2) if valid_shape is None else valid_shape
    i0, frac, oob = _index_parts(points, origin, spacing, bounds)
    vol_flat = values.reshape(-1, C)

    if method == "nearest":
        idx = jnp.where(frac <= 0.5, i0, i0 + 1)
        out = _flat_gather(vol_flat, idx[..., 0], idx[..., 1], idx[..., 2], D1, D2)
    elif method == "linear":
        fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
        ix, iy, iz = i0[..., 0], i0[..., 1], i0[..., 2]
        out = None
        for dx in (0, 1):
            wx = fx if dx else (1.0 - fx)
            for dy in (0, 1):
                wy = fy if dy else (1.0 - fy)
                for dz in (0, 1):
                    wz = fz if dz else (1.0 - fz)
                    corner = _flat_gather(vol_flat, ix + dx, iy + dy, iz + dz, D1, D2)
                    w = (wx * wy * wz)[..., None]
                    contrib = corner * w
                    out = contrib if out is None else out + contrib
    elif method in ("knn", "kNN"):
        # Neighbor-vote mode (reference RegularGridInterpolator
        # method="kNN", `mpunet/interpolation/regular_grid_interpolator.py:
        # 196-250`): the nearest voxel and its six axis neighbors vote with
        # their channel vectors, summed and normalized to a unit channel
        # sum — meant for fusing softmax probability volumes. Neighbor
        # indices clamp per-axis to the valid extent (the reference clamps
        # every axis with axis i's size — a latent bug its live paths never
        # hit; this implementation clamps correctly).
        idx = jnp.where(frac <= 0.5, i0, i0 + 1)
        hi = jnp.asarray(bounds, jnp.int32) - 1
        out = None
        for d in ((0, 0, 0), (-1, 0, 0), (1, 0, 0), (0, -1, 0),
                  (0, 1, 0), (0, 0, -1), (0, 0, 1)):
            j = jnp.clip(idx + jnp.asarray(d, jnp.int32), 0, hi)
            v = _flat_gather(vol_flat, j[..., 0], j[..., 1], j[..., 2],
                             D1, D2)
            out = v if out is None else out + v
        out = out / jnp.sum(out, axis=-1, keepdims=True)
    else:
        raise ValueError(f"Unknown method '{method}'")
    return jnp.where(oob[..., None], fill, out)


# --------------------------------------------------------------------- planes
def plane_points(basis, offset, span, dim, dtype=jnp.float32):
    """(d, d, 3) real-space positions of one oblique plane.

    point(i, j) = u * g[i] + v * g[j] + n_hat * offset, with
    g = linspace(-span//2, span//2, dim). Generated on device; `basis` is the
    3x3 (u, v, n_hat) column matrix from `ops.geometry.plane_basis`.
    """
    hd = jnp.floor_divide(jnp.asarray(span, dtype), 2.0)
    g = jnp.linspace(-hd, hd, dim, dtype=dtype)
    u, v, n = basis[:, 0], basis[:, 1], basis[:, 2]
    return (
        g[:, None, None] * u[None, None, :]
        + g[None, :, None] * v[None, None, :]
        + jnp.asarray(offset, dtype) * n[None, None, :]
    )


@partial(jax.jit, static_argnames=("span", "dim", "method"))
def sample_plane(volume, origin, spacing, rot, basis, offset, span, dim,
                 fill, method="linear", valid_shape=None):
    """Sample one oblique plane from a volume. Returns (d, d, C).

    `rot` is the 3x3 scanner->grid alignment rotation (identity when the
    affine is axis-aligned)."""
    pts = plane_points(basis, offset, span, dim, dtype=jnp.asarray(origin).dtype)
    pts = pts @ rot.T
    return grid_gather(volume, origin, spacing, pts, method=method, fill=fill,
                       valid_shape=valid_shape)


@partial(jax.jit, static_argnames=("span", "dim", "method"))
def sample_plane_stack(volume, origin, spacing, rot, basis, offsets, span, dim,
                       fill, method="linear", valid_shape=None):
    """Sample a stack of parallel planes along one view.

    Args:
      offsets: (P,) displacements along n_hat.
    Returns: (d, d, P, C) — plane index on axis 2 to match the reference's
    X-volume layout (`sequences/isotrophic_live_view_sequence_2d.py:68`).
    """
    dtype = jnp.asarray(origin).dtype
    base = plane_points(basis, 0.0, span, dim, dtype=dtype)  # (d, d, 3)
    n = basis[:, 2]
    pts = base[:, :, None, :] + offsets.astype(dtype)[None, None, :, None] * n
    pts = pts @ rot.T
    return grid_gather(volume, origin, spacing, pts, method=method, fill=fill,
                       valid_shape=valid_shape)


@partial(jax.jit, static_argnames=("span", "dim", "method"))
def sample_plane_batch(volume, origin, spacing, rot, bases, offsets, span, dim,
                       fill, method="linear", valid_shape=None):
    """Sample a batch of independently-oriented planes (training batches).

    Args:
      bases:   (B, 3, 3) per-sample plane bases.
      offsets: (B,) per-sample offsets along each basis' n_hat.
    Returns: (B, d, d, C).
    """
    dtype = jnp.asarray(origin).dtype

    def one(basis, offset):
        pts = plane_points(basis, offset, span, dim, dtype=dtype) @ rot.T
        return pts

    pts = jax.vmap(one)(bases, offsets)  # (B, d, d, 3)
    return grid_gather(volume, origin, spacing, pts, method=method, fill=fill,
                       valid_shape=valid_shape)


# ----------------------------------------------------------------------- boxes
@partial(jax.jit, static_argnames=("box_dim", "method"))
def sample_box(volume, origin, spacing, rot, corner, real_box_dim, box_rot,
               box_dim, fill, method="linear", valid_shape=None):
    """Sample an isotropic scanner-space box. Returns (d, d, d, C).

    corner: (3,) real-space box corner; box_rot: 3x3 rotation applied about
    the box center (identity for none)."""
    dtype = jnp.asarray(origin).dtype
    axes = [
        jnp.linspace(corner[i], corner[i] + real_box_dim, box_dim, dtype=dtype)
        for i in range(3)
    ]
    pts = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)  # (d,d,d,3)
    center = jnp.mean(pts.reshape(-1, 3), axis=0)
    pts = (pts - center) @ box_rot.T + center
    pts = pts @ rot.T
    return grid_gather(volume, origin, spacing, pts, method=method, fill=fill,
                       valid_shape=valid_shape)


# ------------------------------------------------------- prediction remapping
@partial(jax.jit, static_argnames=("method",))
def map_view_pred_to_voxels(pred, plane_span_axis0, offsets_axis2, inv_basis,
                            voxel_points, method="nearest"):
    """Map a per-view prediction hyper-volume back onto the voxel grid.

    The reference builds a nearest-neighbor interpolator over the (u, v,
    offset) axes of the prediction stack and queries it at inverse-transformed
    voxel positions (`utils/fuse_and_predict.py:92-137`) — i.e. the remap is a
    *gather* from the prediction stack, which is exactly what this kernel does
    on-device with a one-hot background fill.

    Args:
      pred:            (d, d, P, C) per-view class probabilities.
      plane_span_axis0:(2,) [start, step] of the in-plane axis (both u and v).
      offsets_axis2:   (2,) [start, step] of the plane-offset axis.
      inv_basis:       3x3 inverse plane basis.
      voxel_points:    (..., 3) centered real-space voxel positions.
    Returns: (..., C).
    """
    C = pred.shape[-1]
    fill = jnp.zeros((C,), pred.dtype).at[0].set(1.0)
    pts = voxel_points @ inv_basis.T
    origin = jnp.stack([plane_span_axis0[0], plane_span_axis0[0], offsets_axis2[0]])
    spacing = jnp.stack([plane_span_axis0[1], plane_span_axis0[1], offsets_axis2[1]])
    return grid_gather(pred, origin, spacing, pts, method=method, fill=fill)


# ------------------------------------------------------------- pooled path
def grid_gather_pool(pool, slot, origin, spacing, points, method="linear",
                     fill=None, valid_shape=None):
    """`grid_gather` against one slot of a (N, X, Y, Z, C) volume pool.

    Identical math to `grid_gather` with the flat index offset by
    slot * X*Y*Z — lets a vmapped caller sample MANY different subjects in a
    single fused kernel (see `sample_plane_batch_pool`)."""
    N, X, Y, Z, C = pool.shape
    points = jnp.asarray(points)
    origin = jnp.asarray(origin, dtype=points.dtype)
    spacing = jnp.asarray(spacing, dtype=points.dtype)
    if fill is None:
        fill = jnp.zeros((C,), dtype=pool.dtype)
    else:
        fill = jnp.broadcast_to(jnp.asarray(fill, dtype=pool.dtype), (C,))
    bounds = (X, Y, Z) if valid_shape is None else valid_shape
    i0, frac, oob = _index_parts(points, origin, spacing, bounds)
    base = slot.astype(jnp.int32) * (X * Y * Z)
    flat_pool = pool.reshape(-1, C)

    def g(ix, iy, iz):
        idx = base + (ix * Y + iy) * Z + iz
        return jnp.take(flat_pool, idx.reshape(-1), axis=0).reshape(
            idx.shape + (C,)
        )

    if method == "nearest":
        idx = jnp.where(frac <= 0.5, i0, i0 + 1)
        out = g(idx[..., 0], idx[..., 1], idx[..., 2])
    else:
        fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
        ix, iy, iz = i0[..., 0], i0[..., 1], i0[..., 2]
        out = None
        for dx in (0, 1):
            wx = fx if dx else (1.0 - fx)
            for dy in (0, 1):
                wy = fy if dy else (1.0 - fy)
                for dz in (0, 1):
                    wz = fz if dz else (1.0 - fz)
                    contrib = g(ix + dx, iy + dy, iz + dz) * (wx * wy * wz)[..., None]
                    out = contrib if out is None else out + contrib
    return jnp.where(oob[..., None], fill, out)


@partial(jax.jit, static_argnames=("span", "dim", "method"))
def sample_plane_batch_pool(pool, slots, origins, spacings, rots, bases,
                            offsets, span, dim, fills, method="linear",
                            valid_shapes=None):
    """Sample B independently-oriented planes from B (possibly different)
    pool slots in ONE fused kernel.

    Args:
      pool:     (N, X, Y, Z, C) volume pool.
      slots:    (B,) int slot per sample.
      origins/spacings: (B, 3); rots: (B, 3, 3); bases: (B, 3, 3);
      offsets:  (B,); fills: (B, C); valid_shapes: (B, 3).
    Returns (B, d, d, C)."""
    def one(slot, origin, spacing, rot, basis, offset, fill, valid):
        pts = plane_points(basis, offset, span, dim,
                           dtype=jnp.asarray(origin).dtype) @ rot.T
        return grid_gather_pool(pool, slot, origin, spacing, pts,
                                method=method, fill=fill, valid_shape=valid)

    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0, 0))(
        slots, origins, spacings, rots, bases, offsets, fills, valid_shapes
    )


@partial(jax.jit, static_argnames=("box_dim", "method"))
def sample_box_batch_pool(pool, slots, origins, spacings, rots, corners,
                          box_rots, real_box_dim, box_dim, fills,
                          method="linear", valid_shapes=None):
    """Sample B isotropic boxes from B (possibly different) pool slots in
    one fused kernel (3D analogue of `sample_plane_batch_pool`).

    corners: (B, 3); box_rots: (B, 3, 3). Returns (B, d, d, d, C)."""
    def one(slot, origin, spacing, rot, corner, box_rot, fill, valid):
        dtype = jnp.asarray(origin).dtype
        axes = [jnp.linspace(corner[i], corner[i] + real_box_dim, box_dim,
                             dtype=dtype) for i in range(3)]
        pts = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
        center = jnp.mean(pts.reshape(-1, 3), axis=0)
        pts = (pts - center) @ box_rot.T + center
        pts = pts @ rot.T
        return grid_gather_pool(pool, slot, origin, spacing, pts,
                                method=method, fill=fill, valid_shape=valid)

    return jax.vmap(one)(slots, origins, spacings, rots, corners, box_rots,
                         fills, valid_shapes)


# ------------------------------------------------------- packed-corner path
# TPU gathers cost per-GATHER, not per-byte (a row-of-8 gather is as fast as
# a single-element gather). Pre-packing the 8 trilinear corner values of each
# voxel into one row turns the 8-gather trilinear interpolation into ONE
# gather — ~8x faster on the inference hot path at 8x volume memory (bf16
# packing halves that). Used for the per-view plane-stack extraction where
# the same volume is sampled ~1,600 times per case.

_CORNERS = [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]


@jax.jit
def pack_corners(volume):
    """(X, Y, Z, C) -> (X, Y, Z, 8, C) corner-packed volume.

    Entry [x, y, z, c_idx] holds volume[x+dx, y+dy, z+dz] for the c_idx-th
    corner offset. Rows at x=X-1 etc. are edge-padded and never gathered
    (cell indices clamp to the second-to-last voxel)."""
    p = jnp.pad(volume, ((0, 1), (0, 1), (0, 1), (0, 0)), mode="edge")
    X, Y, Z, C = volume.shape
    return jnp.stack(
        [p[dx:dx + X, dy:dy + Y, dz:dz + Z] for dx, dy, dz in _CORNERS],
        axis=3,
    )


def grid_gather_packed(packed, origin, spacing, points, fill=None,
                       valid_shape=None):
    """Trilinear gather from a corner-packed volume in a single gather.

    Args:
      packed: (X, Y, Z, 8, C) from `pack_corners`.
      others: as `grid_gather` (linear method only).
    Returns (..., C)."""
    X, Y, Z, _, C = packed.shape
    points = jnp.asarray(points)
    origin = jnp.asarray(origin, dtype=points.dtype)
    spacing = jnp.asarray(spacing, dtype=points.dtype)
    if fill is None:
        fill = jnp.zeros((C,), dtype=packed.dtype)
    else:
        fill = jnp.broadcast_to(jnp.asarray(fill, dtype=packed.dtype), (C,))
    bounds = (X, Y, Z) if valid_shape is None else valid_shape
    i0, frac, oob = _index_parts(points, origin, spacing, bounds)
    flat = (i0[..., 0] * Y + i0[..., 1]) * Z + i0[..., 2]
    rows = jnp.take(packed.reshape(-1, 8, C), flat.reshape(-1), axis=0)
    rows = rows.reshape(flat.shape + (8, C)).astype(jnp.float32)
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    wx = jnp.stack([1.0 - fx, fx], -1)  # (..., 2)
    wy = jnp.stack([1.0 - fy, fy], -1)
    wz = jnp.stack([1.0 - fz, fz], -1)
    w = (wx[..., :, None, None] * wy[..., None, :, None]
         * wz[..., None, None, :]).reshape(frac.shape[:-1] + (8,))
    out = jnp.sum(rows * w[..., None], axis=-2)
    return jnp.where(oob[..., None], fill.astype(jnp.float32), out)


def grid_gather_pool_packed(packed_flat, grid_shape, slot, origin, spacing,
                            points, fill=None, valid_shape=None):
    """Trilinear gather from a FLAT corner-packed volume pool in one
    gather per point.

    `packed_flat` is 1-D ((N * X*Y*Z * 8 * C,)) — the 8 corner values of
    cell (x, y, z) live contiguously at (slot*XYZ + flat_cell) * 8C, so
    the trilinear read is a single lax.gather of 8C-element rows (TPU
    gathers cost per-GATHER, not per-byte). The pool MUST stay 1-D: an
    (N, X, Y, Z, 8, C) argument gets a per-PROGRAM whole-pool relayout
    from XLA (measured 35-40 ms/step of copy/dynamic-slice at a 524 MB
    pool — more than the 8-gather form it replaced); a 1-D argument has
    exactly one layout. `grid_shape` = (X, Y, Z, C), static."""
    X, Y, Z, C = grid_shape
    points = jnp.asarray(points)
    origin = jnp.asarray(origin, dtype=points.dtype)
    spacing = jnp.asarray(spacing, dtype=points.dtype)
    if fill is None:
        fill = jnp.zeros((C,), dtype=packed_flat.dtype)
    else:
        fill = jnp.broadcast_to(jnp.asarray(fill, dtype=packed_flat.dtype),
                                (C,))
    bounds = (X, Y, Z) if valid_shape is None else valid_shape
    i0, frac, oob = _index_parts(points, origin, spacing, bounds)
    cell = (slot.astype(jnp.int32) * X
            + i0[..., 0]) * Y * Z + i0[..., 1] * Z + i0[..., 2]
    starts = (cell.reshape(-1, 1) * (8 * C)).astype(jnp.int32)
    rows = jax.lax.gather(
        packed_flat, starts,
        jax.lax.GatherDimensionNumbers(offset_dims=(1,),
                                       collapsed_slice_dims=(),
                                       start_index_map=(0,)),
        slice_sizes=(8 * C,),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )
    rows = rows.reshape(cell.shape + (8, C)).astype(jnp.float32)
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    wx = jnp.stack([1.0 - fx, fx], -1)
    wy = jnp.stack([1.0 - fy, fy], -1)
    wz = jnp.stack([1.0 - fz, fz], -1)
    w = (wx[..., :, None, None] * wy[..., None, :, None]
         * wz[..., None, None, :]).reshape(frac.shape[:-1] + (8,))
    out = jnp.sum(rows * w[..., None], axis=-2)
    return jnp.where(oob[..., None], fill.astype(jnp.float32), out)


@partial(jax.jit, static_argnames=("grid_shape", "span", "dim"))
def sample_plane_batch_pool_packed(packed_flat, grid_shape, slots, origins,
                                   spacings, rots, bases, offsets, span,
                                   dim, fills, valid_shapes=None):
    """`sample_plane_batch_pool` (linear) over a flat corner-packed pool:
    the whole batch's trilinear image extraction in ONE gather kernel
    instead of eight — on a hardware trace the 8 corner gathers were
    ~15 ms of a 16-batch/128-dim training step's sampler work."""
    def one(slot, origin, spacing, rot, basis, offset, fill, valid):
        pts = plane_points(basis, offset, span, dim,
                           dtype=jnp.asarray(origin).dtype) @ rot.T
        return grid_gather_pool_packed(packed_flat, grid_shape, slot,
                                       origin, spacing, pts, fill=fill,
                                       valid_shape=valid)

    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0, 0))(
        slots, origins, spacings, rots, bases, offsets, fills, valid_shapes
    )


@partial(jax.jit, static_argnames=("span", "dim"))
def sample_plane_stack_packed(packed, origin, spacing, rot, basis, offsets,
                              span, dim, fill, valid_shape=None):
    """`sample_plane_stack` over a corner-packed volume (single gather)."""
    dtype = jnp.asarray(origin).dtype
    base = plane_points(basis, 0.0, span, dim, dtype=dtype)
    n = basis[:, 2]
    pts = base[:, :, None, :] + offsets.astype(dtype)[None, None, :, None] * n
    pts = pts @ rot.T
    return grid_gather_packed(packed, origin, spacing, pts, fill=fill,
                              valid_shape=valid_shape)


@partial(jax.jit, static_argnames=("out_shape", "method", "x_slab"))
def map_view_pred_affine(pred, plane_start, plane_step, offset_start,
                         offset_step, M, t, out_shape, valid_planes,
                         method="nearest", x_slab=None):
    """Map a per-view prediction stack onto the voxel grid WITHOUT
    materializing the voxel-position grid.

    For voxel index v = (i, j, k), the reference computes
    ``inv_basis @ (A @ v - center)`` and nearest-gathers the prediction stack
    there (`utils/fusion/fuse_and_predict.py:92-137`). That whole transform is
    affine, so the caller passes ``M = inv_basis @ A`` and
    ``t = -inv_basis @ center`` and this kernel generates the query
    coordinates from iota in-register — for a 256**3 volume this avoids
    streaming a 200 MB coordinate grid from the host per view.

    Args:
      pred:        (d, d, P_pad, C) prediction stack (P may be padded).
      plane_start/plane_step:   in-plane axis start/step (u and v axes).
      offset_start/offset_step: plane-offset axis start/step.
      M, t:        3x3 and (3,) affine taking voxel INDEX -> plane coords.
      out_shape:   static (X, Y, Z) voxel shape.
      valid_planes: true P (padded tail planes are treated out-of-bounds).

    Returns: (X, Y, Z, C) mapped prediction with one-hot background fill.
    """
    X, Y, Z = out_shape
    C = pred.shape[-1]
    x_slab, n_slabs, one_slab = _view_slab_mapper(
        pred, plane_start, plane_step, offset_start, offset_step, M, t,
        (X, Y, Z), valid_planes, method, x_slab)
    if n_slabs == 1:
        return one_slab(jnp.asarray(0))
    out = jax.lax.map(one_slab, jnp.arange(n_slabs))
    return out.reshape((X, Y, Z, C))


def _view_slab_mapper(pred, plane_start, plane_step, offset_start,
                      offset_step, M, t, out_shape, valid_planes, method,
                      x_slab):
    """Shared slab machinery of the view remaps: picks the X-slab size and
    returns (x_slab, n_slabs, one_slab) where one_slab(i) maps slab i of
    the voxel grid from the prediction stack. Scanning X-slabs keeps only
    one slab's coordinate grid live (at 512^3 the full (X, Y, Z, 3) grid
    alone is 1.6 GB); a single pass is both fastest and affordable up to
    ~256^3 (<= 200 MB of coordinates)."""
    X, Y, Z = out_shape
    C = pred.shape[-1]
    fill = jnp.zeros((C,), pred.dtype).at[0].set(1.0)
    origin = jnp.stack([plane_start, plane_start, offset_start])
    spacing = jnp.stack([plane_step, plane_step, offset_step])
    valid = jnp.stack([
        jnp.asarray(pred.shape[0]), jnp.asarray(pred.shape[1]),
        jnp.asarray(valid_planes),
    ])
    if x_slab is None:
        x_slab = X if X * Y * Z <= 256 ** 3 else max(32, X // 16)
    if X % x_slab:
        # Largest divisor <= the target — never fall back to one full pass
        # (the slab structure IS the memory guard for big volumes)
        x_slab = max(d for d in range(1, x_slab + 1) if X % d == 0)
    n_slabs = X // x_slab

    def one_slab(slab_idx):
        x0 = (slab_idx * x_slab).astype(jnp.float32)
        ii = x0 + jax.lax.broadcasted_iota(jnp.float32, (x_slab, Y, Z), 0)
        jj = jax.lax.broadcasted_iota(jnp.float32, (x_slab, Y, Z), 1)
        kk = jax.lax.broadcasted_iota(jnp.float32, (x_slab, Y, Z), 2)
        pts = jnp.stack(
            [M[a, 0] * ii + M[a, 1] * jj + M[a, 2] * kk + t[a]
             for a in range(3)],
            axis=-1,
        )
        return grid_gather(pred, origin, spacing, pts, method=method,
                           fill=fill, valid_shape=valid)

    return x_slab, n_slabs, one_slab


def accum_view_pred_affine(pred, plane_start, plane_step, offset_start,
                           offset_step, M, t, accum, w, valid_planes,
                           want_argmax=False, method="nearest",
                           x_slab=None):
    """`map_view_pred_affine` fused with the fusion accumulation: updates
    `accum` (donate it!) slab-by-slab in place instead of materializing the
    mapped volume — at 512^3 x 7 classes the mapped f32 volume alone is
    3.8 GB next to the 3.8 GB accumulator, which exhausts a 16 GB chip
    (measured); here only one slab's map is ever live.

    Returns (accum + w * mapped, argmax uint8 map or None)."""
    X, Y, Z = accum.shape[:3]
    C = pred.shape[-1]
    x_slab, n_slabs, one_slab = _view_slab_mapper(
        pred, plane_start, plane_step, offset_start, offset_step, M, t,
        (X, Y, Z), valid_planes, method, x_slab)

    def body(slab_idx, carry):
        accum, side = carry
        mapped = one_slab(slab_idx).astype(jnp.float32)
        start = (slab_idx * x_slab, 0, 0, 0)
        upd = jax.lax.dynamic_slice(
            accum, start, (x_slab, Y, Z, C)) + w * mapped
        accum = jax.lax.dynamic_update_slice(accum, upd, start)
        if side is not None:
            s_upd = jnp.argmax(mapped, axis=-1).astype(jnp.uint8)
            side = jax.lax.dynamic_update_slice(side, s_upd, start[:3])
        return accum, side

    side = jnp.zeros((X, Y, Z), jnp.uint8) if want_argmax else None
    if n_slabs == 1:
        return body(jnp.asarray(0), (accum, side))
    return jax.lax.fori_loop(0, n_slabs, body, (accum, side))


@partial(jax.jit, static_argnames=("box_dim",), donate_argnums=(0,))
def scatter_box_pred(pred_vol, pred, corner, real_box_dim, inv_box_rot,
                     rot, origin, spacing, box_dim, valid_shape):
    """Scatter-add one box prediction onto the nearest voxel grid positions.

    The reference's `pred_3D_iso` builds a nearest interpolator from scanner
    space to voxel indices and adds each box's softmax into the prediction
    volume (`utils/fusion/fuse_and_predict.py:200-293`). Here the index
    computation is a closed-form affine (the axes are uniform), and the
    accumulation is one donated scatter-add.

    Args:
      pred_vol: (X, Y, Z, C) accumulator (donated).
      pred:     (d, d, d, C) box prediction.
      corner:   (3,) real-space box corner; box spans corner + [0, box_dim].
      inv_box_rot: inverse of the random box rotation (identity if none).
      rot:      scanner->grid alignment rotation of the image.
      origin/spacing: centered voxel-axis parameterization.
      valid_shape: (3,) true voxel extent.
    """
    dtype = pred.dtype
    d = box_dim
    axes = [jnp.linspace(corner[i], corner[i] + real_box_dim, d, dtype=dtype)
            for i in range(3)]
    pts = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
    center = jnp.mean(pts.reshape(-1, 3), axis=0)
    # The box was sampled on the grid rotated FORWARD by box_rot about its
    # center (`sample_box`), so prediction sample (i,j,k) lives at the rotated
    # grid position. With row-vector points, forward rotation is
    # ``pts @ box_rot.T`` and box_rot.T == inv_box_rot for rotations.
    pts = (pts - center) @ inv_box_rot + center
    pts = pts @ rot.T
    idx_f = (pts - origin) / spacing
    idx = jnp.round(idx_f).astype(jnp.int32)
    n = valid_shape.astype(jnp.int32)
    inb = jnp.all((idx >= 0) & (idx < n), axis=-1)
    X, Y, Z, C = pred_vol.shape
    flat_idx = (idx[..., 0] * Y + idx[..., 1]) * Z + idx[..., 2]
    flat_idx = jnp.where(inb, flat_idx, 0)
    contrib = jnp.where(inb[..., None], pred, 0.0)
    flat = pred_vol.reshape(-1, C)
    flat = flat.at[flat_idx.reshape(-1)].add(
        contrib.reshape(-1, C), mode="drop"
    )
    return flat.reshape(X, Y, Z, C)


# ---------------------------------------------------------------- numpy twin
def grid_gather_np(values, origin, spacing, points, method="linear", fill=None):
    """Reference numpy implementation of `grid_gather` (tests / host fallback)."""
    values = np.asarray(values)
    D0, D1, D2, C = values.shape
    points = np.asarray(points, np.float32)
    t = (points - np.asarray(origin)) / np.asarray(spacing)
    n = np.array([D0, D1, D2], np.float32)
    oob = np.any((t < 0) | (t > (n - 1)), axis=-1)
    i0 = np.clip(np.floor(t), 0, n - 2).astype(np.int64)
    frac = (t - i0).astype(np.float32)
    flat = values.reshape(-1, C)

    def g(ix, iy, iz):
        return flat[(ix * D1 + iy) * D2 + iz]

    if method == "nearest":
        idx = np.where(frac <= 0.5, i0, i0 + 1)
        out = g(idx[..., 0], idx[..., 1], idx[..., 2])
    else:
        out = np.zeros(points.shape[:-1] + (C,), np.float32)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = (
                        (frac[..., 0] if dx else 1 - frac[..., 0])
                        * (frac[..., 1] if dy else 1 - frac[..., 1])
                        * (frac[..., 2] if dz else 1 - frac[..., 2])
                    )
                    out += g(i0[..., 0] + dx, i0[..., 1] + dy, i0[..., 2] + dz) * w[..., None]
    if fill is None:
        fillv = np.zeros((C,), np.float32)
    else:
        fillv = np.broadcast_to(np.asarray(fill, np.float32), (C,))
    out = np.where(oob[..., None], fillv, out)
    return out
