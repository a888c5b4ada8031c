"""Golden tests for the on-device uniform-grid gather kernels.

Oracle: scipy.interpolate.RegularGridInterpolator — an independent
implementation of the same regular-grid linear/nearest semantics the
reference framework vendors.
"""
import numpy as np
import pytest
from scipy.interpolate import RegularGridInterpolator as ScipyRGI

import jax.numpy as jnp

from multiplanarunet_tpu.ops import geometry, interp


def make_volume(rng, shape=(9, 11, 13), C=2):
    return rng.rand(*shape, C).astype(np.float32)


def centered_axes(shape, spacing):
    return tuple(
        (np.arange(n) - (n - 1) / 2) * s for n, s in zip(shape, spacing)
    )


def scipy_oracle(vol, axes, pts, method, fill):
    out = np.empty(pts.shape[:-1] + (vol.shape[-1],), np.float32)
    for c in range(vol.shape[-1]):
        f = fill[c] if np.ndim(fill) else fill
        rgi = ScipyRGI(axes, vol[..., c].astype(np.float64), method=method,
                       bounds_error=False, fill_value=f)
        out[..., c] = rgi(pts)
    return out


@pytest.mark.parametrize("method", ["linear", "nearest"])
def test_grid_gather_matches_scipy(method):
    rng = np.random.RandomState(42)
    vol = make_volume(rng)
    spacing = np.array([1.0, 0.5, 0.25], np.float32)
    axes = centered_axes(vol.shape[:3], spacing)
    origin = np.array([a[0] for a in axes], np.float32)

    # Points spanning in-bounds and out-of-bounds regions
    lo = origin - 1.0
    hi = -origin + 1.0
    pts = (rng.rand(500, 3) * (hi - lo) + lo).astype(np.float32)

    fill = np.array([7.0, -3.0], np.float32)
    want = scipy_oracle(vol, axes, pts, method, fill)
    got = np.asarray(
        interp.grid_gather(vol, origin, spacing, pts, method=method, fill=fill)
    )
    atol = 1e-5 if method == "linear" else 0.0
    np.testing.assert_allclose(got, want, atol=atol)


def test_grid_gather_np_matches_jax():
    rng = np.random.RandomState(3)
    vol = make_volume(rng)
    spacing = np.array([1.0, 1.0, 1.0], np.float32)
    origin = -np.array([(s - 1) / 2 for s in vol.shape[:3]], np.float32)
    pts = (rng.rand(200, 3) * 14 - 7).astype(np.float32)
    for method in ("linear", "nearest"):
        a = interp.grid_gather_np(vol, origin, spacing, pts, method=method, fill=[1.0, 2.0])
        b = np.asarray(interp.grid_gather(vol, origin, spacing, pts, method=method, fill=[1.0, 2.0]))
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_plane_basis_orthonormal():
    rng = np.random.RandomState(0)
    for _ in range(50):
        view = rng.normal(size=3)
        B = geometry.plane_basis(view, noise_sd=0.0)
        np.testing.assert_allclose(B.T @ B, np.eye(3), atol=1e-5)
        n_unit = view / np.linalg.norm(view)
        if not np.all(n_unit[:2] < 0.2):
            # n_hat column equals the normalized view except when the
            # "pointing mostly up" branch flips x/y components positive
            np.testing.assert_allclose(B[:, 2], n_unit, atol=1e-5)
        # v = n x u (right-handed)
        np.testing.assert_allclose(
            B[:, 1], np.cross(B[:, 2], B[:, 0]), atol=1e-5
        )


def test_plane_basis_straight_up_is_identity():
    B = geometry.plane_basis([0.0, 0.0, 1.0], noise_sd=0.0)
    np.testing.assert_allclose(B, np.eye(3), atol=1e-7)


def test_plane_axis_span_semantics():
    # hd = span // 2 (floor), inclusive linspace with `dim` points
    g = geometry.plane_axis(15.0, 8)
    assert g[0] == -7.0 and g[-1] == 7.0 and len(g) == 8


def test_sample_plane_matches_host_grid():
    rng = np.random.RandomState(7)
    vol = make_volume(rng, shape=(16, 16, 16), C=1)
    spacing = np.ones(3, np.float32)
    origin = -np.array([7.5, 7.5, 7.5], np.float32)
    view = np.array([0.3, -0.5, 0.8])
    span, dim, offset = 12.0, 10, 1.5

    grid, g, inv_basis = geometry.sample_plane_grid(
        view, dim, span, offset, noise_sd=0.0, return_basis=True
    )
    pts_host = np.moveaxis(grid[:, :, :, 0], 0, -1)  # (d, d, 3)
    want = interp.grid_gather_np(vol, origin, spacing, pts_host,
                                 method="linear", fill=[0.0])

    basis = geometry.plane_basis(view, noise_sd=0.0)
    got = np.asarray(
        interp.sample_plane(vol, origin, spacing, jnp.eye(3), basis, offset,
                            span, dim, jnp.zeros(1))
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sample_plane_stack_layout():
    """Stack layout is (d, d, P, C) with planes on axis 2."""
    rng = np.random.RandomState(1)
    vol = make_volume(rng, shape=(12, 12, 12), C=2)
    spacing = np.ones(3, np.float32)
    origin = -np.array([5.5, 5.5, 5.5], np.float32)
    basis = geometry.plane_basis([0.1, 0.2, 0.9], noise_sd=0.0)
    offsets = jnp.linspace(-4.0, 4.0, 5)
    stack = np.asarray(
        interp.sample_plane_stack(vol, origin, spacing, jnp.eye(3), basis,
                                  offsets, 10.0, 8, jnp.zeros(2))
    )
    assert stack.shape == (8, 8, 5, 2)
    single = np.asarray(
        interp.sample_plane(vol, origin, spacing, jnp.eye(3), basis,
                            float(offsets[2]), 10.0, 8, jnp.zeros(2))
    )
    np.testing.assert_allclose(stack[:, :, 2], single, atol=1e-5)


def test_sample_plane_batch_matches_individuals():
    rng = np.random.RandomState(5)
    vol = make_volume(rng, shape=(10, 10, 10), C=1)
    spacing = np.ones(3, np.float32)
    origin = -np.array([4.5, 4.5, 4.5], np.float32)
    bases = np.stack([
        geometry.plane_basis(rng.normal(size=3), noise_sd=0.0) for _ in range(4)
    ])
    offsets = jnp.array([-1.0, 0.0, 0.5, 2.0])
    batch = np.asarray(
        interp.sample_plane_batch(vol, origin, spacing, jnp.eye(3),
                                  jnp.asarray(bases), offsets, 8.0, 8, jnp.zeros(1))
    )
    assert batch.shape == (4, 8, 8, 1)
    for b in range(4):
        single = np.asarray(
            interp.sample_plane(vol, origin, spacing, jnp.eye(3), bases[b],
                                float(offsets[b]), 8.0, 8, jnp.zeros(1))
        )
        np.testing.assert_allclose(batch[b], single, atol=1e-5)


def test_map_view_pred_round_trip():
    """Predict-stack remap: sampling a volume's one-hot labels along +z planes
    and mapping back must reproduce the labels on interior voxels."""
    rng = np.random.RandomState(11)
    n_classes = 3
    shape = (9, 9, 9)
    labels = rng.randint(0, n_classes, size=shape)
    onehot = np.eye(n_classes, dtype=np.float32)[labels]

    spacing = np.ones(3, np.float32)
    origin = -np.array([4.0, 4.0, 4.0], np.float32)
    basis = np.eye(3, dtype=np.float32)  # +z view, identity basis

    # span // 2 = 4 -> plane axis linspace(-4, 4, 9) == centered voxel axis
    dim, span = 9, 8.0
    g = geometry.plane_axis(span, dim)
    np.testing.assert_allclose(g, np.arange(9) - 4.0)

    offsets = jnp.asarray(g)
    stack = np.asarray(
        interp.sample_plane_stack(jnp.asarray(onehot), origin, spacing,
                                  jnp.eye(3), jnp.asarray(basis), offsets,
                                  span, dim, jnp.zeros(n_classes),
                                  method="nearest")
    )
    # Map back to voxel grid
    vox_pts = np.stack(np.meshgrid(*[np.arange(9) - 4.0] * 3, indexing="ij"),
                       axis=-1).astype(np.float32)
    mapped = np.asarray(
        interp.map_view_pred_to_voxels(
            jnp.asarray(stack),
            jnp.array([g[0], g[1] - g[0]], np.float32),
            jnp.array([float(offsets[0]), float(offsets[1] - offsets[0])], np.float32),
            jnp.asarray(np.linalg.inv(basis)),
            jnp.asarray(vox_pts),
        )
    )
    np.testing.assert_allclose(mapped, onehot, atol=1e-5)


def test_rotated_affine_alignment():
    """For a rotated affine, rot @ centered_real_position must land on the
    centered axis-aligned grid (the reference's apply_rotation semantics)."""
    shape = (6, 7, 8)
    pixdim = np.array([1.0, 2.0, 0.5])
    R = geometry.rotation_matrix([1, 1, 0], angle_deg=20)
    affine = np.eye(4)
    affine[:3, :3] = R @ np.diag(pixdim)

    origin, spacing, rot = geometry.voxel_axes_origin_spacing(shape, affine)
    np.testing.assert_allclose(spacing, pixdim, atol=1e-6)
    assert rot is not None

    real = geometry.get_voxel_grid_real_space(shape, affine)  # (3, X, Y, Z)
    pts = geometry.mgrid_to_points(real)
    aligned = pts @ rot.T
    # voxel (i, j, k) -> ((i - (n-1)/2) * pixdim, ...)
    idx = np.stack(np.meshgrid(*[np.arange(n) for n in shape], indexing="ij"),
                   axis=-1).reshape(-1, 3)
    want = (idx - (np.array(shape) - 1) / 2) * pixdim
    np.testing.assert_allclose(aligned, want, atol=1e-4)


def test_sample_box_identity_alignment():
    """A box aligned with the voxel grid reproduces the volume exactly."""
    rng = np.random.RandomState(2)
    vol = make_volume(rng, shape=(8, 8, 8), C=1)
    spacing = np.ones(3, np.float32)
    origin = -np.array([3.5, 3.5, 3.5], np.float32)
    got = np.asarray(
        interp.sample_box(vol, origin, spacing, jnp.eye(3),
                          jnp.asarray(origin), 7.0, jnp.eye(3), 8,
                          jnp.zeros(1))
    )
    np.testing.assert_allclose(got, vol, atol=1e-5)


def test_view_generation_properties():
    rng = np.random.RandomState(0)
    views = geometry.get_random_views(100, rng=rng)
    np.testing.assert_allclose(np.linalg.norm(views, axis=1), 1.0, atol=1e-6)
    assert np.all(views[:, -1] >= 0)

    views = geometry.sample_random_views_with_angle_restriction(6, 60, rng=rng)
    assert views.shape == (6, 3)
    from itertools import combinations
    for v1, v2 in combinations(views, 2):
        assert geometry.get_angle_deg(v1, v2) > 0


def test_packed_gather_matches_unpacked():
    """Single-gather corner-packed trilinear must equal the 8-gather path."""
    rng = np.random.RandomState(9)
    vol = make_volume(rng, shape=(10, 12, 14), C=2)
    spacing = np.array([1.0, 0.7, 0.5], np.float32)
    origin = np.array([-(s - 1) / 2 * sp for s, sp in zip(vol.shape, spacing)],
                      np.float32)
    pts = (rng.rand(300, 3) * 12 - 6).astype(np.float32)
    fill = np.array([3.0, -1.0], np.float32)

    want = np.asarray(interp.grid_gather(vol, origin, spacing, pts,
                                         method="linear", fill=fill))
    packed = interp.pack_corners(jnp.asarray(vol))
    got = np.asarray(interp.grid_gather_packed(packed, origin, spacing, pts,
                                               fill=fill))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # And with a dynamic valid_shape over a padded volume
    padded = np.zeros((16, 16, 16, 2), np.float32)
    padded[:10, :12, :14] = vol
    packed_pad = interp.pack_corners(jnp.asarray(padded))
    got_pad = np.asarray(interp.grid_gather_packed(
        packed_pad, origin, spacing, pts, fill=fill,
        valid_shape=jnp.asarray(np.array(vol.shape[:3], np.int32)),
    ))
    np.testing.assert_allclose(got_pad, want, atol=1e-5)


def test_pool_gather_matches_direct():
    """grid_gather_pool on a slot == grid_gather on that volume (both
    methods), including out-of-bounds fill."""
    rng = np.random.RandomState(12)
    vols = [make_volume(rng, shape=(8, 8, 8), C=2) for _ in range(3)]
    pool = jnp.asarray(np.stack(vols))
    spacing = np.array([1.0, 0.5, 2.0], np.float32)
    origin = -np.array([3.5, 1.75, 7.0], np.float32)
    pts = (rng.rand(100, 3) * 10 - 5).astype(np.float32)
    fill = np.array([5.0, -2.0], np.float32)
    for slot in range(3):
        for method in ("linear", "nearest"):
            want = np.asarray(interp.grid_gather(
                vols[slot], origin, spacing, pts, method=method, fill=fill
            ))
            got = np.asarray(interp.grid_gather_pool(
                pool, jnp.asarray(slot), origin, spacing, pts,
                method=method, fill=fill,
                valid_shape=jnp.asarray(np.array([8, 8, 8], np.int32)),
            ))
            np.testing.assert_allclose(got, want, atol=1e-6)


def test_pool_packed_gather_matches_linear():
    """grid_gather_pool_packed (one-gather trilinear over a FLAT
    corner-packed pool) == grid_gather_pool(method='linear') for every
    slot, including out-of-bounds fill and a valid_shape smaller than
    the padded pool."""
    rng = np.random.RandomState(13)
    vols = [make_volume(rng, shape=(8, 8, 8), C=2) for _ in range(3)]
    pool = jnp.asarray(np.stack(vols))
    packed = jnp.concatenate(
        [interp.pack_corners(jnp.asarray(v)).reshape(-1) for v in vols])
    spacing = np.array([1.0, 0.5, 2.0], np.float32)
    origin = -np.array([3.5, 1.75, 7.0], np.float32)
    pts = (rng.rand(200, 3) * 10 - 5).astype(np.float32)
    fill = np.array([5.0, -2.0], np.float32)
    for slot in range(3):
        for valid in (np.array([8, 8, 8], np.int32),
                      np.array([8, 6, 7], np.int32)):
            want = np.asarray(interp.grid_gather_pool(
                pool, jnp.asarray(slot), origin, spacing, pts,
                method="linear", fill=fill, valid_shape=jnp.asarray(valid),
            ))
            got = np.asarray(interp.grid_gather_pool_packed(
                packed, (8, 8, 8, 2), jnp.asarray(slot), origin, spacing,
                pts, fill=fill, valid_shape=jnp.asarray(valid),
            ))
            np.testing.assert_allclose(got, want, atol=1e-6)


def test_plane_basis_batch_matches_scalar():
    """plane_basis_batch == N sequential plane_basis calls — including
    the rng stream (a normal(size=(N,3)) draw equals N row-major
    normal(size=3) draws on the legacy generator), the pointing-up
    abs() branch and the degenerate straight-up branch."""
    rng = np.random.RandomState(7)
    views = np.concatenate([
        rng.rand(40, 3) * 2 - 1,
        [[0.0, 0.0, 1.0]],          # degenerate: straight up
        [[0.05, -0.9, 0.1]],        # signed < 0.2 branch
    ])
    views /= np.linalg.norm(views, axis=1, keepdims=True)

    # no-noise arm (f32-ULP tolerance: float64 op ORDER differs between
    # the einsum/batched-norm forms and the scalar dot/cross chain)
    want = np.stack([geometry.plane_basis(v, noise_sd=0.0) for v in views])
    got = geometry.plane_basis_batch(views, noise_sd=0.0)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)

    # noisy arm: same pre-drawn noise rows through both forms
    noise = np.random.RandomState(8).normal(scale=0.1, size=views.shape)
    want = np.stack([
        geometry.plane_basis(v, noise_sd=noise[i])
        for i, v in enumerate(views)
    ])
    got = geometry.plane_basis_batch(views, noise_sd=noise)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)

    # stream equivalence: one batched normal draw == sequential draws
    r1, r2 = np.random.RandomState(9), np.random.RandomState(9)
    batch = r1.normal(scale=0.1, size=(5, 3))
    seq = np.stack([r2.normal(scale=0.1, size=3) for _ in range(5)])
    np.testing.assert_array_equal(batch, seq)
