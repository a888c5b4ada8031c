"""Bit-level parity tests against the REFERENCE implementation itself.

The reference's numerical core (`mpunet/interpolation/`) is pure numpy/scipy,
so we can import it at test time (stubbing its nibabel import) and use it as
an oracle: our plane-basis construction and gather kernels must reproduce the
exact sample positions and interpolated values the reference produces. This
is the ground truth for "Dice parity depends on bit-for-bit-ish agreement of
sample positions" (SURVEY.md section 7).

The reference code is only EXECUTED here as an oracle — nothing is copied."""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def ref_modules():
    """Import the reference interpolation modules with nibabel stubbed."""
    if "nibabel" not in sys.modules:
        nib = types.ModuleType("nibabel")

        class _Hdr:
            quaternion_threshold = -1e-6

        nib.Nifti1Header = _Hdr
        nib.load = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("nibabel stub")
        )
        sys.modules["nibabel"] = nib
    # The reference vendors an old-scipy private helper; re-provide it
    import scipy.interpolate.interpnd as interpnd

    if not hasattr(interpnd, "_ndim_coords_from_arrays"):
        def _ndim_coords_from_arrays(points, ndim=None):
            if isinstance(points, tuple) and len(points) == 1:
                points = points[0]
            if isinstance(points, tuple):
                arrays = np.broadcast_arrays(*points)
                out = np.empty(arrays[0].shape + (len(arrays),),
                               dtype=np.result_type(*arrays))
                for i, a in enumerate(arrays):
                    out[..., i] = a
                return out
            points = np.asanyarray(points)
            if points.ndim == 1:
                points = points.reshape(-1, 1) if ndim is None or ndim > 1 \
                    else points[:, None]
            return points

        interpnd._ndim_coords_from_arrays = _ndim_coords_from_arrays
    # Make `mpunet` importable
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    import importlib

    rgi = importlib.import_module(
        "mpunet.interpolation.regular_grid_interpolator"
    )
    # sample_grid imports mpunet.interpolation.linalg (numpy only) + nibabel
    sample_grid = importlib.import_module("mpunet.interpolation.sample_grid")
    return rgi, sample_grid


def test_plane_basis_exact_parity(ref_modules):
    """Our plane basis == the reference's sample_plane_at basis, bit-for-bit
    up to float32 rounding, across many views including the mostly-up branch."""
    _, sample_grid = ref_modules
    from multiplanarunet_tpu.ops import geometry

    rng = np.random.RandomState(0)
    views = list(rng.normal(size=(40, 3)))
    views += [[0.0, 0.0, 1.0], [0.05, 0.05, 0.999], [-0.1, 0.15, 0.98]]
    for view in views:
        # Reference returns the full real-space grid; noise disabled via an
        # explicit zero ndarray (their API treats ndarray noise as given)
        grid, g, inv_basis = sample_grid.sample_plane_at(
            norm_vector=np.asarray(view, np.float64),
            sample_dim=8,
            real_space_span=20.0,
            offset_from_center=3.0,
            noise_sd=np.zeros(3),
            test_mode=True,
        )
        ours = geometry.sample_plane_grid(
            np.asarray(view, np.float64), 8, 20.0, 3.0,
            noise_sd=np.zeros(3), return_basis=True,
        )
        our_grid, our_g, our_inv = ours
        np.testing.assert_allclose(our_g, g, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(our_grid), np.asarray(grid), atol=1e-4
        )
        np.testing.assert_allclose(our_inv, inv_basis, atol=1e-4)


def test_gather_matches_reference_interpolator(ref_modules):
    """grid_gather == the reference's vendored RegularGridInterpolator on the
    same centered axes, for linear and nearest, in- and out-of-bounds."""
    rgi_mod, _ = ref_modules
    from multiplanarunet_tpu.ops.interp import grid_gather

    rng = np.random.RandomState(1)
    vol = rng.rand(9, 11, 13).astype(np.float32)
    spacing = np.array([1.0, 0.5, 0.25], np.float32)
    axes = tuple(
        ((np.arange(n) - (n - 1) / 2) * s).astype(np.float32)
        for n, s in zip(vol.shape, spacing)
    )
    origin = np.array([a[0] for a in axes], np.float32)
    pts = (rng.rand(400, 3) * 10 - 5).astype(np.float32)

    for method, fill in (("linear", 7.5), ("nearest", 0.0)):
        ref = rgi_mod.RegularGridInterpolator(
            axes, vol, method=method, bounds_error=False,
            fill_value=np.float32(fill), dtype=np.float32,
        )
        want = ref(pts)
        got = np.asarray(grid_gather(
            vol[..., None], origin, spacing, pts, method=method, fill=fill
        ))[..., 0]
        atol = 2e-5 if method == "linear" else 0.0
        np.testing.assert_allclose(got, want, atol=atol)


def test_knn_vote_matches_reference_interpolator(ref_modules):
    """grid_gather method='knn' == the reference's kNN neighbor-vote mode
    on softmax-like channel vectors (cubic volume: the reference clamps
    neighbor indices with a single axis size, so only cubic shapes are
    comparable — see the grid_gather docstring)."""
    rgi_mod, _ = ref_modules
    from multiplanarunet_tpu.ops.interp import grid_gather

    rng = np.random.RandomState(4)
    vol = rng.rand(10, 10, 10, 3).astype(np.float32)
    vol /= vol.sum(-1, keepdims=True)
    axes = tuple(np.arange(10, dtype=np.float32) - 4.5 for _ in range(3))
    origin = np.full(3, -4.5, np.float32)
    spacing = np.ones(3, np.float32)
    # Interior points only: at the grid boundary the reference's clamp-
    # then-undo neighbor bookkeeping corrupts the base index (+1 clamp to
    # size-1 followed by -1 lands on size-2) — a latent bug we do not
    # reproduce. Far out-of-bounds points exercise the vector fill.
    pts = np.concatenate([
        (rng.rand(300, 3) * 6.8 - 3.4),          # nearest idx in [1, 8]
        (rng.rand(20, 3) * 4.0 + 5.0),           # all out of bounds
    ]).astype(np.float32)

    fill = np.array([1.0, 0.0, 0.0], np.float32)
    ref = rgi_mod.RegularGridInterpolator(
        axes, vol, method="kNN", bounds_error=False, fill_value=fill,
        dtype=np.float32,
    )

    # The reference's _evaluate_NN indexes `values[list_of_index_arrays]`,
    # which numpy < 1.15 treated as tuple (multi-axis) indexing; restore
    # that legacy behavior on the oracle's value array only.
    class _LegacyIndexing(np.ndarray):
        def __getitem__(self, idx):
            if isinstance(idx, list):
                idx = tuple(idx)
            return super().__getitem__(idx)

    ref.values = ref.values.view(_LegacyIndexing)
    want = ref(pts)
    got = np.asarray(grid_gather(
        vol, origin, spacing, pts, method="knn", fill=fill))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_view_sampling_statistics_match(ref_modules):
    """get_random_views under a fixed seed matches the reference's generator
    (same formula: normalized gaussian deviates, +z hemisphere)."""
    _, sample_grid = ref_modules
    from multiplanarunet_tpu.ops import geometry

    np.random.seed(42)
    ref_views = sample_grid.get_random_views(20, dim=3, pos_z=True)
    np.random.seed(42)
    our_views = geometry.get_random_views(20, dim=3, pos_z=True)
    np.testing.assert_allclose(our_views, ref_views, atol=1e-12)


def test_box_grid_matches_reference(ref_modules):
    """sample_box_at grids (no rotation) coincide."""
    _, sample_grid = ref_modules
    from multiplanarunet_tpu.ops import geometry

    grid = sample_grid.sample_box_at(
        real_placement=(-10.0, -5.0, 2.0), sample_dim=6,
        real_box_dim=12.0, noise_sd=0.0, test_mode=False,
    )
    ours = geometry.sample_box_grid((-10.0, -5.0, 2.0), 6, 12.0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(grid), atol=1e-5)


def test_rotation_matrix_matches(ref_modules):
    from mpunet.interpolation import linalg as ref_linalg
    from multiplanarunet_tpu.ops import geometry

    rng = np.random.RandomState(2)
    for _ in range(10):
        axis = rng.normal(size=3)
        angle = rng.uniform(-180, 180)
        np.testing.assert_allclose(
            geometry.rotation_matrix(axis, angle_deg=angle),
            ref_linalg.get_rotation_matrix(axis, angle_deg=angle),
            atol=1e-12,
        )


def test_full_training_slice_parity(ref_modules):
    """Whole-pipeline slice parity: the reference's ViewInterpolator sampling
    a plane grid vs this framework's on-device gather on the same volume,
    basis and offset — including a ROTATED anisotropic affine, per-channel
    background fills and nearest-label semantics."""
    import importlib

    import jax.numpy as jnp

    from multiplanarunet_tpu.ops import geometry, interp

    vi_mod = importlib.import_module("mpunet.interpolation.view_interpolator")
    sg = importlib.import_module("mpunet.interpolation.sample_grid")

    rng = np.random.RandomState(3)
    image = rng.rand(20, 24, 18, 2).astype(np.float32)
    labels = rng.randint(0, 4, (20, 24, 18)).astype(np.uint8)
    R = geometry.rotation_matrix([0, 1, 1], angle_deg=15)
    affine = np.eye(4)
    affine[:3, :3] = R @ np.diag([1.0, 0.8, 1.3])

    ref_interp = vi_mod.ViewInterpolator(
        image, labels, affine=affine, bg_value=[2.5, -1.0], bg_class=0
    )

    origin, spacing, rot = geometry.voxel_axes_origin_spacing(
        image.shape, affine
    )
    rot = np.eye(3, dtype=np.float32) if rot is None else rot

    for view in ([0.2, -0.5, 0.9], [0.9, 0.1, 0.3], [0.0, 0.0, 1.0]):
        grid = sg.sample_plane_at(
            norm_vector=np.asarray(view, np.float64), sample_dim=16,
            real_space_span=20.0, offset_from_center=2.0,
            noise_sd=np.zeros(3), test_mode=False,
        )
        ref_im = ref_interp.intrp_image(grid)
        ref_lab = ref_interp.intrp_labels(grid)

        basis = geometry.plane_basis(view, noise_sd=np.zeros(3))
        got_im = np.asarray(interp.sample_plane(
            jnp.asarray(image), origin, spacing, jnp.asarray(rot),
            jnp.asarray(basis), 2.0, 20.0, 16,
            jnp.asarray([2.5, -1.0], jnp.float32),
        ))
        got_lab = np.asarray(interp.sample_plane(
            jnp.asarray(labels[..., None].astype(np.float32)), origin,
            spacing, jnp.asarray(rot), jnp.asarray(basis), 2.0, 20.0, 16,
            jnp.asarray([0.0]), method="nearest",
        ))[..., 0].astype(np.uint8)

        np.testing.assert_allclose(got_im, ref_im, atol=2e-4)
        # Nearest labels: allow a tiny fraction of half-voxel tie flips
        mismatch = (got_lab != ref_lab).mean()
        assert mismatch < 0.005, mismatch
