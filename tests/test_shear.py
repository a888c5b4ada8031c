"""Shear-decomposed affine resampler vs the exact gather reference."""
import numpy as np
import pytest

import jax.numpy as jnp

from multiplanarunet_tpu.ops.interp import grid_gather_np
from multiplanarunet_tpu.ops.shear import (
    _compose,
    factor_affine,
    plan_affine_resample,
    shear_resample,
    shear_resample_np,
)


def _random_affine(rng, scale_aniso=True):
    """Random rotation (possibly anisotropic scaled) + translation."""
    A = rng.randn(3, 3)
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    s = np.diag(1.0 + (rng.rand(3) * 0.8 - 0.3)) if scale_aniso else np.eye(3)
    return Q @ s


def _dense_reference(src, N, c, out_shape, fill, method):
    ii, jj, kk = np.meshgrid(*[np.arange(s) for s in out_shape],
                             indexing="ij")
    pts = np.stack([ii, jj, kk], -1).astype(np.float64) @ N.T + c
    return grid_gather_np(src, np.zeros(3), np.ones(3),
                          pts.astype(np.float32), method=method, fill=fill)


def test_factorization_composes_to_matrix():
    rng = np.random.RandomState(0)
    for _ in range(20):
        N = _random_affine(rng)
        perm, ops = factor_affine(N)
        assert perm is not None
        M, _ = _compose(ops)
        np.testing.assert_allclose(M, N[list(perm), :], atol=1e-9)


def test_identity_resample_exact():
    rng = np.random.RandomState(1)
    src = rng.rand(12, 14, 10, 2).astype(np.float32)
    plan = plan_affine_resample(np.eye(3), np.zeros(3), src.shape[:3],
                                src.shape[:3])
    out = shear_resample_np(src, plan, fill=[9.0, 9.0])
    np.testing.assert_allclose(out, src, atol=1e-6)


def test_pure_translation_fill():
    rng = np.random.RandomState(2)
    src = rng.rand(10, 10, 10, 1).astype(np.float32)
    plan = plan_affine_resample(np.eye(3), np.array([4.0, 0.0, 0.0]),
                                src.shape[:3], src.shape[:3])
    out = shear_resample_np(src, plan, fill=[7.0])
    np.testing.assert_allclose(out[:6], src[4:], atol=1e-6)
    np.testing.assert_allclose(out[6:], 7.0)


@pytest.mark.parametrize("method", ["linear", "nearest"])
def test_random_affine_matches_dense_gather(method):
    rng = np.random.RandomState(3)
    src_shape, out_shape = (20, 24, 18), (22, 20, 21)
    if method == "linear":
        # Smooth source: separable lerp ~= trilinear up to mild smoothing
        g = np.meshgrid(*[np.linspace(0, 3, s) for s in src_shape],
                        indexing="ij")
        src = np.stack([np.sin(g[0] + 2 * g[1]) + g[2],
                        np.cos(g[1]) * g[0]], -1).astype(np.float32)
    else:
        # Piecewise-constant blobs: per-pass rounding displaces the
        # selected voxel by <=~1, so values differ only at blob boundaries
        from scipy import ndimage as ndi

        lab = ndi.grey_closing(rng.randint(0, 5, src_shape), size=6)
        src = np.stack([lab, 10 - lab], -1).astype(np.float32)
    fill = np.array([5.5, -5.5], np.float32)
    for trial in range(5):
        N = _random_affine(rng)
        c = np.array([9.0, 11.0, 8.0]) + rng.randn(3) - \
            N @ (np.asarray(out_shape) / 2.0)
        ref = _dense_reference(src, N, c, out_shape, fill, method)
        plan = plan_affine_resample(N, c, src_shape, out_shape)
        assert plan.valid
        out = shear_resample_np(src, plan, fill, method=method,
                                exact_bounds=(N, c))
        inside_ref = ~np.all(ref == fill, axis=-1)
        inside_out = ~np.all(np.isclose(out, fill), axis=-1)
        # In/out decision is closed-form => essentially exact agreement
        agree_frac = (inside_ref == inside_out).mean()
        assert agree_frac > 0.999, (trial, agree_frac)
        # Values: compare away from the border shell (blending with pads
        # is compensated by the validity division but not exactly)
        from scipy import ndimage

        core = ndimage.binary_erosion(inside_ref, iterations=2)
        if method == "linear":
            # Sequential 1D lerps smooth slightly more than joint trilinear
            # on curvy signals; exactness on affine fields is tested below
            err = np.abs(out[core] - ref[core])
            assert np.percentile(err, 99) < 0.15, (trial, err.max())
        else:
            match = np.isclose(out[core], ref[core], atol=1e-5).mean()
            assert match > 0.85, (trial, match)


def test_affine_field_exact():
    """Separable linear interpolation is exact for affine functions of
    position — any systematic error would be an offset/extent bug."""
    rng = np.random.RandomState(7)
    src_shape, out_shape = (20, 24, 18), (22, 20, 21)
    g = np.meshgrid(*[np.arange(s, dtype=np.float64) for s in src_shape],
                    indexing="ij")
    src = (1.5 * g[0] - 0.7 * g[1] + 0.3 * g[2] + 2.0)[..., None]
    from scipy import ndimage

    for _ in range(5):
        N = _random_affine(rng)
        c = np.array([9.0, 11.0, 8.0]) - N @ (np.asarray(out_shape) / 2.0)
        plan = plan_affine_resample(N, c, src_shape, out_shape)
        out = shear_resample_np(src, plan, [0.0], method="linear",
                                exact_bounds=(N, c))
        ii, jj, kk = np.meshgrid(*[np.arange(s) for s in out_shape],
                                 indexing="ij")
        pts = np.stack([ii, jj, kk], -1).astype(np.float64) @ N.T + c
        ref = (1.5 * pts[..., 0] - 0.7 * pts[..., 1]
               + 0.3 * pts[..., 2] + 2.0)[..., None]
        inside = np.all((pts >= 0) & (pts <= np.asarray(src_shape) - 1), -1)
        # A boundary shell gets edge-extension (lerp neighbors poke outside
        # the sheared data region; with row scales folded into the shears,
        # |alpha| can exceed 1 so the reach spans a few voxels more); beyond
        # it the resample is exact for affine fields
        core = ndimage.binary_erosion(inside, iterations=7)
        if core.any():
            assert np.abs(out[core] - ref[core]).max() < 1e-6


def test_jnp_matches_numpy_twin():
    rng = np.random.RandomState(4)
    src = rng.rand(16, 14, 12, 3).astype(np.float32)
    N = _random_affine(rng)
    c = np.array([8.0, 7.0, 6.0]) - N @ np.array([7.0, 7.0, 7.0])
    plan = plan_affine_resample(N, c, src.shape[:3], (14, 15, 13))
    fill = np.array([1.0, 0.0, 0.0], np.float32)
    ref = shear_resample_np(src, plan, fill, exact_bounds=(N, c))
    out = np.asarray(shear_resample(jnp.asarray(src), plan, fill,
                                    exact_bounds=(N, c)))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_one_hot_argmax_agreement():
    """The integration-relevant criterion: argmax of remapped one-hot
    probability volumes agrees with the exact nearest gather."""
    rng = np.random.RandomState(5)
    n_classes = 4
    lab = rng.randint(0, n_classes, (24, 24, 24))
    # smooth labels into blobs for realism
    from scipy import ndimage

    lab = ndimage.grey_closing(lab, size=5)
    src = np.eye(n_classes, dtype=np.float32)[lab]
    fill = np.zeros(n_classes, np.float32)
    fill[0] = 1.0
    out_shape = (26, 25, 24)
    for trial in range(3):
        N = _random_affine(rng)
        c = np.array([12.0] * 3) - N @ (np.asarray(out_shape) / 2.0)
        ref = _dense_reference(src, N, c, out_shape, fill, "nearest")
        plan = plan_affine_resample(N, c, src.shape[:3], out_shape)
        out = shear_resample_np(src, plan, fill, method="linear",
                                exact_bounds=(N, c))
        agree = (out.argmax(-1) == ref.argmax(-1)).mean()
        assert agree > 0.93, (trial, agree)


@pytest.mark.parametrize("method", ["linear", "cubic"])
def test_matmul_pass_impl_matches_take(method):
    """The MXU (einsum) pass implementation must agree with the
    take_along_axis implementation to float tolerance."""
    rng = np.random.RandomState(9)
    src = rng.rand(14, 12, 10, 2).astype(np.float32)
    N = _random_affine(rng)
    c = np.array([7.0, 6.0, 5.0]) - N @ np.array([6.0, 6.0, 5.0])
    plan = plan_affine_resample(N, c, src.shape[:3], (12, 13, 11))
    assert plan.valid
    fill = np.array([2.0, -1.0], np.float32)
    a = np.asarray(shear_resample(jnp.asarray(src), plan, fill,
                                  method=method, exact_bounds=(N, c),
                                  impl="take"))
    b = np.asarray(shear_resample(jnp.asarray(src), plan, fill,
                                  method=method, exact_bounds=(N, c),
                                  impl="matmul"))
    np.testing.assert_allclose(a, b, atol=5e-4)


@pytest.mark.parametrize("method", ["linear", "cubic"])
def test_pallas_pass_impl_matches_take(method):
    """The Pallas banded-pass executor (interpret mode on CPU) must agree
    with the take_along_axis implementation to float tolerance."""
    rng = np.random.RandomState(11)
    src = rng.rand(20, 14, 10, 2).astype(np.float32)
    N = _random_affine(rng)
    c = np.array([10.0, 7.0, 5.0]) - N @ np.array([9.0, 6.0, 4.0])
    plan = plan_affine_resample(N, c, src.shape[:3], (16, 12, 14))
    assert plan.valid
    fill = np.array([2.0, -1.0], np.float32)
    a = np.asarray(shear_resample(jnp.asarray(src), plan, fill,
                                  method=method, exact_bounds=(N, c),
                                  impl="take"))
    b = np.asarray(shear_resample(jnp.asarray(src), plan, fill,
                                  method=method, exact_bounds=(N, c),
                                  impl="pallas"))
    np.testing.assert_allclose(a, b, atol=5e-4)


def test_pallas_pass_single_tile_pipeline_warmup():
    """Degenerate 1-grid-step passes: with total == 1 only the warm-up DMA
    branch of the double-buffered window pipeline runs (the issue-next
    branch is predicated off). Shapes <= 8 per axis make every elementary
    pass a single (q, rc, t) tile."""
    rng = np.random.RandomState(3)
    src = rng.rand(7, 8, 6, 1).astype(np.float32)
    N = _random_affine(rng)
    c = np.array([3.0, 4.0, 3.0]) - N @ np.array([3.0, 3.5, 2.5])
    plan = plan_affine_resample(N, c, src.shape[:3], (8, 7, 6))
    assert plan.valid
    fill = np.array([0.5], np.float32)
    a = np.asarray(shear_resample(jnp.asarray(src), plan, fill,
                                  method="linear", exact_bounds=(N, c),
                                  impl="take"))
    b = np.asarray(shear_resample(jnp.asarray(src), plan, fill,
                                  method="linear", exact_bounds=(N, c),
                                  impl="pallas"))
    np.testing.assert_allclose(a, b, atol=5e-4)


def test_remap_bf16_output_close_to_f32():
    """The bf16 remap mode (halved HBM peak; used when the f32 mapped
    volume would bust the 512^3-class budget) stays within bf16 rounding
    of the f32 result on softmax-like channel data."""
    rng = np.random.RandomState(7)
    src_shape, out_shape = (20, 24, 18), (22, 20, 21)
    src = rng.rand(*src_shape, 4).astype(np.float32)
    src /= src.sum(-1, keepdims=True)
    fill = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    N = _random_affine(rng)
    c = np.array([9.0, 11.0, 8.0]) - N @ (np.asarray(out_shape) / 2.0)
    plan = plan_affine_resample(N, c, src_shape, out_shape)
    assert plan.valid
    f32 = np.asarray(shear_resample(
        jnp.asarray(src), plan, fill, method="linear",
        compute_dtype=jnp.bfloat16, out_dtype=jnp.float32,
        exact_bounds=(N, c)))
    bf16 = np.asarray(shear_resample(
        jnp.asarray(src), plan, fill, method="linear",
        compute_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16,
        exact_bounds=(N, c))).astype(np.float32)
    assert bf16.dtype == np.float32  # cast back for comparison
    np.testing.assert_allclose(bf16, f32, atol=0.02)
    # argmax (the fused class decision) flips only on near-ties
    agree = (bf16.argmax(-1) == f32.argmax(-1)).mean()
    assert agree > 0.98, agree
