"""Parity against the REAL TF/Keras reference model — the acceptance gate.

The reference's Keras models (`/root/reference/mpunet/models/unet.py:26`,
`unet3D.py:26`) build and run in this environment under
``TF_USE_LEGACY_KERAS=1`` with small import shims (nibabel stub, np.int,
scipy.interpolate.interpnd._ndim_coords_from_arrays). These tests:

1. Build the reference Keras UNet / UNet3D, save real .h5 weights, import
   them through `mp convert_weights`, and assert LOGIT-level forward parity
   (max abs diff < 1e-4 f32) against this framework's flax models. Any
   transposed kernel, swapped BN moment, wrong layer mapping, filter-count
   or crop mismatch fails here.
2. Run the reference's own inference pipeline — `predict_volume` +
   `map_real_space_pred` (`mpunet/utils/fusion/fuse_and_predict.py:81-137`,
   pure numpy + Keras) over reference-sampled planes — on a toy volume, and
   assert the fused result matches this framework's fused predict graph
   (voxel agreement + Dice delta < 0.005), using the SAME converted weights.

This converts the "mean Dice within 0.5 points of the reference" criterion
from a claim into a regression gate. The reference code is only EXECUTED as
an oracle — nothing is copied."""
import os
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference tree not available"
)


def _install_reference_shims():
    """Make /root/reference/mpunet importable: stub nibabel, restore removed
    numpy/scipy symbols the 2020-era reference expects."""
    if "nibabel" not in sys.modules:
        nib = types.ModuleType("nibabel")

        class _Hdr:
            quaternion_threshold = -1e-6

        nib.Nifti1Header = _Hdr
        nib.Nifti1Image = type("Nifti1Image", (), {})
        nib.load = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("nibabel stub")
        )
        sys.modules["nibabel"] = nib
    if not hasattr(np, "int"):
        np.int = int  # removed in numpy>=1.24; reference crop code uses it
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
                points = points.reshape(-1, 1)
            return points

        interpnd._ndim_coords_from_arrays = _ndim_coords_from_arrays
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))


@pytest.fixture(scope="module")
def keras_env():
    """Reference package + legacy Keras, or skip if TF is unavailable."""
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    _install_reference_shims()
    tf = pytest.importorskip("tensorflow")
    if not os.environ.get("TF_USE_LEGACY_KERAS"):
        pytest.skip("legacy keras unavailable")
    import importlib

    def fresh_unet(name):
        """Re-import a reference model module so its class is pristine:
        legacy Keras's inject_functional_model_class MUTATES the model
        class bases on first build, breaking a second construction. Also
        clear the Keras session so layer auto-name counters restart
        (conv3d, conv3d_1, ... — the 3D model's save/load identity)."""
        tf.keras.backend.clear_session()
        return importlib.reload(importlib.import_module(name))

    mods = types.SimpleNamespace(
        tf=tf,
        fresh_unet=fresh_unet,
        unet=importlib.import_module("mpunet.models.unet"),
        unet3d=importlib.import_module("mpunet.models.unet3D"),
        fuse=importlib.import_module("mpunet.utils.fusion.fuse_and_predict"),
        sample_grid=importlib.import_module(
            "mpunet.interpolation.sample_grid"),
        view_interp=importlib.import_module(
            "mpunet.interpolation.view_interpolator"),
    )
    return mods


def _convert(h5_path):
    """Reference .h5 -> (params, batch_stats) trees via mp convert_weights."""
    from flax import traverse_util

    from multiplanarunet_tpu.bin.convert_weights import (
        _read_keras_h5,
        map_layers,
    )

    layers = _read_keras_h5(h5_path)
    p_flat, bs_flat = map_layers(layers, logger=lambda *a: None)
    unflat = lambda d: traverse_util.unflatten_dict(  # noqa: E731
        {tuple(k.split("/")): v for k, v in d.items()})
    return unflat(p_flat), unflat(bs_flat)


def test_unet2d_logit_parity(keras_env, tmp_path):
    """Converted real Keras weights reproduce reference logits bit-close.

    depth=2 and complexity_factor=2 exercise the non-trivial filter-count
    formula int(N * sqrt(cf)) and the full named-layer mapping."""
    import jax.numpy as jnp

    from multiplanarunet_tpu.models.unet import UNet

    keras_env.tf.random.set_seed(7)
    ref = keras_env.fresh_unet("mpunet.models.unet").UNet(
        n_classes=5, dim=32, n_channels=2, depth=2,
                              complexity_factor=2, out_activation="softmax")
    h5 = tmp_path / "w2d.h5"
    ref.save_weights(str(h5))

    x = np.random.RandomState(1).rand(3, 32, 32, 2).astype(np.float32)
    want = ref.predict(x, verbose=0)

    params, batch_stats = _convert(h5)
    ours = UNet(n_classes=5, dim=32, n_channels=2, depth=2,
                complexity_factor=2)
    got = np.asarray(ours.apply({"params": params,
                                 "batch_stats": batch_stats},
                                jnp.asarray(x), train=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)
    # param count parity as well (keras counts BN moving stats too)
    n_ref = ref.count_params()
    n_ours = ours.count_params(params) + ours.count_params(batch_stats)
    assert n_ref == n_ours, (n_ref, n_ours)


def test_unet3d_logit_parity(keras_env, tmp_path):
    """UNet3D saves UNNAMED layers (keras auto-names); the converter must
    reconstruct the creation-order mapping exactly."""
    import jax.numpy as jnp

    from multiplanarunet_tpu.models.unet3d import UNet3D

    keras_env.tf.random.set_seed(11)
    ref = keras_env.fresh_unet("mpunet.models.unet3D").UNet3D(
        n_classes=3, dim=16, n_channels=1, depth=2,
                                  complexity_factor=1)
    h5 = tmp_path / "w3d.h5"
    ref.save_weights(str(h5))

    x = np.random.RandomState(2).rand(2, 16, 16, 16, 1).astype(np.float32)
    want = ref.predict(x, verbose=0)

    params, batch_stats = _convert(h5)
    ours = UNet3D(n_classes=3, dim=16, n_channels=1, depth=2,
                  complexity_factor=1)
    got = np.asarray(ours.apply({"params": params,
                                 "batch_stats": batch_stats},
                                jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, atol=1e-4)


def _random_variables(model, shape, seed):
    """Init a flax model and randomize its BN statistics/affine so exports
    cannot pass with swapped BN leaves."""
    import jax
    import jax.numpy as jnp

    from multiplanarunet_tpu.models.unet import init_unet

    params, bs = init_unet(model, jax.random.PRNGKey(seed), shape)
    rng = np.random.RandomState(seed)
    bs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.uniform(0.5, 1.5, a.shape).astype(np.float32)), bs)
    return params, bs


def test_export_loads_into_real_keras_2d(keras_env, tmp_path):
    """`mp export_weights` output loads into the ACTUAL reference Keras
    UNet (by name) and reproduces our logits — the 'switch back'
    direction of the conversion story."""
    import jax.numpy as jnp

    from multiplanarunet_tpu.bin.export_weights import export_h5
    from multiplanarunet_tpu.models.unet import UNet

    ours = UNet(n_classes=3, dim=32, n_channels=2, depth=2,
                complexity_factor=2)
    params, bs = _random_variables(ours, (1, 32, 32, 2), seed=13)
    h5 = tmp_path / "export2d.h5"
    export_h5(params, bs, h5, logger=lambda *a: None)

    ref = keras_env.fresh_unet("mpunet.models.unet").UNet(
        n_classes=3, dim=32, n_channels=2, depth=2, complexity_factor=2)
    ref.load_weights(str(h5), by_name=True)

    x = np.random.RandomState(3).rand(2, 32, 32, 2).astype(np.float32)
    want = np.asarray(ours.apply(
        {"params": params, "batch_stats": bs}, jnp.asarray(x),
        train=False))
    got = ref.predict(x, verbose=0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_export_loads_into_real_keras_3d(keras_env, tmp_path):
    """3D export: auto-named layers load topologically into the reference
    UNet3D."""
    import jax.numpy as jnp

    from multiplanarunet_tpu.bin.export_weights import export_h5
    from multiplanarunet_tpu.models.unet3d import UNet3D

    ours = UNet3D(n_classes=3, dim=16, n_channels=1, depth=2,
                  complexity_factor=1)
    params, bs = _random_variables(ours, (1, 16, 16, 16, 1), seed=17)
    h5 = tmp_path / "export3d.h5"
    export_h5(params, bs, h5, logger=lambda *a: None)

    ref = keras_env.fresh_unet("mpunet.models.unet3D").UNet3D(
        n_classes=3, dim=16, n_channels=1, depth=2, complexity_factor=1)
    ref.load_weights(str(h5))  # topological: names are fresh-session autos

    x = np.random.RandomState(4).rand(1, 16, 16, 16, 1).astype(np.float32)
    want = np.asarray(ours.apply(
        {"params": params, "batch_stats": bs}, jnp.asarray(x),
        train=False))
    got = ref.predict(x, verbose=0)
    np.testing.assert_allclose(got, want, atol=1e-4)


# --------------------------------------------------------------------------
# End-to-end: reference inference pipeline vs our fused predict graph
# --------------------------------------------------------------------------

DIM = 32          # sample_dim (divisible by 2^depth)
SPAN = 30.0       # real_space_span
N_CLASSES = 4


def _toy_image(root):
    """A toy ImagePair: smooth random intensities + blocky labels on an
    anisotropic (but axis-aligned) affine."""
    from multiplanarunet_tpu.image import ImagePair
    from multiplanarunet_tpu.io import nifti

    rng = np.random.RandomState(5)
    size = 28
    img = rng.rand(size, size, size).astype(np.float32)
    # cheap separable smoothing for spatial structure
    k = np.array([1, 4, 6, 4, 1], np.float32)
    k /= k.sum()
    for ax in range(3):
        img = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, img)
    lab = np.zeros((size, size, size), np.uint8)
    lab[4:14, 4:14, 4:14] = 1
    lab[16:24, 6:16, 8:18] = 2
    lab[6:12, 16:24, 16:24] = 3
    affine = np.diag([1.0, 0.9, 1.1, 1.0])
    ip = root / "images" / "img.nii.gz"
    lp = root / "labels" / "img.nii.gz"
    ip.parent.mkdir(parents=True)
    lp.parent.mkdir(parents=True)
    nifti.save(img, ip, affine=affine)
    nifti.save(lab, lp, affine=affine)
    pair = ImagePair(ip, lp)
    pair.set_bg_value(0.0)
    pair.set_scaler(None, compute_now=True)
    pair.load()
    return pair, lab


def _reference_fused_predict(keras_env, keras_model, pair, views,
                             dim=None, span=None):
    """The reference's OWN inference path: per-view plane sampling
    (sample_plane_at + ViewInterpolator, as get_view_from does), Keras
    predict_volume, map_real_space_pred nearest remap, sum fusion."""
    fuse = keras_env.fuse
    sg = keras_env.sample_grid
    dim = DIM if dim is None else dim
    span = SPAN if span is None else span

    sampler = pair.interpolator
    vol = np.asarray(sampler.scaled_volume)  # (X, Y, Z, C), scaled units
    bg = [float(v) for v in np.asarray(sampler.scaled_bg_value).ravel()]
    ref_interp = keras_env.view_interp.ViewInterpolator(
        vol, None, affine=np.asarray(pair.affine), bg_value=bg, bg_class=0)

    class _Im:  # duck-typed `images` for get_voxel_grid_real_space
        shape = vol.shape
        affine = np.asarray(pair.affine)

    vox_grid = sg.get_voxel_grid_real_space(_Im)

    # "same+20" offsets (isotrophic_live_view_sequence_2d.get_view_from)
    res = span / (dim - 1)
    n_planes = dim + 20
    bounds = (span + 20 * res) / 2
    offsets = np.linspace(-bounds, bounds, n_planes)

    fused = None
    for view in views:
        X = np.empty((dim, dim, n_planes, vol.shape[-1]), np.float32)
        for i, off in enumerate(offsets):
            grid, real_axis, inv_basis = sg.sample_plane_at(
                norm_vector=view, sample_dim=dim, real_space_span=span,
                noise_sd=0.0, test_mode=True, offset_from_center=off)
            im, _ = ref_interp(grid)
            X[..., i, :] = im.reshape(dim, dim, vol.shape[-1])
        pred = fuse.predict_volume(keras_model, X, axis=2)
        mapped = fuse.map_real_space_pred(
            pred, (real_axis, real_axis, offsets), inv_basis, vox_grid,
            method="nearest")
        fused = mapped if fused is None else fused + mapped
    return fused


def test_end_to_end_fused_parity(keras_env, tmp_path):
    """Fused multi-view prediction: reference pipeline (Keras model +
    numpy sampling/remap) vs this framework's fused graph, same weights.

    Gates: fused argmax maps agree on > 99% of voxels and the per-class
    Dice (vs the toy labels) differs by < 0.005 — the acceptance
    criterion's regression form."""
    from multiplanarunet_tpu.evaluate.metrics import dice_all
    from multiplanarunet_tpu.models.unet import UNet
    from multiplanarunet_tpu.ops import geometry
    from multiplanarunet_tpu.utils.fusion import MultiViewPredictor

    keras_env.tf.random.set_seed(3)
    ref_model = keras_env.fresh_unet("mpunet.models.unet").UNet(
        n_classes=N_CLASSES, dim=DIM, n_channels=1, depth=2,
        complexity_factor=1, out_activation="softmax")
    # sharpen the (random-init) softmax so argmax is confident everywhere;
    # parity, not segmentation quality, is under test here
    out_layer = ref_model.layers[-1]
    k, b = out_layer.get_weights()
    out_layer.set_weights([k * 25.0, b])
    h5 = tmp_path / "e2e.h5"
    ref_model.save_weights(str(h5))

    pair, lab = _toy_image(tmp_path)
    views = geometry.get_random_views(3, rng=np.random.RandomState(9))

    ref_fused = _reference_fused_predict(keras_env, ref_model, pair, views)
    ref_cls = ref_fused.argmax(-1).astype(np.uint8)

    params, batch_stats = _convert(h5)
    ours = UNet(n_classes=N_CLASSES, dim=DIM, n_channels=1, depth=2,
                complexity_factor=1)
    # gather = exact joint-trilinear sampling, the reference's semantics;
    # the shear resampler's (bounded) delta vs gather is covered by
    # test_predict_graph + the N=20 cohort comparison.
    predictor = MultiViewPredictor(
        ours, {"params": params, "batch_stats": batch_stats},
        sample_dim=DIM, real_space_span=SPAN, n_classes=N_CLASSES,
        resampler="gather")
    fused, _ = predictor.predict_image(pair, views, fusion_params=None,
                                       n_planes="same+20",
                                       return_per_view=False,
                                       return_probs=True)
    our_cls = np.asarray(fused).argmax(-1).astype(np.uint8)

    agree = (our_cls == ref_cls).mean()
    print(f"\nfused argmax agreement: {agree:.5f}")
    assert agree > 0.99, f"fused argmax agreement {agree:.4f}"

    ref_dice = dice_all(lab, ref_cls, n_classes=N_CLASSES, ignore_zero=True)
    our_dice = dice_all(lab, our_cls, n_classes=N_CLASSES, ignore_zero=True)
    delta = np.abs(np.nanmean(ref_dice) - np.nanmean(our_dice))
    print(f"dice: ref {np.nanmean(ref_dice):.5f} ours "
          f"{np.nanmean(our_dice):.5f} delta {delta:.6f}")
    assert delta < 0.005, (
        f"fused dice delta {delta:.5f} (ref {np.nanmean(ref_dice):.4f} "
        f"vs ours {np.nanmean(our_dice):.4f})")
