"""End-to-end geometry validation of the fused predict graphs.

Trick: use a 'oracle' model that converts its input intensity directly into
one-hot class probabilities, and feed it the LABEL volume as the image. The
multi-view sample -> predict -> remap -> fuse pipeline must then reconstruct
the original label volume almost exactly — validating every geometric stage
without training a network."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from multiplanarunet_tpu.image import ImagePair
from multiplanarunet_tpu.io import nifti
from multiplanarunet_tpu.logging import ScreenLogger
from multiplanarunet_tpu.ops import geometry
from multiplanarunet_tpu.sequences import get_sequence
from multiplanarunet_tpu.utils.fusion import (
    MultiViewPredictor,
    pred_3D_iso,
    predict_3D_patches,
)

N_CLASSES = 4
SIZE = 24


class OneHotOracle(nn.Module):
    """'Model' returning one_hot(round(input intensity)) — ground truth."""

    n_classes: int = N_CLASSES

    @nn.compact
    def __call__(self, x, train=False):
        cls = jnp.clip(jnp.round(x[..., 0]), 0, self.n_classes - 1)
        return jax.nn.one_hot(cls.astype(jnp.int32), self.n_classes)


@pytest.fixture(scope="module")
def label_image(tmp_path_factory):
    """An ImagePair whose IMAGE is its own label map (blocky structures)."""
    root = tmp_path_factory.mktemp("oracle")
    rng = np.random.RandomState(0)
    lab = np.zeros((SIZE, SIZE, SIZE), np.uint8)
    lab[4:12, 4:12, 4:12] = 1
    lab[14:20, 6:14, 8:16] = 2
    lab[6:10, 14:20, 14:20] = 3
    affine = np.eye(4)
    ip = root / "images" / "img.nii.gz"
    lp = root / "labels" / "img.nii.gz"
    ip.parent.mkdir()
    lp.parent.mkdir()
    nifti.save(lab.astype(np.float32), ip, affine=affine)
    nifti.save(lab, lp, affine=affine)
    pair = ImagePair(ip, lp)
    pair.set_bg_value(0.0)
    pair.set_scaler(None, compute_now=True)  # NoOp — intensities are classes
    pair.load()
    return pair, lab


def _predictor(resampler="auto"):
    model = OneHotOracle()
    variables = {"params": {}}
    return MultiViewPredictor(
        model, variables, sample_dim=SIZE, real_space_span=float(SIZE - 2),
        n_classes=N_CLASSES, chunk=4, resampler=resampler,
    )


@pytest.mark.parametrize("resampler,thresh,thresh_v,sum_atol",
                         [("gather", 0.97, 0.93, 1e-4),
                          ("shear", 0.95, 0.91, 1e-2)])
def test_multi_view_predict_reconstructs_labels(label_image, resampler,
                                                thresh, thresh_v, sum_atol):
    """Oracle reconstruction per resampler. The shear threshold is slightly
    lower: its separable-linear FORWARD sampling smooths the label-as-
    intensity input more than joint trilinear, which the round()-oracle
    punishes at structure boundaries (production inputs are real
    intensities, where this is a sub-voxel blur; the remap itself is
    geometry-exact — see test_shear.test_affine_field_exact)."""
    pair, lab = label_image
    rng = np.random.RandomState(3)
    views = geometry.get_random_views(4, rng=rng)
    pred = _predictor(resampler)
    fused, per_view = pred.predict_image(pair, views, fusion_params=None,
                                         n_planes="same+20",
                                         return_probs=True)
    assert fused.shape == lab.shape + (N_CLASSES,)
    np.testing.assert_allclose(fused.sum(-1), 1.0, atol=sum_atol)
    fused_cls = fused.argmax(-1)
    # Interior accuracy must be near-perfect (boundary voxels can flip)
    interior = np.zeros_like(lab, bool)
    interior[2:-2, 2:-2, 2:-2] = True
    acc = (fused_cls == lab)[interior].mean()
    assert acc > thresh, acc
    # Each per-view argmax map is itself a good reconstruction
    for pv in per_view:
        acc_v = (pv == lab)[interior].mean()
        assert acc_v > thresh_v, acc_v


@pytest.mark.parametrize("resampler,thresh", [("gather", 0.97),
                                              ("shear", 0.95)])
def test_learned_fusion_weights_apply(label_image, resampler, thresh):
    pair, lab = label_image
    views = geometry.get_random_views(3, rng=np.random.RandomState(1))
    pred = _predictor(resampler)
    fusion_params = {
        "fusion": {
            "W": np.ones((3, N_CLASSES), np.float32),
            "b": np.zeros((1, N_CLASSES), np.float32),
        }
    }
    fused, _ = pred.predict_image(pair, views, fusion_params=fusion_params,
                                  return_per_view=False, return_probs=True)
    np.testing.assert_allclose(fused.sum(-1), 1.0, atol=1e-4)
    interior = np.zeros_like(lab, bool)
    interior[2:-2, 2:-2, 2:-2] = True
    assert (fused.argmax(-1) == lab)[interior].mean() > thresh


@pytest.mark.parametrize("resampler", ["gather", "shear"])
def test_eval_counts_match_fetched_map_dice(label_image, resampler):
    """`predict_image(eval_labels=...)` must yield per-view dice identical
    to fetching each class map and running dice_all on the host — the
    counts path is a pure transfer optimization."""
    from multiplanarunet_tpu.evaluate.metrics import dice_all, dice_from_counts

    pair, lab = label_image
    views = geometry.get_random_views(3, rng=np.random.RandomState(9))
    pred = _predictor(resampler)
    _, maps = pred.predict_image(pair, views, n_planes="same+20")
    _, counts = pred.predict_image(pair, views, n_planes="same+20",
                                   eval_labels=lab)
    assert len(maps) == len(counts) == 3
    for pv_map, pv_counts in zip(maps, counts):
        want = dice_all(lab, pv_map, n_classes=N_CLASSES, ignore_zero=True)
        got = dice_from_counts(pv_counts, ignore_zero=True)
        np.testing.assert_allclose(got, want, rtol=1e-6, equal_nan=True)


def test_scan_fast_path_matches_per_view_loop(label_image):
    """The single-dispatch view-scan graph (return_per_view=False) must give
    the same fused argmax as the per-view loop, with and without learned
    fusion weights."""
    pair, lab = label_image
    views = geometry.get_random_views(3, rng=np.random.RandomState(5))
    pred = _predictor(resampler="gather")
    rngw = np.random.RandomState(7)
    fusion_params = {
        "fusion": {
            "W": (1.0 + 0.2 * rngw.rand(3, N_CLASSES)).astype(np.float32),
            "b": (0.1 * rngw.randn(1, N_CLASSES)).astype(np.float32),
        }
    }
    for fp in (None, fusion_params):
        fast, none_pv = pred.predict_image(pair, views, fusion_params=fp,
                                           n_planes="same+4",
                                           return_per_view=False)
        assert none_pv is None
        assert fast.dtype == np.uint8
        slow_probs, _ = pred.predict_image(pair, views, fusion_params=fp,
                                           n_planes="same+4",
                                           return_per_view=False,
                                           return_probs=True)
        np.testing.assert_array_equal(fast, slow_probs.argmax(-1))
        # ... and against the per-view loop graph (same accumulation order;
        # XLA fusion may round differently, so require near-total agreement)
        loop_fused, loop_pv = pred.predict_image(pair, views,
                                                 fusion_params=fp,
                                                 n_planes="same+4",
                                                 return_per_view=True)
        assert len(loop_pv) == 3
        assert (fast == loop_fused).mean() > 0.999


def test_shear_resampler_matches_gather(label_image):
    """Parity gate for the shear-decomposed resampler (the default via
    'auto'): fused argmax and per-view maps must agree with the exact
    gather path away from structure boundaries."""
    pair, lab = label_image
    views = geometry.get_random_views(3, rng=np.random.RandomState(11))
    pred_g = _predictor(resampler="gather")
    pred_s = _predictor(resampler="shear")  # must NOT silently fall back

    fused_g, pv_g = pred_g.predict_image(pair, views, n_planes="same+4")
    fused_s, pv_s = pred_s.predict_image(pair, views, n_planes="same+4")
    assert (fused_g == fused_s).mean() > 0.97
    for a, b in zip(pv_g, pv_s):
        assert (a == b).mean() > 0.95
    # The shear path must reconstruct the oracle labels nearly as well as
    # gather (see the threshold note on the reconstruction test)
    interior = np.zeros_like(lab, bool)
    interior[2:-2, 2:-2, 2:-2] = True
    assert (fused_s == lab)[interior].mean() > 0.95


def test_fused_multi_view_graph_matches_per_view(label_image):
    """The fused multi-view shear megagraph (fuse_views=True, the default
    below the big-volume threshold) must produce the same fused argmax and
    per-view maps as the per-view dispatch loop — same ops, one program."""
    pair, _ = label_image
    views = geometry.get_random_views(3, rng=np.random.RandomState(21))
    fusion_params = {
        "fusion": {
            "W": np.linspace(0.8, 1.2, 3 * N_CLASSES).reshape(
                3, N_CLASSES).astype(np.float32),
            "b": np.zeros((1, N_CLASSES), np.float32),
        }
    }
    model = OneHotOracle()
    pred_f = MultiViewPredictor(
        model, {"params": {}}, sample_dim=SIZE,
        real_space_span=float(SIZE - 2), n_classes=N_CLASSES, chunk=4,
        resampler="shear", fuse_views=True)
    pred_l = MultiViewPredictor(
        model, {"params": {}}, sample_dim=SIZE,
        real_space_span=float(SIZE - 2), n_classes=N_CLASSES, chunk=4,
        resampler="shear", fuse_views=False)

    fused_f, pv_f = pred_f.predict_image(pair, views,
                                         fusion_params=fusion_params,
                                         n_planes="same+4")
    fused_l, pv_l = pred_l.predict_image(pair, views,
                                         fusion_params=fusion_params,
                                         n_planes="same+4")
    # a mega entry was cached and used
    assert any(k[0] == "mega" for k in pred_f._shear_fns)
    assert not any(k[0] == "mega" for k in pred_l._shear_fns)
    # identical op sequence -> near-bit-identical results (XLA may fuse
    # bf16 intermediates differently across program boundaries)
    assert (fused_f == fused_l).mean() > 0.999
    for a, b in zip(pv_f, pv_l):
        assert (a == b).mean() > 0.999


def test_auto_resampler_uses_shear_and_prestage(label_image):
    """'auto' must resolve to shear for a well-conditioned geometry, and
    prestage() must stage the unpacked volume it will consume."""
    pair, _ = label_image
    views = geometry.get_random_views(2, rng=np.random.RandomState(12))
    pred = _predictor(resampler="auto")
    sampler = pair.interpolator
    sampler.unload_device()
    try:
        pred.prestage(pair, views, n_planes="same+4")
        assert sampler._device_volume_unpacked is not None
        assert sampler._device_volume_packed is None
        fused, _ = pred.predict_image(pair, views, n_planes="same+4",
                                      return_per_view=False)
        assert fused.dtype == np.uint8
        # the shear fn cache was used (plans resolved to shear)
        assert len(pred._shear_fns) > 0
    finally:
        sampler.unload_device()


def test_u8_staging_quantization_bound(label_image):
    """uint8 H2D staging: the on-device dequantized volume must match the
    f32 scaled volume within the documented bound (channel range / 510 +
    bf16 rounding), including the bucket-padded margin."""
    pair, _ = label_image
    sampler = pair.interpolator
    sampler.unload_device()
    try:
        vol_q = np.asarray(
            sampler.device_volume_unpacked(quantize=True), np.float32)
        ref = sampler._bucket_pad(sampler.scaled_volume, 32)
        rng_c = ref.max(axis=(0, 1, 2)) - ref.min(axis=(0, 1, 2))
        bound = rng_c / 510.0 + 0.01 * np.abs(ref).max() + 1e-6
        assert np.abs(vol_q - ref).max() <= bound.max()
        assert vol_q.shape == ref.shape
    finally:
        sampler.unload_device()


@pytest.mark.parametrize("resampler", ["gather", "shear"])
def test_u8_staging_predict_parity(label_image, resampler):
    """stage_dtype='u8' must reproduce the bf16-staged fused prediction
    almost exactly on both resampler paths (intensity error ~range/510 can
    only flip argmax at structure boundaries)."""
    pair, lab = label_image
    views = geometry.get_random_views(2, rng=np.random.RandomState(21))
    pred_b = _predictor(resampler)
    fused_b, _ = pred_b.predict_image(pair, views, n_planes="same+4",
                                      return_per_view=False)
    sampler = pair.interpolator
    sampler.unload_device()
    try:
        model = OneHotOracle()
        pred_u = MultiViewPredictor(
            model, {"params": {}}, sample_dim=SIZE,
            real_space_span=float(SIZE - 2), n_classes=N_CLASSES, chunk=4,
            resampler=resampler, stage_dtype="u8",
        )
        pred_u.prestage(pair, views, n_planes="same+4")
        staged = (sampler._device_volume_unpacked
                  if resampler == "shear"
                  else sampler._device_volume_packed)
        assert staged is not None
        fused_u, _ = pred_u.predict_image(pair, views, n_planes="same+4",
                                          return_per_view=False)
        assert (fused_b == fused_u).mean() > 0.995
        interior = np.zeros_like(lab, bool)
        interior[2:-2, 2:-2, 2:-2] = True
        assert (fused_u == lab)[interior].mean() > 0.95
    finally:
        sampler.unload_device()


def test_predict_views_mapped_stack(label_image):
    pair, lab = label_image
    views = geometry.get_random_views(2, rng=np.random.RandomState(2))
    pred = _predictor()
    mapped = pred.predict_views_mapped(pair, views, n_planes="same")
    assert mapped.shape == (2,) + lab.shape + (N_CLASSES,)
    from multiplanarunet_tpu.utils.fusion import predict_and_map

    points, targets = predict_and_map(pred, pair, views, n_planes="same")
    assert points.shape == (lab.size, 2, N_CLASSES)
    np.testing.assert_array_equal(targets, lab.ravel())

    # Device-resident path must agree exactly with the host assembly
    pts_dev, tgt_dev = pred.predict_views_points(pair, views,
                                                 n_planes="same")
    np.testing.assert_allclose(np.asarray(pts_dev), points, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(tgt_dev), targets)

    # Subsampled path: a uniform subset of the full point set
    import jax

    pts_s, tgt_s = pred.predict_views_points(
        pair, views, n_planes="same", max_points=256,
        key=jax.random.PRNGKey(3))
    assert pts_s.shape == (256, 2, N_CLASSES)
    assert tgt_s.shape == (256,)
    # Every sampled (point, target) pair must exist in the full set:
    # match rows by nearest full point and check the target agrees.
    full = points.reshape(lab.size, -1)
    sub = np.asarray(pts_s).reshape(256, -1)
    d = np.abs(full[None, :1000] - sub[:, None]).sum(-1)
    # (only check rows whose nearest candidate is an exact match)
    hits = d.min(1) < 1e-6
    if hits.any():
        np.testing.assert_array_equal(
            np.asarray(tgt_s)[hits], targets[:1000][d.argmin(1)][hits])


def test_pred_3d_iso_reconstructs(label_image):
    pair, lab = label_image
    seq = get_sequence(
        _wrap_queue(pair),
        intrp_style="iso_live_3d", dim=16, batch_size=1,
        n_classes=N_CLASSES, real_space_span=float(SIZE),
        real_box_dim=14.0, noise_sd=0.0,
        logger=ScreenLogger(False), no_log=True,
    )
    model = OneHotOracle()
    predict_fn = jax.jit(lambda x: model.apply({"params": {}}, x))
    vol = pred_3D_iso(predict_fn, seq, pair, extra_boxes=0)
    assert vol.shape == lab.shape + (N_CLASSES,)
    covered = vol.sum(-1) > 0
    cls = vol.argmax(-1)
    interior = np.zeros_like(lab, bool)
    interior[2:-2, 2:-2, 2:-2] = True
    acc = (cls == lab)[interior & covered].mean()
    assert covered[interior].mean() > 0.95
    assert acc > 0.9, acc


def _wrap_queue(pair):
    """Minimal queue over a single pre-loaded ImagePair."""

    class _Q:
        def get_random_image(self):
            from contextlib import contextmanager

            @contextmanager
            def ctx():
                yield pair

            return ctx()

    return _Q()


def test_predict_3d_patches_voxel_recon(label_image):
    pair, lab = label_image
    seq = get_sequence(
        _wrap_queue(pair), intrp_style="patches_3d", dim=16, batch_size=1,
        n_classes=N_CLASSES, logger=ScreenLogger(False), no_log=True,
    )
    model = OneHotOracle()
    predict_fn = jax.jit(lambda x: model.apply({"params": {}}, x))
    recon = predict_3D_patches(predict_fn, seq, pair, n_extra=0,
                               n_classes=N_CLASSES)
    acc = (recon.argmax(-1) == lab).mean()
    assert acc > 0.99, acc


def test_predict_3d_patches_device_matches_host_loop(label_image):
    """The single-program device recon (scan over corners) must reproduce
    the per-patch host loop it replaced, and want_argmax must equal the
    probs argmax."""
    pair, lab = label_image
    seq = get_sequence(
        _wrap_queue(pair), intrp_style="patches_3d", dim=16, batch_size=1,
        n_classes=N_CLASSES, logger=ScreenLogger(False), no_log=True,
    )
    model = OneHotOracle()
    predict_fn = jax.jit(lambda x: model.apply({"params": {}}, x))

    probs = predict_3D_patches(predict_fn, seq, pair, n_extra=0,
                               n_classes=N_CLASSES)
    cls = predict_3D_patches(predict_fn, seq, pair, n_extra=0,
                             n_classes=N_CLASSES, want_argmax=True)

    # Host oracle: the pre-megagraph per-patch fetch + numpy scatter-add
    i1, i2, i3 = pair.shape[:3]
    d = seq.dim
    recon = np.zeros((i1, i2, i3, N_CLASSES), np.float32)
    for patch, (i, k, v), _ in seq.get_patches_from(pair, 0):
        pred = np.asarray(predict_fn(np.asarray(patch)[None])[0])
        recon[i:i + d, k:k + d, v:v + d] += pred[
            : min(d, i1 - i), : min(d, i2 - k), : min(d, i3 - v)]
    expected = recon / np.maximum(recon.sum(-1, keepdims=True), 1e-8)

    np.testing.assert_allclose(probs, expected, rtol=1e-5, atol=1e-6)
    assert cls.dtype == np.uint8
    np.testing.assert_array_equal(cls, probs.argmax(-1))


def test_pred_3d_iso_scan_matches_per_box_loop(label_image):
    """The scanned box megagraph must reproduce the per-box dispatch loop
    it replaced (sample -> predict -> scatter, same f32 add order)."""
    from multiplanarunet_tpu.ops.interp import scatter_box_pred

    pair, lab = label_image
    seq = get_sequence(
        _wrap_queue(pair),
        intrp_style="iso_live_3d", dim=16, batch_size=1,
        n_classes=N_CLASSES, real_space_span=float(SIZE),
        real_box_dim=14.0, noise_sd=0.0,
        logger=ScreenLogger(False), no_log=True,
    )
    model = OneHotOracle()
    predict_fn = jax.jit(lambda x: model.apply({"params": {}}, x))
    np.random.seed(11)
    vol = pred_3D_iso(predict_fn, seq, pair, extra_boxes=3)

    # Oracle: the per-box host dispatch loop (public generators)
    sampler = pair.interpolator
    true_shape = tuple(int(s) for s in pair.shape[:3])
    expected = jnp.zeros(true_shape + (N_CLASSES,), jnp.float32)
    np.random.seed(11)
    boxes = [(im, corner, inv_rot) for im, corner, _, inv_rot, _ in
             seq.get_base_patches_from(pair, return_y=False)]
    boxes += [(im, corner, inv_rot) for im, corner, _, inv_rot in
              seq.get_N_random_patches_from(pair, 3)]
    for im, corner, inv_rot in boxes:
        probs = predict_fn(im[None])[0]
        expected = scatter_box_pred(
            expected, probs, jnp.asarray(corner),
            jnp.asarray(np.float32(seq.real_box_dim)),
            jnp.asarray(inv_rot), sampler.device_rot(),
            jnp.asarray(sampler.origin), jnp.asarray(sampler.spacing),
            seq.sample_dim, jnp.asarray(true_shape, jnp.float32),
        )
    np.testing.assert_allclose(vol, np.asarray(expected),
                               rtol=1e-5, atol=1e-6)


def test_pred_3d_iso_want_argmax_matches(label_image):
    pair, lab = label_image
    seq = get_sequence(
        _wrap_queue(pair),
        intrp_style="iso_live_3d", dim=16, batch_size=1,
        n_classes=N_CLASSES, real_space_span=float(SIZE),
        real_box_dim=14.0, noise_sd=0.0,
        logger=ScreenLogger(False), no_log=True,
    )
    model = OneHotOracle()
    predict_fn = jax.jit(lambda x: model.apply({"params": {}}, x))
    np.random.seed(5)
    vol = pred_3D_iso(predict_fn, seq, pair, extra_boxes=0,
                      min_coverage=0.9)
    np.random.seed(5)
    cls = pred_3D_iso(predict_fn, seq, pair, extra_boxes=0,
                      min_coverage=0.9, want_argmax=True)
    assert cls.dtype == np.uint8
    np.testing.assert_array_equal(cls, vol.argmax(-1))


def test_big_volume_drain_paths_match_fused(label_image, monkeypatch):
    """The big-volume branches (per-view drain at the default
    MP_VIEW_INFLIGHT=2 overlap and the serialized =1 fallback, sharded
    per-device drain) must produce the exact same argmax maps as the
    default fused graph. MP_PREDICT_BIG_BYTES=1 forces the big path on
    tiny CPU volumes — this is the only coverage those branches get off
    hardware."""
    from multiplanarunet_tpu.parallel import get_mesh

    pair, lab = label_image
    views = geometry.get_random_views(3, rng=np.random.RandomState(21))
    fused_ref, pv_ref = _predictor("shear").predict_image(pair, views)

    monkeypatch.setenv("MP_PREDICT_BIG_BYTES", "1")
    fused_big, pv_big = _predictor("shear").predict_image(pair, views)
    np.testing.assert_array_equal(fused_big, fused_ref)
    for a, b in zip(pv_big, pv_ref):
        np.testing.assert_array_equal(a, b)

    monkeypatch.setenv("MP_VIEW_INFLIGHT", "1")
    fused_if1, _ = _predictor("shear").predict_image(
        pair, views, return_per_view=False)
    np.testing.assert_array_equal(fused_if1, fused_ref)

    fused_shard = _predictor("shear").predict_image_sharded(
        pair, views, get_mesh(), n_planes="same+20")
    np.testing.assert_array_equal(fused_shard, fused_ref)


def test_big_volume_oom_falls_back_to_inflight_1(label_image, monkeypatch):
    """A RESOURCE_EXHAUSTED at the default inflight=2 overlap must retry
    fully serialized instead of surfacing (round-3 advisor finding): only
    the measured 512^3/7-class config is validated no-OOM at 2, so an
    HBM-tight combination degrades gracefully."""
    pair, _ = label_image
    views = geometry.get_random_views(3, rng=np.random.RandomState(21))
    fused_ref, _ = _predictor("shear").predict_image(
        pair, views, return_per_view=False)

    monkeypatch.setenv("MP_PREDICT_BIG_BYTES", "1")
    pred = _predictor("shear")
    real_loop = pred._run_shear_loop
    calls = []

    def fake_loop(views_, fns, W, rpv, volume, out_shape, true_shape,
                  labels_dev, big, inflight):
        calls.append(inflight)
        if inflight > 1:
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: Out of memory while trying to "
                "allocate 1 bytes (simulated)")
        return real_loop(views_, fns, W, rpv, volume, out_shape,
                         true_shape, labels_dev, big, inflight)

    monkeypatch.setattr(pred, "_run_shear_loop", fake_loop)
    fused_oom, _ = pred.predict_image(pair, views, return_per_view=False)
    assert calls == [2, 1]
    np.testing.assert_array_equal(fused_oom, fused_ref)


def test_sharded_multichip_predict_matches_sequential(label_image):
    """View-parallel inference over the 8-device mesh must equal the
    single-device sequential result exactly (same math, psum fusion)."""
    import jax

    from multiplanarunet_tpu.parallel import get_mesh

    pair, lab = label_image
    views = geometry.get_random_views(5, rng=np.random.RandomState(7))
    pred = _predictor(resampler="gather")  # sharded path is gather-exact
    mesh = get_mesh()  # 8 virtual CPU devices (conftest)
    assert mesh.devices.size == 8

    fused_seq, _ = pred.predict_image(pair, views, fusion_params=None,
                                      n_planes="same", return_per_view=False)
    fused_sharded = pred.predict_image_sharded(pair, views, mesh,
                                               n_planes="same")
    # Sequential path averages (fused = accum/n_views) before argmax; the
    # sharded path argmaxes the raw accum — identical argmax either way
    np.testing.assert_array_equal(fused_sharded, np.asarray(fused_seq))

    # With learned fusion weights too
    fusion_params = {
        "fusion": {
            "W": np.linspace(0.5, 1.5, 5 * N_CLASSES,
                             dtype=np.float32).reshape(5, N_CLASSES),
            "b": np.full((1, N_CLASSES), 0.1, np.float32),
        }
    }
    a = pred.predict_image(pair, views, fusion_params=fusion_params,
                           n_planes="same", return_per_view=False)[0]
    b = pred.predict_image_sharded(pair, views, mesh,
                                   fusion_params=fusion_params,
                                   n_planes="same")
    np.testing.assert_array_equal(b, np.asarray(a))


def test_sharded_shear_predict_matches_sequential(label_image):
    """Multi-chip SHEAR inference (per-device view placement) equals the
    sequential shear result bit-for-bit when views <= devices: the SAME
    cached per-view compiled programs run, placed on different devices,
    and the partial-sum reduction preserves view order."""
    from multiplanarunet_tpu.parallel import get_mesh

    pair, lab = label_image
    views = geometry.get_random_views(5, rng=np.random.RandomState(8))
    pred = _predictor(resampler="shear")
    mesh = get_mesh()  # 8 virtual CPU devices (conftest)

    fused_seq, _ = pred.predict_image(pair, views, fusion_params=None,
                                      n_planes="same",
                                      return_per_view=False)
    fused_sh = pred.predict_image_sharded(pair, views, mesh,
                                          n_planes="same")
    np.testing.assert_array_equal(fused_sh, np.asarray(fused_seq))

    # More views than devices: reduction order differs (per-device partial
    # sums), so allow rare f32 argmax tie flips only
    views9 = geometry.get_random_views(9, rng=np.random.RandomState(9))
    a, _ = pred.predict_image(pair, views9, fusion_params=None,
                              n_planes="same", return_per_view=False)
    b = pred.predict_image_sharded(pair, views9, mesh, n_planes="same")
    agree = (np.asarray(a) == b).mean()
    assert agree > 0.999, agree

    # Learned fusion weights flow through the placed remap fns
    fusion_params = {
        "fusion": {
            "W": np.linspace(0.5, 1.5, 5 * N_CLASSES,
                             dtype=np.float32).reshape(5, N_CLASSES),
            "b": np.full((1, N_CLASSES), 0.1, np.float32),
        }
    }
    fa = pred.predict_image(pair, views, fusion_params=fusion_params,
                            n_planes="same", return_per_view=False)[0]
    fb = pred.predict_image_sharded(pair, views, mesh,
                                    fusion_params=fusion_params,
                                    n_planes="same")
    np.testing.assert_array_equal(fb, np.asarray(fa))


def test_channel_grouped_remap_matches_ungrouped(label_image):
    """The channel-grouped bf16 shear remap (the 512^3 HBM-fit mode) stays
    within bf16 rounding of the all-channels f32 remap, argmax included."""
    import jax.numpy as jnp

    from multiplanarunet_tpu.ops.shear import plan_view_remap

    pair, lab = label_image
    views = geometry.get_random_views(2, rng=np.random.RandomState(12))
    pred = _predictor(resampler="shear")
    sampler = pair.interpolator
    offsets, n_valid = pred._prepare_offsets(pair, "same")
    bases = [geometry.plane_basis(v, noise_sd=0.0) for v in views]
    true_shape = tuple(int(s) for s in pair.shape[:3])
    Mts = [pred._remap_transform(pair, b, true_shape) for b in bases]
    g0, g_step, o0, o_step = pred._grid_params(offsets)
    vol_shape = tuple(int(s) for s in sampler.padded_shape())

    rng = np.random.RandomState(0)
    P_pad = len(offsets)
    stack = rng.rand(SIZE, SIZE, P_pad, N_CLASSES).astype(np.float32)
    stack /= stack.sum(-1, keepdims=True)

    for v in range(2):
        M, t = Mts[v]
        r_plan, r_Nc = plan_view_remap(
            M, t, g0, g_step, o0, o_step, (pred.dim, pred.dim, P_pad),
            vol_shape)
        assert r_plan.valid
        bounds = r_Nc + ((pred.dim, pred.dim, n_valid),)
        base_fn = pred._shear_fn("remap", r_plan, bounds)
        grp_fn = pred._shear_fn("remap", r_plan, bounds, ch_group=2)
        w = jnp.ones((N_CLASSES,), jnp.float32)
        a, sa = base_fn(jnp.asarray(stack),
                        jnp.zeros(vol_shape + (N_CLASSES,), jnp.float32),
                        w, want_argmax=True)
        b, sb = grp_fn(jnp.asarray(stack),
                       jnp.zeros(vol_shape + (N_CLASSES,), jnp.float32),
                       w, want_argmax=True)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=0.02)
        agree = (np.asarray(sa) == np.asarray(sb)).mean()
        assert agree > 0.98, agree


def _oracle_pair(tmp_path, affine, name):
    rng = np.random.RandomState(0)
    lab = np.zeros((SIZE, SIZE, SIZE), np.uint8)
    lab[4:12, 4:12, 4:12] = 1
    lab[14:20, 6:14, 8:16] = 2
    lab[6:10, 14:20, 14:20] = 3
    ip = tmp_path / name / "images" / "img.nii.gz"
    lp = tmp_path / name / "labels" / "img.nii.gz"
    ip.parent.mkdir(parents=True)
    lp.parent.mkdir(parents=True)
    nifti.save(lab.astype(np.float32), ip, affine=affine)
    nifti.save(lab, lp, affine=affine)
    pair = ImagePair(ip, lp)
    pair.set_bg_value(0.0)
    pair.set_scaler(None, compute_now=True)
    pair.load()
    return pair, lab


def test_multi_view_predict_rotated_affine(tmp_path):
    """End-to-end geometry under a ROTATED, anisotropic affine: sampling and
    remap must agree so the oracle reconstruction still holds."""
    R = geometry.rotation_matrix([0, 0, 1], angle_deg=25) @ \
        geometry.rotation_matrix([1, 0, 0], angle_deg=10)
    affine = np.eye(4)
    affine[:3, :3] = R @ np.diag([1.0, 1.0, 1.0])
    pair, lab = _oracle_pair(tmp_path, affine, "rot")
    assert pair.interpolator.rot_mat is not None  # rotation path active

    views = geometry.get_random_views(3, rng=np.random.RandomState(5))
    pred = _predictor()
    fused, _ = pred.predict_image(pair, views, n_planes="same+8",
                                  return_per_view=False, return_probs=True)
    interior = np.zeros_like(lab, bool)
    interior[2:-2, 2:-2, 2:-2] = True
    acc = (fused.argmax(-1) == lab)[interior].mean()
    assert acc > 0.95, acc


def test_multi_view_predict_flipped_affine(tmp_path):
    """Negative-diagonal (LAS-style) affine: axis flips fold into the
    alignment rotation; reconstruction must still hold."""
    affine = np.diag([-1.0, 1.0, -1.0, 1.0])
    pair, lab = _oracle_pair(tmp_path, affine, "flip")
    assert pair.interpolator.rot_mat is not None

    views = geometry.get_random_views(3, rng=np.random.RandomState(6))
    pred = _predictor()
    fused, _ = pred.predict_image(pair, views, n_planes="same+8",
                                  return_per_view=False, return_probs=True)
    interior = np.zeros_like(lab, bool)
    interior[2:-2, 2:-2, 2:-2] = True
    acc = (fused.argmax(-1) == lab)[interior].mean()
    assert acc > 0.95, acc


def test_non_cubic_volume_predict(tmp_path):
    """Fused predict over a non-cubic volume (unequal bucket padding per
    axis): remap out_shape and slab scanning must handle it."""
    rng = np.random.RandomState(4)
    lab = np.zeros((24, 36, 28), np.uint8)
    lab[4:12, 8:20, 6:16] = 1
    lab[14:20, 22:32, 16:24] = 2
    affine = np.diag([1.0, 0.8, 1.2, 1.0])
    ip = tmp_path / "images" / "img.nii.gz"
    lp = tmp_path / "labels" / "img.nii.gz"
    ip.parent.mkdir()
    lp.parent.mkdir()
    nifti.save(lab.astype(np.float32), ip, affine=affine)
    nifti.save(lab, lp, affine=affine)
    pair = ImagePair(ip, lp)
    pair.set_bg_value(0.0)
    pair.set_scaler(None, compute_now=True)
    pair.load()

    pred = MultiViewPredictor(
        OneHotOracle(n_classes=3), {"params": {}}, sample_dim=32,
        real_space_span=36.0, n_classes=3, chunk=4,
    )
    views = geometry.get_random_views(3, rng=np.random.RandomState(9))
    fused, _ = pred.predict_image(pair, views, n_planes="same+8",
                                  return_per_view=False, return_probs=True)
    assert fused.shape == lab.shape + (3,)
    interior = np.zeros_like(lab, bool)
    interior[2:-2, 2:-2, 2:-2] = True
    acc = (fused.argmax(-1) == np.minimum(lab, 2))[interior].mean()
    assert acc > 0.9, acc


def test_predictor_rejects_uncroppable_dim():
    from multiplanarunet_tpu.models import UNet

    model = UNet(n_classes=2, dim=30, depth=2, init_filters=4)
    with pytest.raises(ValueError, match="divisible"):
        MultiViewPredictor(model, {}, sample_dim=30, real_space_span=30.0,
                           n_classes=2)


def test_class_map_nibble_pack_roundtrip():
    """Device-side nibble pack + host unpack is lossless for <=16 classes
    and crops to the true shape."""
    from multiplanarunet_tpu.utils.fusion.fuse_and_predict import (
        _pack_class_map,
        _unpack_class_map,
    )

    rng = np.random.RandomState(0)
    cls = rng.randint(0, 16, (12, 10, 8)).astype(np.uint8)
    packed = np.asarray(_pack_class_map(jnp.asarray(cls)))
    assert packed.shape == (12, 10, 4)
    out = _unpack_class_map(packed, (11, 9, 7))
    np.testing.assert_array_equal(out, cls[:11, :9, :7])


def test_adaptive_chunk_consistency():
    """The adaptive scan chunk recovered from P_pad inside the jitted graphs
    must equal the chunk _prepare_offsets padded for, for every plane count
    (the graphs are cached by stack shape, so P_pad -> chunk must be a
    well-defined function)."""
    pred = MultiViewPredictor(None, {}, sample_dim=256,
                              real_space_span=255.0, n_classes=7)
    t = pred._chunk_target
    for n in range(1, 700):
        steps = -(-n // t)
        P_pad = steps * 2 * (-(-n // (2 * steps)))
        chunk = pred._chunk_for(P_pad)
        assert P_pad % chunk == 0
        assert chunk <= max(t, P_pad if P_pad <= t else 0)
        assert P_pad // chunk == steps, (n, P_pad, chunk, steps)
        assert 0 <= P_pad - n < chunk + 2, (n, P_pad, chunk)


def test_mixed_mode_shear_stack_gather_remap(label_image):
    """When the shear REMAP would exceed the HBM peak budget, the predictor
    keeps the shear plane stack but remaps through the slab-scanned gather
    kernel — and the result still matches the full gather path."""
    pair, lab = label_image
    views = geometry.get_random_views(3, rng=np.random.RandomState(11))
    pred_g = _predictor(resampler="gather")
    pred_m = _predictor(resampler="shear")
    pred_m._SHEAR_REMAP_PEAK_BYTES_MAX = 0  # force gather remap per view

    fused_g, pv_g = pred_g.predict_image(pair, views, n_planes="same+4")
    fused_m, pv_m = pred_m.predict_image(pair, views, n_planes="same+4")
    assert any(k[0] == "gremap" for k in pred_m._shear_fns)
    assert any(k[0] == "stack" for k in pred_m._shear_fns)
    assert not any(k[0] == "remap" for k in pred_m._shear_fns)
    assert (fused_g == fused_m).mean() > 0.97
    for a, b in zip(pv_g, pv_m):
        assert (a == b).mean() > 0.95
