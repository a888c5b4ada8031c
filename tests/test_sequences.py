"""Tests for the batch samplers and on-device augmentation."""
import numpy as np
import pytest

import jax.numpy as jnp

from multiplanarunet_tpu.augmentation import Elastic2D, Elastic3D, build_augmenters
from multiplanarunet_tpu.bin.toy_data import create_dataset
from multiplanarunet_tpu.image import ImagePairLoader
from multiplanarunet_tpu.image.queue import EagerQueue
from multiplanarunet_tpu.logging import ScreenLogger
from multiplanarunet_tpu.sequences import get_sequence


@pytest.fixture(scope="module")
def toy_queue(tmp_path_factory):
    root = tmp_path_factory.mktemp("seq_toy")
    rng = np.random.RandomState(7)
    create_dataset(root / "train", 3, 32, 1, rng, "train")
    loader = ImagePairLoader(base_dir=root / "train", no_log=True)
    loader.set_scaler_and_bg_values(bg_value=1.0, scaler="StandardScaler",
                                    compute_now=True)
    return EagerQueue(loader, logger=ScreenLogger(False))


def _make_seq(toy_queue, **over):
    kwargs = dict(
        intrp_style="iso_live",
        views=np.array([[0, 0, 1.0], [1.0, 0, 0]]),
        dim=32,
        batch_size=4,
        n_classes=4,
        real_space_span=30.0,
        noise_sd=0.0,
        fg_batch_fraction=0.5,
        logger=ScreenLogger(False),
        no_log=True,
    )
    kwargs.update(over)
    return get_sequence(toy_queue, **kwargs)


def test_multiplanar_batch_shapes(toy_queue):
    seq = _make_seq(toy_queue)
    X, y, w = seq[0]
    assert X.shape == (4, 32, 32, 1)
    assert y.shape == (4, 32, 32, 1)
    assert w.shape == (4,)
    assert np.isfinite(np.asarray(X)).all()
    labs = np.asarray(y)
    assert labs.min() >= 0 and labs.max() <= 3


def test_multiplanar_fg_quota(toy_queue):
    """With fg_batch_fraction=1.0 every element must contain foreground
    (statistically guaranteed by candidate selection on this toy data)."""
    seq = _make_seq(toy_queue, fg_batch_fraction=1.0, batch_size=4)
    n_fg = 0
    for _ in range(3):
        _, y, _ = seq[0]
        for el in np.asarray(y):
            n_fg += int((el > 0).any())
    assert n_fg >= 10  # 12 slices; allow rare unlucky images


def test_multiplanar_flatten_y(toy_queue):
    seq = _make_seq(toy_queue, flatten_y=True)
    X, y, w = seq[0]
    assert y.shape == (4, 32 * 32, 1)


def test_get_view_from_stack(toy_queue):
    seq = _make_seq(toy_queue)
    with toy_queue.get_image_by_idx(0) as image:
        X, y, axes, inv_basis = seq.get_view_from(
            image, np.array([0.0, 0.0, 1.0]), "same+4"
        )
    assert X.shape == (32, 32, 36, 1)
    assert y.shape == (32, 32, 36)
    real_axis, _, offsets = axes
    assert len(offsets) == 36
    np.testing.assert_allclose(inv_basis, np.eye(3), atol=1e-6)
    # span+extra*res bounds
    res = 30.0 / 31
    np.testing.assert_allclose(offsets[-1], (30.0 + 4 * res) / 2, rtol=1e-5)


def test_n_planes_specs(toy_queue):
    seq = _make_seq(toy_queue)
    with toy_queue.get_image_by_idx(0) as image:
        assert len(seq.plane_offsets(image, "same")) == 32
        assert len(seq.plane_offsets(image, 10)) == 10
        by_r = seq.plane_offsets(image, "by_radius")
        assert len(by_r) > 0


def test_iso3d_batch(toy_queue):
    seq = get_sequence(
        toy_queue, intrp_style="iso_live_3d", dim=16, batch_size=2,
        n_classes=4, real_space_span=30.0, real_box_dim=20.0, noise_sd=0.0,
        logger=ScreenLogger(False), no_log=True,
    )
    X, y, w = seq[0]
    assert X.shape == (2, 16, 16, 16, 1)
    assert y.shape == (2, 16, 16, 16, 1)
    # base tiling covers volume: 32 voxels at 20mm boxes -> 2 per axis
    with toy_queue.get_image_by_idx(0) as image:
        tiles = list(seq.get_base_patches_from(image, return_y=True))
    assert len(tiles) == 8
    im, lab, corner, axes, inv, total = tiles[0]
    assert im.shape == (16, 16, 16, 1) and total == 8


def test_iso3d_pooled_and_per_image_paths_agree(toy_queue):
    """The 3D two-phase pooled sampler must satisfy the same batch contract
    (shapes, dtypes, label validity, fg quota) as the per-image path, and
    keep `sampler_lookahead` batches in flight."""

    def make():
        return get_sequence(
            toy_queue, intrp_style="iso_live_3d", dim=16, batch_size=4,
            n_classes=4, real_space_span=30.0, real_box_dim=20.0,
            noise_sd=0.0, fg_batch_fraction=1.0,
            logger=ScreenLogger(False), no_log=True,
        )

    seq_pool = make()
    seq_pool.sampler_lookahead = 2
    assert getattr(seq_pool, "use_pool", True)
    for i in range(3):
        Xp, yp, wp = seq_pool[i]
        labs = np.asarray(yp)
        assert Xp.shape == (4, 16, 16, 16, 1)
        assert labs.min() >= 0 and labs.max() <= 3
        assert sum(int((el > 0).any()) for el in labs) >= 3
    assert len(seq_pool._pending_batches) == 2

    seq_plain = make()
    seq_plain.use_pool = False
    Xs, ys, ws = seq_plain[0]
    assert Xs.shape == Xp.shape and ys.shape == yp.shape
    labs = np.asarray(ys)
    assert labs.min() >= 0 and labs.max() <= 3
    assert sum(int((el > 0).any()) for el in labs) >= 3


def test_patches_3d(toy_queue):
    seq = get_sequence(
        toy_queue, intrp_style="patches_3d", dim=16, batch_size=2,
        n_classes=4, logger=ScreenLogger(False), no_log=True,
    )
    X, y, w = seq[0]
    assert X.shape == (2, 16, 16, 16, 1)
    with toy_queue.get_image_by_idx(0) as image:
        patches = list(seq.get_patches_from(image, n_extra=2))
    assert len(patches) == 8 + 2


def test_sliding_patches(toy_queue):
    seq = get_sequence(
        toy_queue, intrp_style="sliding_patches_3d", dim=16, batch_size=2,
        n_classes=4, strides=8, logger=ScreenLogger(False), no_log=True,
    )
    with toy_queue.get_image_by_idx(0) as image:
        corners = seq.corners_for(image.image.shape)
    assert len(corners) == 27  # (0, 8, 16) per axis


def test_elastic2d_applies_and_weights():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 32, 32, 2).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 3, (4, 32, 32)).astype(np.float32))
    w = np.ones(4, np.float32)
    aug = Elastic2D(alpha=[100, 200], sigma=[8, 12], apply_prob=1.0, seed=3)
    x2, y2, w2 = aug(x, y, batch_w=w, bg_values=np.zeros((4, 2)))
    assert x2.shape == x.shape and y2.shape == y.shape
    assert not np.allclose(np.asarray(x2), np.asarray(x))  # deformed
    np.testing.assert_allclose(w2, 0.33)  # aug weight applied
    # labels remain valid classes
    assert set(np.unique(np.asarray(y2))) <= {0.0, 1.0, 2.0}


def test_elastic2d_apply_prob_zero_identity():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 2, (2, 16, 16)).astype(np.float32))
    aug = Elastic2D(alpha=100, sigma=10, apply_prob=0.0, seed=0)
    x2, y2, w2 = aug(x, y, batch_w=np.ones(2), bg_values=np.zeros((2, 1)))
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(w2, 1.0)


def test_elastic3d_runs():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 16, 16, 16, 1).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 2, (2, 16, 16, 16)).astype(np.float32))
    aug = Elastic3D(alpha=[50, 100], sigma=[6, 10], apply_prob=1.0, seed=1)
    x2, y2, _ = aug(x, y, batch_w=None, bg_values=np.zeros((2, 1)))
    assert x2.shape == x.shape
    assert np.isfinite(np.asarray(x2)).all()


def test_build_augmenters_from_config():
    augs = build_augmenters([
        {"cls_name": "Elastic2D",
         "kwargs": {"alpha": [0, 450], "sigma": [20, 30], "apply_prob": 0.33}},
    ], seed=5)
    assert len(augs) == 1 and isinstance(augs[0], Elastic2D)


def test_pooled_and_per_image_paths_agree(toy_queue):
    """The pooled batch path must produce batches with the same contract
    (shapes, dtypes, label validity, fg quota) as the per-image path."""
    seq_pool = _make_seq(toy_queue, fg_batch_fraction=1.0)
    assert getattr(seq_pool, "use_pool", True)
    Xp, yp, wp = seq_pool[0]

    seq_plain = _make_seq(toy_queue, fg_batch_fraction=1.0)
    seq_plain.use_pool = False
    Xs, ys, ws = seq_plain[0]

    assert Xp.shape == Xs.shape and yp.shape == ys.shape
    for y in (yp, ys):
        labs = np.asarray(y)
        assert labs.min() >= 0 and labs.max() <= 3
    # fg quota satisfied on both paths (toy volumes are fg-rich)
    assert sum(int((np.asarray(el) > 0).any()) for el in np.asarray(yp)) >= 3
    assert sum(int((np.asarray(el) > 0).any()) for el in np.asarray(ys)) >= 3


def test_pooled_lookahead_depth(toy_queue):
    """Deeper sampler lookahead keeps `depth` self-contained batches in
    flight and still satisfies the batch contract on every draw."""
    seq = _make_seq(toy_queue, fg_batch_fraction=1.0)
    seq.sampler_lookahead = 3
    shapes = set()
    for i in range(4):
        X, y, w = seq[i]
        shapes.add((X.shape, y.shape))
        labs = np.asarray(y)
        assert labs.min() >= 0 and labs.max() <= 3
        assert sum(int((el > 0).any()) for el in labs) >= 3
    assert len(shapes) == 1
    assert len(seq._pending_batches) == 3


def test_fused_finish_matches_sequential(toy_queue, monkeypatch):
    """Both one-dispatch fused finish kernels (lazy-gather walk and the
    two-phase MP_SAMPLER_LAZY=0 arm) must produce near-identical batches
    to the sequential gather/select/augment/prepare path given the same
    host randomness (same np seed + augmenter seeds)."""

    def draw(augment, disable_fused, lazy="1"):
        monkeypatch.setenv("MP_SAMPLER_LAZY", lazy)
        seq = _make_seq(toy_queue, fg_batch_fraction=1.0, augmenters=(
            [{"cls_name": "Elastic2D",
              "kwargs": {"alpha": [0, 100], "sigma": [10, 12],
                         "apply_prob": 0.7, "seed": 5}}] if augment else None))
        seq.disable_fused_finish = disable_fused
        seq.seed = lambda: None  # keep our fixed seed below
        np.random.seed(123)
        return seq[0]

    for augment in (False, True):
        Xs, ys, ws = draw(augment, disable_fused=True)
        for lazy in ("1", "0"):
            Xf, yf, wf = draw(augment, disable_fused=False, lazy=lazy)
            np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xs),
                                       atol=1e-6, rtol=0)
            np.testing.assert_allclose(
                np.asarray(yf).astype(np.float32).reshape(-1),
                np.asarray(ys).astype(np.float32).reshape(-1), atol=1e-6)
            np.testing.assert_allclose(wf, ws, atol=0)


def test_pooled_discards_stale_batch_sizes_after_backoff(toy_queue):
    """In-flight lookahead batches started BEFORE an OOM batch-size backoff
    must be discarded, not finished at their stale (oversized) batch size —
    otherwise the first retry step re-OOMs and the backoff overshoots."""
    seq = _make_seq(toy_queue, fg_batch_fraction=1.0)
    seq.sampler_lookahead = 2
    X, y, w = seq[0]
    assert len(seq._pending_batches) == 2
    stale = [id(st) for st in seq._pending_batches]
    old_bs = seq.batch_size
    seq.batch_size = old_bs - 2  # what Trainer.fit's OOM backoff does
    X2, y2, w2 = seq[1]
    assert X2.shape[0] == old_bs - 2
    assert all(id(st) not in stale for st in seq._pending_batches)
    assert all(len(st["slots"]) == old_bs - 2
               for st in seq._pending_batches)


def test_pool_slot_reuse(toy_queue):
    seq = _make_seq(toy_queue)
    seq[0]
    pool = seq._get_pool()
    n_before = len(pool._slot_of)
    seq[0]
    # Same eager dataset: slots reused, not re-staged
    assert len(pool._slot_of) == n_before or len(pool._slot_of) <= pool.capacity


def test_smooth_field_matches_scipy():
    """The separable truncated-gaussian blur must match
    scipy.ndimage.gaussian_filter(mode='constant') — the reference's
    displacement-field smoother."""
    from scipy.ndimage import gaussian_filter

    from multiplanarunet_tpu.ops.elastic import smooth_field

    rng = np.random.RandomState(0)
    field = rng.rand(48, 48).astype(np.float32) * 2 - 1
    for sigma in (3.0, 7.5):
        want = gaussian_filter(field, sigma, mode="constant", cval=0.0)
        got = np.asarray(smooth_field(jnp.asarray(field), sigma, radius=40))
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_device_walk_matches_host_walk(toy_queue):
    """The in-graph candidate walk (`_walk_select`) must reproduce the
    host `select_candidate` loop bit-exactly over randomized presence
    patterns, quota settings and phase-2 row subsets."""
    import jax.numpy as jnp

    from multiplanarunet_tpu.sequences.multi_planar import (
        MAX_TRIES, _walk_select,
    )

    rng = np.random.RandomState(0)
    for trial in range(40):
        B = int(rng.choice([3, 4, 8, 16]))
        n_classes = int(rng.choice([2, 3, 4, 7]))
        force = bool(rng.randint(2))
        frac = float(rng.choice([0.0, 0.25, 0.5, 1.0]))
        seq = _make_seq(toy_queue, batch_size=B, n_classes=n_classes,
                        fg_batch_fraction=frac,
                        force_all_fg=force)
        K = MAX_TRIES
        # sparse presence so rejections actually happen
        pres = rng.rand(B, K, n_classes) < rng.uniform(0.05, 0.5)
        pres[..., 0] = True  # background always present
        pres0 = pres[:, 0]
        fg = pres0[:, seq.fg_classes]
        maybe_rejected = ~fg.all(1) if seq.force_all_fg else ~fg.any(1)
        S = np.nonzero(maybe_rejected)[0]
        s_pos = np.full(B, -1, np.int64)
        if len(S):
            pad = 1 << int(np.ceil(np.log2(len(S))))
            S_pad = np.concatenate([S, np.repeat(S[:1], pad - len(S))])
            pres_rest = pres[S_pad, 1:]
            s_pos[S] = np.arange(len(S))
        else:
            pres_rest = np.zeros((1, K - 1, n_classes), bool)

        # host oracle (the reference retry statistics)
        vec = np.zeros(len(seq.fg_classes), bool)
        count = 0
        want = np.empty(B, np.int64)
        for b in range(B):
            if s_pos[b] < 0:
                ok, vec, ch = seq._accepts_candidate(
                    pres0[b], 1, K == 1, vec, count, b)
                assert ok
                count += ch
                want[b] = 0
            else:
                want[b], vec, count = seq.select_candidate(
                    np.concatenate([pres0[b:b + 1],
                                    pres_rest[s_pos[b]]]),
                    vec, count, b)

        got = np.asarray(_walk_select(
            jnp.asarray(pres0), jnp.asarray(pres_rest),
            jnp.asarray(s_pos, jnp.int32),
            tuple(int(c) for c in seq.fg_classes),
            int(seq.n_fg_slices), bool(seq.force_all_fg)))
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")
