"""Tests for model families, checkpoint IO and the loss/metric suite."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multiplanarunet_tpu.evaluate import losses as L
from multiplanarunet_tpu.evaluate import metrics as M
from multiplanarunet_tpu.models import (
    FusionModel,
    MultiTaskUNet2D,
    UNet,
    UNet3D,
    checkpoint,
    init_model_variables,
)
from multiplanarunet_tpu.models.fusion_model import fuse_probabilities
from multiplanarunet_tpu.utils.utils import set_bias_weights


def test_unet_forward_shapes():
    model = UNet(n_classes=4, dim=32, n_channels=2, depth=2,
                 complexity_factor=1, init_filters=8)
    variables = init_model_variables(model)
    x = jnp.zeros((3, 32, 32, 2))
    out = model.apply(variables, x, train=False)
    assert out.shape == (3, 32, 32, 4)
    probs = np.asarray(out)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_unet_complexity_factor_scales_filters():
    m1 = UNet(n_classes=2, dim=16, depth=1, complexity_factor=1, init_filters=8)
    m2 = UNet(n_classes=2, dim=16, depth=1, complexity_factor=2, init_filters=8)
    v1 = init_model_variables(m1)
    v2 = init_model_variables(m2)
    f1 = v1["params"]["encoder_L0"]["conv1"]["kernel"].shape[-1]
    f2 = v2["params"]["encoder_L0"]["conv1"]["kernel"].shape[-1]
    assert f1 == 8 and f2 == int(8 * np.sqrt(2))


def test_unet_train_mode_updates_batch_stats():
    model = UNet(n_classes=2, dim=16, depth=1, init_filters=4)
    variables = init_model_variables(model)
    x = jnp.ones((2, 16, 16, 1))
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats", "intermediates"]
    )
    assert "batch_stats" in mutated
    leaf = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_subpixel_decoder_matches_naive_upsample_conv():
    """SubpixelUpConv must be numerically equivalent (same params, same
    param tree) to the naive upsample2x -> Conv(2,2) decoder it replaces,
    including through odd-dim crop paths and in 3D."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 24, 3))
    m_a = UNet(n_classes=5, dim=24, n_channels=3, depth=2,
               complexity_factor=2, init_filters=8, subpixel_decoder=True)
    m_b = UNet(n_classes=5, dim=24, n_channels=3, depth=2,
               complexity_factor=2, init_filters=8, subpixel_decoder=False)
    va = m_a.init(rng, x, train=False)
    vb = m_b.init(rng, x, train=False)
    assert (jax.tree_util.tree_structure(va["params"])
            == jax.tree_util.tree_structure(vb["params"]))
    for pa, pb in zip(jax.tree_util.tree_leaves(va["params"]),
                      jax.tree_util.tree_leaves(vb["params"])):
        assert pa.shape == pb.shape
    ya = m_a.apply(va, x, train=False)
    yb = m_b.apply(va, x, train=False)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-5)

    # odd input dims exercise crop_to_match after the up-conv
    xo = jax.random.normal(jax.random.PRNGKey(2), (1, 26, 26, 1))
    mo = UNet(n_classes=3, dim=26, depth=2, init_filters=8,
              subpixel_decoder=True)
    vo = mo.init(rng, xo, train=False)
    np.testing.assert_allclose(
        np.asarray(mo.apply(vo, xo, train=False)),
        np.asarray(UNet(n_classes=3, dim=26, depth=2, init_filters=8,
                        subpixel_decoder=False).apply(vo, xo, train=False)),
        atol=1e-5)

    x3 = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 16, 2))
    m3 = UNet3D(n_classes=4, dim=16, n_channels=2, depth=2, init_filters=4,
                subpixel_decoder=True)
    v3 = m3.init(rng, x3, train=False)
    np.testing.assert_allclose(
        np.asarray(m3.apply(v3, x3, train=False)),
        np.asarray(UNet3D(n_classes=4, dim=16, n_channels=2, depth=2,
                          init_filters=4, subpixel_decoder=False).apply(
            v3, x3, train=False)),
        atol=1e-5)


def test_unet3d_forward():
    model = UNet3D(n_classes=3, dim=16, depth=2, init_filters=4)
    variables = init_model_variables(model)
    out = model.apply(variables, jnp.zeros((1, 16, 16, 16, 1)), train=False)
    assert out.shape == (1, 16, 16, 16, 3)


def test_multitask_unet_shares_encoder():
    model = MultiTaskUNet2D(
        task_names=("a", "b"), n_classes=(2, 3), n_channels=(1, 1),
        dim=(16, 32), depth=1, init_filters=4,
    )
    variables = init_model_variables(model)
    params = variables["params"]
    assert "encoder" in params  # one shared encoder
    assert "task_a" in params and "task_b" in params
    xs = (jnp.zeros((2, 16, 16, 1)), jnp.zeros((2, 32, 32, 1)))
    outs = model.apply(variables, xs, train=False)
    assert outs[0].shape == (2, 16, 16, 2)
    assert outs[1].shape == (2, 32, 32, 3)


def test_fusion_model_identity_at_init():
    fm = FusionModel(n_inputs=6, n_classes=4)
    params = fm.init_params()
    x = jax.nn.softmax(jnp.asarray(np.random.RandomState(0).rand(10, 6, 4)), -1)
    out = fm.apply({"params": params}, x)
    # W=1, b=0 -> softmax of summed probs
    want = jax.nn.softmax(jnp.sum(x, axis=1), -1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)
    # functional form identical
    np.testing.assert_allclose(
        np.asarray(fuse_probabilities(params, x)), np.asarray(out), atol=1e-6
    )


def test_checkpoint_roundtrip(tmp_path):
    model = UNet(n_classes=2, dim=16, depth=1, init_filters=4)
    variables = init_model_variables(model)
    p = tmp_path / "w.npz"
    checkpoint.save_weights(p, variables["params"], variables["batch_stats"],
                            meta={"epoch": 3})
    params, bs, meta = checkpoint.load_weights(p)
    assert meta == {"epoch": 3}
    flat_a = jax.tree_util.tree_leaves(variables["params"])
    flat_b = jax.tree_util.tree_leaves(params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_by_name_partial(tmp_path):
    m_small = UNet(n_classes=2, dim=16, depth=1, init_filters=4)
    m_big = UNet(n_classes=3, dim=16, depth=1, init_filters=4)
    v_small = init_model_variables(m_small)
    v_big = init_model_variables(m_big)
    merged, n = checkpoint.restore_by_name(
        v_big["params"], v_small["params"]
    )
    # out_conv differs in shape (2 vs 3 classes) -> not restored; others are
    assert n > 0
    np.testing.assert_array_equal(
        np.asarray(merged["encoder_L0"]["conv1"]["kernel"]),
        np.asarray(v_small["params"]["encoder_L0"]["conv1"]["kernel"]),
    )
    assert merged["out_conv"]["kernel"].shape[-1] == 3


def test_set_bias_weights():
    model = UNet(n_classes=3, dim=16, depth=1, init_filters=4)
    variables = init_model_variables(model)
    counts = np.array([900, 90, 10])
    params = set_bias_weights(variables["params"], counts)
    want = np.log(counts / counts.sum())
    np.testing.assert_allclose(params["out_conv"]["bias"], want, rtol=1e-6)


# ------------------------------------------------------------------- losses
def _rand_batch(rng, B=2, H=8, W=8, C=4):
    y_true = rng.randint(0, C, size=(B, H, W, 1))
    logits = rng.randn(B, H, W, C).astype(np.float32)
    y_pred = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))
    return jnp.asarray(y_true), jnp.asarray(y_pred)


def test_ce_matches_manual():
    rng = np.random.RandomState(0)
    y_true, y_pred = _rand_batch(rng)
    got = L.SparseCategoricalCrossentropy()(y_true, y_pred)
    oh = np.eye(4)[np.asarray(y_true)[..., 0]]
    want = -(oh * np.log(np.clip(np.asarray(y_pred), 1e-8, 1))).sum(-1).mean()
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_dice_loss_perfect_prediction_near_zero():
    y_true = jnp.zeros((1, 8, 8, 1), jnp.int32)
    y_pred = jnp.zeros((1, 8, 8, 3)).at[..., 0].set(1.0)
    loss = L.SparseDiceLoss()(y_true, y_pred)
    # classes 1,2 absent: dice -> smooth/smooth = 1; class 0 perfect -> 1
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)


def test_gdl_weight_types():
    rng = np.random.RandomState(1)
    y_true, y_pred = _rand_batch(rng)
    for tw in ("Square", "Simple", "Uniform"):
        v = float(L.SparseGeneralizedDiceLoss(type_weight=tw)(y_true, y_pred))
        assert 0.0 <= v <= 1.0


def test_focal_loss_with_class_weights():
    rng = np.random.RandomState(2)
    y_true, y_pred = _rand_batch(rng)
    l1 = float(L.SparseFocalLoss(gamma=2.0)(y_true, y_pred))
    l2 = float(L.SparseFocalLoss(gamma=2.0,
                                 class_weights=[2, 2, 2, 2])(y_true, y_pred))
    np.testing.assert_allclose(l2, 2 * l1, rtol=1e-5)


def test_explog_loss_finite_and_positive():
    rng = np.random.RandomState(3)
    y_true, y_pred = _rand_batch(rng)
    v = float(L.SparseExponentialLogarithmicLoss()(y_true, y_pred))
    assert np.isfinite(v) and v > 0


def test_losses_differentiable():
    rng = np.random.RandomState(4)
    y_true, _ = _rand_batch(rng)
    logits = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))

    for name, cls in L.LOSSES.items():
        def f(lg):
            return cls()(y_true, jax.nn.softmax(lg, -1))

        g = jax.grad(f)(logits)
        assert np.isfinite(np.asarray(g)).all(), name


def test_sample_weighting():
    rng = np.random.RandomState(5)
    y_true, y_pred = _rand_batch(rng, B=4)
    w = jnp.array([1.0, 0.5, 0.0, 1.0])
    loss_fn = L.SparseCategoricalCrossentropy()
    per_elem = loss_fn.element_loss(y_true, y_pred)
    got = loss_fn(y_true, y_pred, sample_weight=w)
    np.testing.assert_allclose(
        float(got), float(jnp.mean(per_elem * w)), rtol=1e-6
    )


# ------------------------------------------------------------------ metrics
def test_numpy_dice_all():
    y_true = np.array([0, 1, 1, 2, 2, 2])
    y_pred = np.array([0, 1, 0, 2, 2, 1])
    d = M.dice_all(y_true, y_pred, n_classes=3, smooth=0.0)
    np.testing.assert_allclose(d, [0.5, 0.8], rtol=1e-6)


def test_jax_fg_metrics():
    y_true = jnp.asarray([[0, 1, 2, 1]]).reshape(1, 4, 1)
    probs = jnp.asarray(np.eye(3, dtype=np.float32)[[0, 1, 1, 1]]).reshape(1, 4, 3)
    rec = float(M.sparse_fg_recall(y_true, probs))
    np.testing.assert_allclose(rec, 2 / 3, rtol=1e-6)
    prec = float(M.sparse_fg_precision(y_true, probs))
    np.testing.assert_allclose(prec, 2 / 3, rtol=1e-6)
    acc = float(M.sparse_categorical_accuracy(y_true, probs))
    np.testing.assert_allclose(acc, 3 / 4, rtol=1e-6)


def test_confusion_based_means_match_sklearn():
    from sklearn.metrics import precision_score, recall_score

    rng = np.random.RandomState(0)
    y_true = rng.randint(0, 3, size=(1, 50, 1))
    logits = rng.randn(1, 50, 3).astype(np.float32)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))
    y_cls = probs.argmax(-1).ravel()
    want_p = precision_score(y_true.ravel(), y_cls, average=None,
                             labels=[0, 1, 2], zero_division=0)[1:].mean()
    got_p = float(M.sparse_mean_fg_precision(jnp.asarray(y_true),
                                             jnp.asarray(probs)))
    np.testing.assert_allclose(got_p, want_p, rtol=1e-5)
    want_r = recall_score(y_true.ravel(), y_cls, average=None,
                          labels=[0, 1, 2], zero_division=0)[1:].mean()
    got_r = float(M.sparse_mean_fg_recall(jnp.asarray(y_true),
                                          jnp.asarray(probs)))
    np.testing.assert_allclose(got_r, want_r, rtol=1e-5)


def test_fit_fusion_device_resident_learns_informative_view():
    """_fit_fusion runs fully on device (scan epochs, confusion-count val)
    and learns to upweight the informative view. Parity surface:
    `mpunet/bin/train_fusion.py:200-216` (host-fed Keras fit)."""
    from types import SimpleNamespace

    from multiplanarunet_tpu.bin.train_fusion import _fit_fusion

    rng = np.random.RandomState(0)
    n, V, C = 6000, 3, 4
    y = rng.randint(0, C, size=n)
    onehot = np.eye(C, dtype=np.float32)[y]
    # view 0: sharp correct probs; views 1-2: uniform noise
    pts = rng.dirichlet(np.ones(C), size=(n, V)).astype(np.float32)
    pts[:, 0] = 0.9 * onehot + 0.025
    args = SimpleNamespace(batch_size=1024, epochs=8, early_stopping=8,
                           learning_rate=5e-2, dice_weight="Simple")
    logs = []
    params = _fit_fusion(jnp.asarray(pts), jnp.asarray(y), V, C, args,
                         logger=logs.append)
    W = np.asarray(params["fusion"]["W"])
    assert isinstance(W, np.ndarray)  # host tree for npz checkpointing
    # informative view dominates the noise views for every class
    assert (W[0] > W[1:].max(0)).all(), W
    assert any("val_dice" in s for s in logs)
    # the final val dice should be near-perfect given view 0
    import re

    dices = [float(m.group(1)) for s in logs
             for m in [re.search(r"val_dice=([0-9.]+)", s)] if m]
    assert dices and max(dices) > 0.95, dices


def test_inference_graph_variants_match_baseline():
    """predict_fused_bn (BN as precomputed compute-dtype affine) and
    dilated_upconv (upsample+Conv2x2 as one input-dilated 3x3 conv) are
    inference-time graph restructurings: identical param tree and equal
    outputs up to float re-association (see models/unet.py docstrings for
    the v5e profile motivating them)."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 24, 3))
    base = UNet(n_classes=5, dim=24, n_channels=3, depth=2,
                complexity_factor=2, init_filters=8)
    v = base.init(rng, x, train=False)
    # non-trivial batch_stats so BN isn't the identity
    bs = jax.tree_util.tree_map(
        lambda p: p + 0.2 * jax.random.normal(rng, p.shape, p.dtype),
        v["batch_stats"])
    bs = jax.tree_util.tree_map(jnp.abs, bs)
    v = {"params": v["params"], "batch_stats": bs}
    y0 = base.apply(v, x, train=False)
    for flags in ({"predict_fused_bn": True}, {"dilated_upconv": True},
                  {"predict_fused_bn": True, "dilated_upconv": True}):
        m = base.copy(**flags)
        vi = m.init(rng, x, train=False)
        assert (jax.tree_util.tree_structure(vi["params"])
                == jax.tree_util.tree_structure(v["params"]))
        y = m.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y0),
                                   atol=2e-5)

    # odd dims exercise the crop path after the dilated up-conv
    xo = jax.random.normal(jax.random.PRNGKey(2), (1, 26, 26, 1))
    mo = UNet(n_classes=3, dim=26, depth=2, init_filters=8)
    vo = mo.init(rng, xo, train=False)
    np.testing.assert_allclose(
        np.asarray(mo.copy(dilated_upconv=True).apply(vo, xo, train=False)),
        np.asarray(mo.apply(vo, xo, train=False)), atol=1e-5)


def test_dilated_upconv_3d_matches_naive():
    x3 = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 16, 2))
    m3 = UNet3D(n_classes=4, dim=16, n_channels=2, depth=2, init_filters=4,
                dilated_upconv=True)
    v3 = m3.init(jax.random.PRNGKey(0), x3, train=False)
    np.testing.assert_allclose(
        np.asarray(m3.apply(v3, x3, train=False)),
        np.asarray(UNet3D(n_classes=4, dim=16, n_channels=2, depth=2,
                          init_filters=4).apply(v3, x3, train=False)),
        atol=1e-5)


def test_lane_pad_variables_exact():
    """Lane-padded inference model (filters rounded up to a multiple,
    zero-pad weight embedding incl. the decoder-concat row split) is
    numerically exact vs the unpadded model on the same weights."""
    from multiplanarunet_tpu.models.unet import lane_pad_variables

    # cf=2 makes every level lane-hostile (int(8*sqrt(2))=11, 22, 45)
    model = UNet(n_classes=5, dim=32, n_channels=2, depth=2,
                 complexity_factor=2, init_filters=8)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 32, 32, 2)), train=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 2))
    y0 = np.asarray(model.apply(v, x, train=False))
    for M_, flags in ((16, {}), (8, {"predict_fused_bn": True,
                                     "dilated_upconv": True})):
        pm = model.copy(lane_pad=M_, **flags)
        pv = lane_pad_variables(model, v, M_)
        y = np.asarray(pm.apply(pv, x, train=False))
        np.testing.assert_allclose(y, y0, atol=2e-5)
