"""Reference-checkpoint import: synthesize Keras weight h5 files in the
reference's two layouts (named 2D layers, auto-named 3D layers) and check
`mp convert_weights` restores EVERY parameter of our models by name."""
import numpy as np
import pytest

import jax
from flax import traverse_util

from multiplanarunet_tpu.bin import convert_weights
from multiplanarunet_tpu.models import UNet, UNet3D, checkpoint as ckpt
from multiplanarunet_tpu.models import init_model_variables

h5py = pytest.importorskip("h5py")


def _ref_name_2d(path):
    """Our param module path -> reference Keras layer name."""
    import re

    m = re.match(r"^encoder_L(\d+)/conv(\d)$", path)
    if m:
        return f"encoder_L{m.group(1)}_conv{m.group(2)}"
    m = re.match(r"^encoder_L(\d+)/bn$", path)
    if m:
        return f"encoder_L{m.group(1)}_BN"
    m = re.match(r"^bottom/conv(\d)$", path)
    if m:
        return f"bottom_conv{m.group(1)}"
    if path == "bottom/bn":
        return "bottom_BN"
    m = re.match(r"^decoder_L(\d+)_conv_up$", path)
    if m:
        return f"upsample_L{m.group(1)}_conv1"
    m = re.match(r"^decoder_L(\d+)_bn_up$", path)
    if m:
        return f"upsample_L{m.group(1)}_BN1"
    m = re.match(r"^decoder_L(\d+)/conv(\d)$", path)
    if m:
        return f"upsample_L{m.group(1)}_conv{int(m.group(2)) + 1}"
    m = re.match(r"^decoder_L(\d+)/bn$", path)
    if m:
        return f"upsample_L{m.group(1)}_BN2"
    if path == "out_conv":
        return "conv2d_17"
    raise AssertionError(path)


_LEAF_TO_KERAS = {("params", "kernel"): "kernel:0",
                  ("params", "bias"): "bias:0",
                  ("params", "scale"): "gamma:0",
                  ("batch_stats", "mean"): "moving_mean:0",
                  ("batch_stats", "var"): "moving_variance:0"}


def _keras_leaf(coll, module, leaf):
    if coll == "params" and leaf == "bias" and module.endswith(("bn",
                                                                "bn_up")):
        return "beta:0"
    return _LEAF_TO_KERAS[(coll, leaf)]


def _write_h5(path, variables, name_of):
    """Write a Keras-weights-style h5 holding randomized arrays shaped like
    `variables`. Returns the flat {collection/module/leaf: array} truth."""
    rng = np.random.RandomState(0)
    truth = {}
    with h5py.File(path, "w") as f:
        for coll in ("params", "batch_stats"):
            flat = traverse_util.flatten_dict(variables.get(coll, {}),
                                              sep="/")
            for k, v in flat.items():
                module, leaf = k.rsplit("/", 1)
                layer = name_of(module)
                arr = rng.randn(*np.shape(v)).astype(np.float32)
                truth[f"{coll}/{k}"] = arr
                grp = f.require_group(layer).require_group(layer)
                grp.create_dataset(_keras_leaf(coll, module, leaf), data=arr)
    return truth


def _roundtrip(tmp_path, model, variables, name_of):
    h5_path = tmp_path / "model_weights.h5"
    truth = _write_h5(h5_path, variables, name_of)
    out = tmp_path / "model_weights.npz"
    convert_weights.entry_func(["--h5", str(h5_path), "--out", str(out)])

    params, batch_stats, meta = ckpt.load_weights(out)
    assert meta["converted_from"] == str(h5_path)
    merged_p, n_p = ckpt.restore_by_name(variables["params"], params)
    merged_b, n_b = ckpt.restore_by_name(variables["batch_stats"],
                                         batch_stats)
    total_p = len(traverse_util.flatten_dict(variables["params"]))
    total_b = len(traverse_util.flatten_dict(variables["batch_stats"]))
    assert n_p == total_p, (n_p, total_p)
    assert n_b == total_b, (n_b, total_b)
    for k, v in traverse_util.flatten_dict(merged_p, sep="/").items():
        np.testing.assert_array_equal(v, truth[f"params/{k}"])
    for k, v in traverse_util.flatten_dict(merged_b, sep="/").items():
        np.testing.assert_array_equal(v, truth[f"batch_stats/{k}"])


def test_convert_named_2d(tmp_path):
    model = UNet(n_classes=3, dim=32, depth=2, init_filters=8,
                 complexity_factor=1)
    variables = init_model_variables(model, rng=jax.random.PRNGKey(0))
    _roundtrip(tmp_path, model, variables, _ref_name_2d)


def test_convert_autonamed_3d(tmp_path):
    """The reference 3D model saves with Keras auto-names (conv3d_N /
    batch_normalization_N in creation order)."""
    model = UNet3D(n_classes=3, dim=16, depth=2, init_filters=8,
                   complexity_factor=1)
    variables = init_model_variables(model, rng=jax.random.PRNGKey(0))

    conv_order, bn_order = convert_weights._ordered_targets(
        2 * 2 + 2 + 3 * 2 + 1, 2 * 2 + 2 + 1)
    conv_names = ["conv3d"] + [f"conv3d_{i}" for i in range(1,
                                                            len(conv_order))]
    bn_names = ["batch_normalization"] + [
        f"batch_normalization_{i}" for i in range(1, len(bn_order))]
    name_of = {**dict(zip(conv_order, conv_names)),
               **dict(zip(bn_order, bn_names))}.__getitem__
    _roundtrip(tmp_path, model, variables, name_of)


def test_export_convert_roundtrip_2d(tmp_path):
    """npz -> `mp export_weights` h5 -> `mp convert_weights` npz preserves
    every array bit-for-bit (TF-free half of the 'switch back' story; the
    real-Keras load is tested in test_keras_parity)."""
    from multiplanarunet_tpu.bin import export_weights

    model = UNet(n_classes=3, dim=32, depth=3, init_filters=8,
                 complexity_factor=2)
    variables = init_model_variables(model, rng=jax.random.PRNGKey(1))
    npz = tmp_path / "w.npz"
    ckpt.save_weights(npz, variables["params"], variables["batch_stats"])
    export_weights.entry_func(["--weights", str(npz),
                               "--out", str(tmp_path / "w.h5")])
    convert_weights.entry_func(["--h5", str(tmp_path / "w.h5"),
                                "--out", str(tmp_path / "w2.npz")])
    p2, bs2, _ = ckpt.load_weights(tmp_path / "w2.npz")
    want_p = traverse_util.flatten_dict(variables["params"], sep="/")
    got_p = traverse_util.flatten_dict(p2, sep="/")
    assert set(want_p) == set(got_p)
    for k in want_p:
        np.testing.assert_array_equal(np.asarray(want_p[k]), got_p[k])
    want_b = traverse_util.flatten_dict(variables["batch_stats"], sep="/")
    got_b = traverse_util.flatten_dict(bs2, sep="/")
    assert set(want_b) == set(got_b)
    for k in want_b:
        np.testing.assert_array_equal(np.asarray(want_b[k]), got_b[k])


def test_export_convert_roundtrip_3d(tmp_path):
    from multiplanarunet_tpu.bin import export_weights

    model = UNet3D(n_classes=4, dim=16, depth=2, init_filters=8,
                   complexity_factor=1)
    variables = init_model_variables(model, rng=jax.random.PRNGKey(2))
    npz = tmp_path / "w3.npz"
    ckpt.save_weights(npz, variables["params"], variables["batch_stats"])
    export_weights.entry_func(["--weights", str(npz),
                               "--out", str(tmp_path / "w3.h5")])
    convert_weights.entry_func(["--h5", str(tmp_path / "w3.h5"),
                                "--out", str(tmp_path / "w32.npz")])
    p2, bs2, _ = ckpt.load_weights(tmp_path / "w32.npz")
    want = traverse_util.flatten_dict(variables["params"], sep="/")
    got = traverse_util.flatten_dict(p2, sep="/")
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_array_equal(np.asarray(want[k]), got[k])
