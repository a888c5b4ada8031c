"""Drive the miscellaneous callbacks against a stub trainer."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multiplanarunet_tpu.callbacks import (
    DelayedCallback,
    DividerLine,
    FGBatchBalancer,
    LearningCurve,
    MeanReduceLogArrays,
    MemoryConsumption,
    PrintLayerWeights,
    Profiler,
    SaveOutputAs2DImage,
    SavePredictionImages,
    init_callback_objects,
    remove_validation_callbacks,
)
from multiplanarunet_tpu.logging import ScreenLogger


class _StubSeq:
    fg_batch_fraction = 0.5

    def __getitem__(self, i):
        rng = np.random.RandomState(0)
        X = rng.rand(2, 16, 16, 1).astype(np.float32)
        y = rng.randint(0, 3, (2, 16, 16, 1))
        return X, y, np.ones(2, np.float32)


class _StubTrainer:
    logger = ScreenLogger(False)
    stop_training = False
    train_sequence = _StubSeq()
    val_sequence = None

    class state:  # noqa: N801 - mimic TrainState attr access
        params = {"layer": {"kernel": np.ones((3, 3))}}

    def predict_batch(self, X):
        B = np.asarray(X).shape[0]
        logits = np.random.RandomState(1).rand(B, 16, 16, 3)
        return jnp.asarray(logits / logits.sum(-1, keepdims=True))


def test_fg_batch_balancer_updates_fraction():
    tr = _StubTrainer()
    cb = FGBatchBalancer()
    cb.set_trainer(tr)
    cb.on_epoch_end(0, {"val_recall": 0.8})
    assert tr.train_sequence.fg_batch_fraction == pytest.approx(0.2)


def test_mean_reduce_log_arrays():
    cb = MeanReduceLogArrays()
    logs = {"a": np.array([1.0, 3.0]), "b": 2.0}
    cb.on_epoch_end(0, logs)
    assert logs["a"] == 2.0 and logs["b"] == 2.0


def test_delayed_callback_gates_epochs():
    calls = []

    class _Probe(DividerLine):
        def on_epoch_end(self, epoch, logs=None):
            calls.append(epoch)

    cb = DelayedCallback(_Probe(logger=ScreenLogger(False)), start_from=2)
    cb.set_trainer(_StubTrainer())
    for e in range(4):
        cb.on_epoch_end(e, {})
    assert calls == [2, 3]


def test_print_layer_weights_and_memory(capsys):
    tr = _StubTrainer()
    for cb in (PrintLayerWeights(logger=ScreenLogger(False)),
               MemoryConsumption(logger=ScreenLogger(False))):
        cb.set_trainer(tr)
        logs = {}
        cb.on_epoch_end(0, logs)
    assert "memory_gib" in logs


def test_save_prediction_images_and_outputs(tmp_path):
    tr = _StubTrainer()
    cb1 = SavePredictionImages(out_dir=tmp_path / "imgs")
    cb1.set_trainer(tr)
    cb1.on_epoch_end(0, {})
    assert (tmp_path / "imgs" / "epoch_000.png").exists()

    cb2 = SaveOutputAs2DImage(out_dir=tmp_path / "outs")
    cb2.set_trainer(tr)
    cb2.on_epoch_end(0, {})
    assert (tmp_path / "outs" / "output_epoch_000.png").exists()


def test_learning_curve_plots(tmp_path):
    csv = tmp_path / "training.csv"
    csv.write_text("epoch,loss,val_dice\n0,1.0,0.2\n1,0.5,0.4\n")
    cb = LearningCurve(log_dir=tmp_path, out_dir=tmp_path)
    cb.set_trainer(_StubTrainer())
    cb.on_epoch_end(1, {})
    assert (tmp_path / "curve.png").exists()


def test_profiler_writes_trace(tmp_path):
    cb = Profiler(log_dir=str(tmp_path / "prof"), epochs=(0,))
    cb.set_trainer(_StubTrainer())
    cb.on_epoch_begin(0, {})
    _ = jnp.sum(jnp.ones((8, 8)))  # something to trace
    cb.on_epoch_end(0, {})
    assert any((tmp_path / "prof").rglob("*"))


def test_callback_registry_and_no_val_filter():
    specs = [
        {"class_name": "DividerLine", "nickname": "div"},
        {"class_name": "EarlyStopping",
         "kwargs": {"monitor": "val_dice"}},
    ]
    objs, by_name = init_callback_objects(specs, logger=ScreenLogger(False))
    assert len(objs) == 2 and "div" in by_name
    kept = remove_validation_callbacks(specs, logger=ScreenLogger(False))
    assert len(kept) == 1  # EarlyStopping(monitor=val_dice) dropped
