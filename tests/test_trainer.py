"""End-to-end training-loop tests on toy data (CPU, 8 virtual devices)."""
import numpy as np
import pytest

import jax

from multiplanarunet_tpu.bin.toy_data import create_dataset
from multiplanarunet_tpu.image import ImagePairLoader
from multiplanarunet_tpu.image.queue import EagerQueue
from multiplanarunet_tpu.logging import ScreenLogger
from multiplanarunet_tpu.models import UNet, init_model_variables
from multiplanarunet_tpu.parallel import get_mesh
from multiplanarunet_tpu.sequences import get_sequence
from multiplanarunet_tpu.train import Trainer


@pytest.fixture(scope="module")
def toy_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_toy")
    rng = np.random.RandomState(11)
    create_dataset(root / "train", 3, 32, 1, rng, "train")
    create_dataset(root / "val", 2, 32, 1, rng, "val")
    loaders = {}
    for split in ("train", "val"):
        loader = ImagePairLoader(base_dir=root / split, no_log=True)
        loader.set_scaler_and_bg_values(bg_value=1.0, scaler="RobustScaler",
                                        compute_now=True)
        loaders[split] = EagerQueue(loader, logger=ScreenLogger(False))
    seqs = {}
    for split, q in loaders.items():
        seqs[split] = get_sequence(
            q, intrp_style="iso_live",
            views=np.array([[0, 0, 1.0], [1.0, 0, 0]]),
            dim=32, batch_size=4, n_classes=4, real_space_span=30.0,
            noise_sd=0.0, is_validation=split == "val",
            logger=ScreenLogger(False), no_log=True,
        )
    return seqs


def _make_trainer(tmp_path, single_device=True):
    model = UNet(n_classes=4, dim=32, n_channels=1, depth=2, init_filters=4)
    variables = init_model_variables(model, rng=jax.random.PRNGKey(0))
    mesh = get_mesh(jax.devices()[:1]) if single_device else get_mesh()
    trainer = Trainer(model, variables, logger=ScreenLogger(False), mesh=mesh)
    trainer.compile_model(
        optimizer="Adam", optimizer_kwargs={"lr": 1e-3},
        loss="SparseCategoricalCrossentropy",
        metrics=["sparse_categorical_accuracy"],
    )
    return trainer


def test_training_reduces_loss(toy_setup, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    trainer = _make_trainer(tmp_path)
    history = trainer.fit(
        toy_setup["train"], toy_setup["val"], batch_size=4, n_epochs=3,
        train_im_per_epoch=32, val_im_per_epoch=8, no_im=True,
        callbacks=[{
            "class_name": "CSVLogger",
            "kwargs": {"filename": str(tmp_path / "logs/training.csv")},
        }],
    )
    assert len(history) == 3
    assert history[-1]["loss"] < history[0]["loss"]
    assert "val_dice" in history[-1]
    csv = (tmp_path / "logs/training.csv").read_text()
    assert csv.startswith("epoch")
    assert len(csv.strip().splitlines()) == 4


def test_checkpoint_and_early_stopping(toy_setup, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    trainer = _make_trainer(tmp_path)
    cb = [
        {"class_name": "ModelCheckPointClean",
         "kwargs": {"filepath": str(tmp_path) +
                    "/model/@epoch_{epoch:02d}_val_dice_{val_dice:.5f}.npz",
                    "monitor": "val_dice", "mode": "max"}},
        {"class_name": "EarlyStopping",
         "kwargs": {"monitor": "val_dice", "patience": 1, "mode": "max"}},
        {"class_name": "TrainTimer", "kwargs": {"verbose": False}},
    ]
    history = trainer.fit(
        toy_setup["train"], toy_setup["val"], batch_size=4, n_epochs=4,
        train_im_per_epoch=8, val_im_per_epoch=4, no_im=True, callbacks=cb,
    )
    files = list((tmp_path / "model").glob("@epoch_*val_dice*.npz"))
    assert len(files) == 1  # previous best deleted
    assert "epoch_minutes" in history[-1]


def test_rlop_changes_lr(toy_setup, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    trainer = _make_trainer(tmp_path)
    lr0 = trainer.learning_rate
    trainer.set_learning_rate(lr0 * 0.5)
    np.testing.assert_allclose(trainer.learning_rate, lr0 * 0.5, rtol=1e-6)
    # RLOP with patience 1 and a constant metric must reduce lr
    from multiplanarunet_tpu.callbacks import ReduceLROnPlateau

    cb = ReduceLROnPlateau(monitor="val_dice", patience=1, factor=0.5,
                           mode="max", verbose=0)
    cb.set_trainer(trainer)
    cb.on_epoch_end(0, {"val_dice": 0.5})
    cb.on_epoch_end(1, {"val_dice": 0.5})
    np.testing.assert_allclose(trainer.learning_rate, lr0 * 0.25, rtol=1e-6)


def test_multi_device_data_parallel(toy_setup, tmp_path, monkeypatch):
    """Train step over the virtual 8-device CPU mesh with sharded batches."""
    monkeypatch.chdir(tmp_path)
    assert len(jax.devices()) == 8
    trainer = _make_trainer(tmp_path, single_device=False)
    history = trainer.fit(
        toy_setup["train"], None, batch_size=8, n_epochs=1,
        train_im_per_epoch=16, no_im=True, callbacks=[],
    )
    assert np.isfinite(history[0]["loss"])


def test_validation_sharded_matches_single_device(toy_setup, tmp_path,
                                                  monkeypatch):
    """Epoch validation must use the mesh: sharded confusion counts (and
    hence val_dice) agree bitwise with the single-device path, including
    when the batch size does not divide the device count (pad + mask)."""
    monkeypatch.chdir(tmp_path)
    from multiplanarunet_tpu.callbacks.validation import Validation

    # Deterministic batches: sample once, replay identically for both runs
    val_seq = toy_setup["val"]
    val_seq.batch_size = 6  # 6 % 8 != 0 -> exercises the pad + mask path

    class _Replay:
        def __init__(self, batches):
            self.batches = batches
            self.batch_size = 6

        def __getitem__(self, i):
            return self.batches[i % len(self.batches)]

    batches = [val_seq[i] for i in range(2)]
    replay = _Replay(batches)

    results = {}
    for name, single in (("single", True), ("sharded", False)):
        trainer = _make_trainer(tmp_path, single_device=single)
        cb = Validation(replay, steps=2, logger=ScreenLogger(False),
                        verbose=False)
        cb.set_trainer(trainer)
        logs = {}
        cb.on_epoch_end(0, logs)
        results[name] = logs

    assert results["sharded"]["val_dice"] == results["single"]["val_dice"]
    assert results["sharded"]["val_precision"] == \
        results["single"]["val_precision"]
    assert results["sharded"]["val_recall"] == results["single"]["val_recall"]
    np.testing.assert_allclose(results["sharded"]["val_loss"],
                               results["single"]["val_loss"], rtol=1e-5)


def test_validation_matches_per_batch_host_accumulation(toy_setup, tmp_path,
                                                        monkeypatch):
    """The device-resident epoch accumulator (one host fetch per epoch) must
    reproduce the per-batch host accumulation it replaced: eval_step per
    batch, padded-loss correction, float64 count sums, metric means."""
    monkeypatch.chdir(tmp_path)
    from multiplanarunet_tpu.callbacks.validation import Validation
    from multiplanarunet_tpu.evaluate.metrics import precision_recall_dice

    val_seq = toy_setup["val"]
    val_seq.batch_size = 6

    class _Replay:
        def __init__(self, batches):
            self.batches = batches
            self.batch_size = 6

        def __getitem__(self, i):
            return self.batches[i % len(self.batches)]

    batches = [val_seq[i] for i in range(3)]
    trainer = _make_trainer(tmp_path, single_device=False)

    # Ground truth: the pre-accumulator algorithm, one host fetch per batch
    tp = np.zeros(4)
    rel = np.zeros(4)
    sel = np.zeros(4)
    batch_logs = []
    for X, y, w in batches:
        Xs, ys, ws, mask, n_true = trainer._shard_eval(X, y, w)
        step_logs, counts = trainer.eval_step(
            trainer.state.params, trainer.state.batch_stats, Xs, ys, ws, mask)
        step_logs = {k: float(v) for k, v in step_logs.items()}
        n_pad = int(Xs.shape[0])
        if n_pad != n_true:
            for k in step_logs:
                if k.endswith("loss"):
                    step_logs[k] *= n_pad / n_true
        batch_logs.append(step_logs)
        tp += np.asarray(counts[0])
        rel += np.asarray(counts[1])
        sel += np.asarray(counts[2])
    expected = {f"val_{k}": float(np.mean([b[k] for b in batch_logs]))
                for k in batch_logs[0]}
    (_, _, _), (mp, mr, md) = precision_recall_dice(tp, rel, sel,
                                                    ignore_bg=True)
    expected.update(val_precision=mp, val_recall=mr, val_dice=md)

    cb = Validation(_Replay(batches), steps=3, logger=ScreenLogger(False),
                    verbose=False)
    cb.set_trainer(trainer)
    logs = {}
    cb.on_epoch_end(0, logs)

    assert set(expected) <= set(logs)
    for k, v in expected.items():
        np.testing.assert_allclose(logs[k], v, rtol=1e-5, err_msg=k)
