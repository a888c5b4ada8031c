"""Full-pipeline CLI smoke test: toy_data -> init_project -> train ->
predict (+eval) -> train_fusion -> predict with learned fusion -> summary.

This is the framework's equivalent of the reference's integration strategy
(toy data + full train/predict runs, SURVEY.md section 4) and exercises every
layer through the real `mp` entry points."""
import os
from pathlib import Path

import numpy as np
import pytest
import yaml

from multiplanarunet_tpu.bin import (
    init_project,
    predict,
    predict_3D,
    summary,
    toy_data,
    train,
    train_fusion,
)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("e2e")
    toy_data.entry_func([
        "--out_dir", str(ws / "data"), "--N_train", "3", "--N_val", "2",
        "--N_test", "2", "--image_size", "32", "--seed", "1",
    ])
    return ws


@pytest.fixture(scope="module")
def trained_project(workspace):
    proj = workspace / "proj"
    init_project.entry_func([
        "--name", "proj", "--root", str(workspace),
        "--data_dir", str(workspace / "data"),
    ])
    # Shrink the model for CPU testing
    hp_path = proj / "train_hparams.yaml"
    text = hp_path.read_text()
    text = text.replace("complexity_factor: 2", "complexity_factor: 0.02")
    text = text.replace("depth: 4", "depth: 2")
    text = text.replace("views: 6", "views: 2")
    text = text.replace("mixed_precision: True", "mixed_precision: False")
    hp_path.write_text(text)

    cwd = os.getcwd()
    try:
        train.entry_func([
            "--project_dir", str(proj), "--overwrite", "--no_images",
            "--epochs", "2", "--train_images_per_epoch", "16",
            "--val_images_per_epoch", "8",
        ])
    finally:
        os.chdir(cwd)
    return proj


def test_project_initialized(trained_project):
    hp = yaml.safe_load((trained_project / "train_hparams.yaml").read_text())
    # Auditor filled the audited values back into the file
    assert hp["build"]["n_classes"] == 4
    assert hp["build"]["n_channels"] == 1
    assert hp["build"]["dim"] is not None
    assert hp["fit"]["real_space_span"] is not None


def test_training_artifacts(trained_project):
    assert (trained_project / "views.npz").exists()
    views = np.load(trained_project / "views.npz")["arr_0"]
    assert views.shape == (2, 3)
    assert (trained_project / "model" / "model_weights.npz").exists()
    ckpts = list((trained_project / "model").glob("@epoch_*val_dice*.npz"))
    assert len(ckpts) == 1
    csv = (trained_project / "logs" / "training.csv").read_text()
    assert len(csv.strip().splitlines()) == 3  # header + 2 epochs


def test_predict_sum_fusion(trained_project):
    cwd = os.getcwd()
    try:
        predict.entry_func([
            "--project_dir", str(trained_project), "--out_dir",
            "predictions", "--sum_fusion", "--overwrite",
            "--save_input_files", "--n_planes", "same",
        ])
    finally:
        os.chdir(cwd)
    out = trained_project / "predictions"
    assert (out / "csv" / "results.csv").exists()
    nii_dirs = list((out / "nii_files").iterdir())
    assert len(nii_dirs) == 2
    for d in nii_dirs:
        assert (d / "PRED.nii.gz").exists()
        assert (d / "IMAGE.nii.gz").exists()
    # Results table has per-view + MJ columns with values
    import pandas as pd

    res = pd.read_csv(out / "csv" / "results.csv", index_col=0)
    assert "MJ" in res.columns and len(res.columns) == 3
    assert res["MJ"].notna().all()


def test_train_fusion_and_fused_predict(trained_project):
    cwd = os.getcwd()
    try:
        train_fusion.entry_func([
            "--project_dir", str(trained_project), "--overwrite",
            "--images_per_round", "2", "--min_val_images", "2",
            "--epochs", "2", "--batch_size", "8192", "--n_planes", "same",
        ])
    finally:
        os.chdir(cwd)
    fusion_files = list(
        (trained_project / "model" / "fusion_weights").glob("*.npz")
    )
    assert len(fusion_files) == 1

    cwd = os.getcwd()
    try:
        predict.entry_func([
            "--project_dir", str(trained_project), "--out_dir",
            "predictions_fused", "--overwrite", "--n_planes", "same",
        ])
    finally:
        os.chdir(cwd)
    assert (trained_project / "predictions_fused" / "csv" /
            "results.csv").exists()


def test_summary_reports(trained_project, capsys):
    summary.entry_func(["--dir", str(trained_project)])
    out = capsys.readouterr().out
    assert "mean dice" in out.lower()


def test_predict_continue_skips(trained_project, capsys):
    cwd = os.getcwd()
    try:
        if not (trained_project / "predictions" / "nii_files").exists():
            # Self-contained when run in isolation (normally populated by
            # test_predict_sum_fusion above)
            predict.entry_func([
                "--project_dir", str(trained_project), "--out_dir",
                "predictions", "--sum_fusion", "--overwrite",
                "--n_planes", "same",
            ])
        predict.entry_func([
            "--project_dir", str(trained_project), "--out_dir",
            "predictions", "--sum_fusion", "--continue",
            "--n_planes", "same",
        ])
    finally:
        os.chdir(cwd)
    # All images already predicted -> skipped
    log = (trained_project / "predictions" / "predict_log.txt").read_text()
    assert log.count("Skipping") == 2


def test_continue_training_resumes(trained_project):
    """--continue_training restores the last checkpoint + epoch counter and
    extends the CSV log instead of restarting."""
    csv_path = trained_project / "logs" / "training.csv"
    n_before = len(csv_path.read_text().strip().splitlines())
    cwd = os.getcwd()
    try:
        train.entry_func([
            "--project_dir", str(trained_project), "--continue_training",
            "--no_images", "--epochs", "3",
            "--train_images_per_epoch", "8", "--val_images_per_epoch", "4",
        ])
    finally:
        os.chdir(cwd)
    lines = csv_path.read_text().strip().splitlines()
    assert len(lines) == n_before + 1  # exactly one more epoch (2 -> 3)
    assert lines[-1].startswith("2")  # epoch index resumed at 2


def test_initialize_from_transfer(trained_project, tmp_path, workspace):
    """--initialize_from restores matching weights into a fresh project."""
    proj2 = workspace / "proj2"
    init_project.entry_func([
        "--name", "proj2", "--root", str(workspace),
        "--data_dir", str(workspace / "data"), "--overwrite",
    ])
    hp_path = proj2 / "train_hparams.yaml"
    text = hp_path.read_text()
    text = text.replace("complexity_factor: 2", "complexity_factor: 0.02")
    text = text.replace("depth: 4", "depth: 2")
    text = text.replace("views: 6", "views: 2")
    text = text.replace("mixed_precision: True", "mixed_precision: False")
    hp_path.write_text(text)
    weights = trained_project / "model" / "model_weights.npz"
    cwd = os.getcwd()
    try:
        train.entry_func([
            "--project_dir", str(proj2), "--overwrite", "--no_images",
            "--epochs", "1", "--train_images_per_epoch", "8",
            "--val_images_per_epoch", "4",
            "--initialize_from", str(weights),
        ])
    finally:
        os.chdir(cwd)
    assert (proj2 / "model" / "model_weights.npz").exists()


def test_just_one_no_val_and_aug_data(workspace, tmp_path):
    """--just_one + --no_val flags, plus the aug_data merge path."""
    proj = workspace / "proj3"
    init_project.entry_func([
        "--name", "proj3", "--root", str(workspace),
        "--data_dir", str(workspace / "data"), "--overwrite",
    ])
    hp_path = proj / "train_hparams.yaml"
    text = hp_path.read_text()
    text = text.replace("complexity_factor: 2", "complexity_factor: 0.02")
    text = text.replace("depth: 4", "depth: 2")
    text = text.replace("views: 6", "views: 1")
    text = text.replace("mixed_precision: True", "mixed_precision: False")
    # Point aug_data at the val split with include: True
    text = text.replace("  include: False", "  include: True")
    text = text.replace(
        f"  base_dir: {workspace / 'data'}/aug",
        f"  base_dir: {workspace / 'data'}/val",
    )
    hp_path.write_text(text)
    cwd = os.getcwd()
    try:
        train.entry_func([
            "--project_dir", str(proj), "--overwrite", "--no_images",
            "--just_one", "--no_val", "--epochs", "1",
            "--train_images_per_epoch", "8", "--val_images_per_epoch", "4",
        ])
    finally:
        os.chdir(cwd)
    log = (proj / "logs" / "train.txt").read_text()
    assert "Only running on first train & val samples" in log
    assert "Adding augmented data with weight 0.33" in log
    # no_val: no val metrics in the csv
    csv = (proj / "logs" / "training.csv").read_text()
    assert "val_dice" not in csv.splitlines()[0]


def test_predict_single_file_mode(trained_project, workspace):
    """-f/-l single-image prediction writes a PRED file and evaluates."""
    img = sorted((workspace / "data/test/images").glob("*.nii.gz"))[0]
    lab = workspace / "data/test/labels" / img.name
    cwd = os.getcwd()
    try:
        predict.entry_func([
            "--project_dir", str(trained_project), "--out_dir", "single_out",
            "-f", str(img), "-l", str(lab), "--sum_fusion", "--overwrite",
            "--n_planes", "same",
        ])
    finally:
        os.chdir(cwd)
    out = trained_project / "single_out" / "nii_files"
    preds = list(out.rglob("PRED.nii.gz"))
    assert len(preds) == 1
    from multiplanarunet_tpu.io import nifti

    pred = nifti.load(preds[0]).get_raw_data()
    assert pred.shape == (32, 32, 32)
    assert (trained_project / "single_out" / "csv" / "results.csv").exists()


def test_multichannel_pipeline(tmp_path_factory):
    """2-channel volumes through train + predict (scalers, per-channel bg
    fills, pool and predictor all see C=2)."""
    ws = tmp_path_factory.mktemp("mc")
    toy_data.entry_func([
        "--out_dir", str(ws / "data"), "--N_train", "2", "--N_val", "1",
        "--N_test", "1", "--image_size", "32", "--N_channels", "2",
        "--seed", "3",
    ])
    init_project.entry_func([
        "--name", "proj", "--root", str(ws), "--data_dir", str(ws / "data"),
    ])
    proj = ws / "proj"
    text = (proj / "train_hparams.yaml").read_text()
    text = text.replace("complexity_factor: 2", "complexity_factor: 0.02")
    text = text.replace("depth: 4", "depth: 2")
    text = text.replace("views: 6", "views: 1")
    text = text.replace("mixed_precision: True", "mixed_precision: False")
    (proj / "train_hparams.yaml").write_text(text)
    cwd = os.getcwd()
    try:
        train.entry_func([
            "--project_dir", str(proj), "--overwrite", "--no_images",
            "--epochs", "1", "--train_images_per_epoch", "8",
            "--val_images_per_epoch", "4",
        ])
        predict.entry_func([
            "--project_dir", str(proj), "--out_dir", "pred", "--sum_fusion",
            "--overwrite", "--n_planes", "same",
        ])
    finally:
        os.chdir(cwd)
    import yaml as _yaml

    hp = _yaml.safe_load((proj / "train_hparams.yaml").read_text())
    assert hp["build"]["n_channels"] == 2
    assert (proj / "pred" / "csv" / "results.csv").exists()


def test_predict_no_eval_multidevice_path(trained_project):
    """--no_eval on the 8-device CPU mesh exercises the CLI's view-parallel
    branch (views sharded over the mesh)."""
    cwd = os.getcwd()
    try:
        predict.entry_func([
            "--project_dir", str(trained_project), "--out_dir",
            "pred_sharded", "--sum_fusion", "--no_eval", "--overwrite",
            "--n_planes", "same",
        ])
    finally:
        os.chdir(cwd)
    out = trained_project / "pred_sharded"
    preds = list((out / "nii_files").rglob("PRED.nii.gz"))
    assert len(preds) == 2
    log = (out / "predict_log.txt").read_text()
    assert "View-parallel inference over 8 devices" in log
