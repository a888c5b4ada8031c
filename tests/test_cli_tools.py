"""Tests for the auxiliary CLI tools and resume utilities."""
import os
from pathlib import Path

import numpy as np
import pytest

from multiplanarunet_tpu.bin import branch, cv_experiment, cv_split, trim_channels
from multiplanarunet_tpu.bin.mp import get_scripts
from multiplanarunet_tpu.bin.toy_data import create_dataset
from multiplanarunet_tpu.io import nifti
from multiplanarunet_tpu.utils.utils import (
    clear_csv_after_epoch,
    get_best_model,
    get_last_epoch,
    get_last_model,
    get_lr_at_epoch,
)


def test_mp_script_registry():
    scripts = get_scripts()
    for name in ("train", "predict", "predict_3D", "train_fusion",
                 "init_project", "cv_split", "cv_experiment", "summary",
                 "toy_data", "trim_channels", "branch", "run_tests",
                 "version"):
        assert name in scripts, name


@pytest.fixture(scope="module")
def flat_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("cvdata")
    rng = np.random.RandomState(0)
    create_dataset(root, 10, 16, 1, rng, "im")
    return root


def test_cv_split_symlinks(flat_dataset, tmp_path):
    out = tmp_path / "cv"
    cv_split.entry_func([
        "--data_dir", str(flat_dataset), "--CV", "5",
        "--out_dir", str(out), "--validation_fraction", "0.25",
    ])
    splits = sorted(p.name for p in out.iterdir())
    assert splits == [f"split_{i}" for i in range(5)]
    s0 = out / "split_0"
    train_ims = list((s0 / "train/images").glob("*.nii*"))
    val_ims = list((s0 / "val/images").glob("*.nii*"))
    test_ims = list((s0 / "test/images").glob("*.nii*"))
    assert len(test_ims) == 2
    assert len(train_ims) + len(val_ims) == 8
    assert len(val_ims) == 2  # 25% of 8
    # labels mirrored, links resolve
    assert len(list((s0 / "train/labels").glob("*.nii*"))) == len(train_ims)
    assert train_ims[0].resolve().exists()
    # No image appears in both train and test of the same split
    train_names = {p.name for p in train_ims} | {p.name for p in val_ims}
    assert not train_names & {p.name for p in test_ims}


def test_cv_experiment_runs_script(flat_dataset, tmp_path):
    out = tmp_path / "cv"
    cv_split.entry_func([
        "--data_dir", str(flat_dataset), "--CV", "2", "--out_dir", str(out),
    ])
    script = tmp_path / "script"
    script.write_text("echo running on [split_dir] > marker.txt\n")
    exp_out = tmp_path / "experiments"
    cv_experiment.entry_func([
        "--CV_dir", str(out), "--out_dir", str(exp_out),
        "--script_prototype", str(script),
        "--hparams_prototype", "/nonexistent.yaml",
    ])
    for i in range(2):
        marker = exp_out / f"split_{i}" / "marker.txt"
        assert marker.exists()
        assert f"split_{i}" in marker.read_text()


def test_cv_experiment_aborts_split_on_failure(flat_dataset, tmp_path):
    out = tmp_path / "cv"
    cv_split.entry_func([
        "--data_dir", str(flat_dataset), "--CV", "1", "--out_dir", str(out),
    ])
    script = tmp_path / "script"
    script.write_text("false\necho should_not_run > marker.txt\n")
    exp_out = tmp_path / "exp"
    with pytest.raises(SystemExit):
        cv_experiment.entry_func([
            "--CV_dir", str(out), "--out_dir", str(exp_out),
            "--script_prototype", str(script),
            "--hparams_prototype", "/nonexistent.yaml",
        ])
    assert not (exp_out / "split_0" / "marker.txt").exists()


def test_trim_channels(tmp_path):
    arr = np.random.rand(6, 6, 6, 3).astype(np.float32)
    p = tmp_path / "img.nii.gz"
    nifti.save(arr, p, affine=np.eye(4))
    trim_channels.entry_func(["--folder", str(tmp_path), "--channels", "0,2"])
    out = nifti.load(p).get_fdata()
    assert out.shape == (6, 6, 6, 2)
    np.testing.assert_allclose(out, arr[..., [0, 2]], rtol=1e-6)


def test_branch_multitask_project(tmp_path):
    import shutil

    from multiplanarunet_tpu.bin.init_project import defaults_dir

    proj = tmp_path / "mt"
    proj.mkdir()
    for f in (defaults_dir() / "MultiTask").glob("*.yaml"):
        shutil.copy(f, proj / f.name)
    np.savez(proj / "views", np.eye(3))
    branch.entry_func(["--project_dir", str(proj)])
    for task in ("task_1", "task_2"):
        bdir = proj / "branches" / task
        assert (bdir / "train_hparams.yaml").exists()
        assert (bdir / "views.npz").exists()
        import yaml

        hp = yaml.safe_load((bdir / "train_hparams.yaml").read_text())
        assert hp["build"]["model_class_name"] == "UNet"
        assert "train_data" in hp and "fit" in hp


def test_model_file_selection(tmp_path):
    mdir = tmp_path / "model"
    mdir.mkdir()
    for name in ("@epoch_03_val_dice_0.50000.npz",
                 "@epoch_07_val_dice_0.81000.npz",
                 "model_weights.npz"):
        (mdir / name).touch()
    assert get_best_model(mdir).endswith("0.81000.npz")
    path, epoch = get_last_model(mdir)
    assert epoch == 7 and path.endswith("0.81000.npz")


def test_csv_resume_helpers(tmp_path):
    csv = tmp_path / "training.csv"
    csv.write_text(
        "epoch,loss,lr\n0,1.0,0.001\n1,0.9,0.001\n2,0.8,0.0009\n3,0.7,0.0008\n"
    )
    lr, col = get_lr_at_epoch(2, tmp_path)
    assert col == "lr" and lr == pytest.approx(0.0009)
    clear_csv_after_epoch(1, csv)
    assert get_last_epoch(csv) == 1
    assert len(csv.read_text().strip().splitlines()) == 3


def test_version_entry(capsys):
    from multiplanarunet_tpu.bin import version

    version.entry_func([])
    out = capsys.readouterr().out
    assert "version: 0.1.0" in out


def test_compute_class_weights():
    from multiplanarunet_tpu.utils.utils import compute_class_weights

    w = compute_class_weights([900, 90, 10])
    assert w[2] > w[1] > w[0]
    np.testing.assert_allclose(w.mean(), 1.0)
    # weights inversely proportional to frequency
    np.testing.assert_allclose(w[1] / w[0], 10.0, rtol=1e-6)
