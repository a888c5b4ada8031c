"""Tests for YAMLHParams: parsing, group access, comment-preserving edits."""
import shutil
from pathlib import Path

import pytest
import yaml

from multiplanarunet_tpu.hyperparameters.hparams import YAMLHParams

PRESET = (
    Path(__file__).parent.parent
    / "multiplanarunet_tpu/bin/defaults/MultiPlanar/train_hparams.yaml"
)


@pytest.fixture
def hp(tmp_path):
    dst = tmp_path / "train_hparams.yaml"
    shutil.copy(PRESET, dst)
    return YAMLHParams(dst, no_log=True, no_version_control=True)


def test_load_groups_and_strip_cb(hp):
    assert "fit" in hp and "build" in hp and "train_data" in hp
    assert not any(k.startswith("__CB") for k in hp)
    # callback anchors resolved into the callbacks list
    cbs = hp["fit"]["callbacks"]
    names = [cb["class_name"] for cb in cbs]
    assert "ModelCheckPointClean" in names and "EarlyStopping" in names


def test_get_from_anywhere(hp):
    assert hp.get_from_anywhere("batch_size") == 16
    assert hp.get_from_anywhere("model_class_name") == "UNet"
    assert hp.get_from_anywhere("not_a_key", default=42) == 42


def test_set_value_preserves_comments(hp):
    n_comments = hp.string_rep.count("#")
    hp.set_value("build", "n_classes", 4, overwrite=True, log=False)
    assert hp["build"]["n_classes"] == 4
    assert hp.string_rep.count("#") == n_comments
    # Re-parse the edited string: value must round-trip
    parsed = yaml.safe_load(hp.string_rep)
    assert parsed["build"]["n_classes"] == 4


def test_set_value_no_overwrite_skips(hp):
    hp.set_value("fit", "batch_size", 99, overwrite=False, log=False)
    assert hp["fit"]["batch_size"] == 16  # unchanged: already set


def test_set_value_overwrite(hp):
    hp.set_value("fit", "batch_size", 8, overwrite=True, log=False)
    assert hp["fit"]["batch_size"] == 8
    assert yaml.safe_load(hp.string_rep)["fit"]["batch_size"] == 8


def test_set_value_null_is_overwritable(hp):
    # Null-valued entries are treated as unset (overwrite not needed)
    hp.set_value("build", "dim", 64, overwrite=False, log=False)
    assert hp["build"]["dim"] == 64
    assert yaml.safe_load(hp.string_rep)["build"]["dim"] == 64


def test_add_missing_key_and_group(hp):
    hp.set_value("fit", "brand_new_key", 1.5, log=False)
    assert yaml.safe_load(hp.string_rep)["fit"]["brand_new_key"] == 1.5
    hp.set_value("new_group", "k", "v", log=False)
    assert yaml.safe_load(hp.string_rep)["new_group"]["k"] == "v"


def test_groups_listing(hp):
    groups = hp.groups
    assert "fit" in groups and "build" in groups
    assert any(g.startswith("__CB") for g in groups)  # raw string keeps anchors


def test_delete_group(hp):
    hp.delete_group("test_data")
    assert "test_data" not in hp
    assert "test_data" not in hp.groups


def test_save_and_reload(hp, tmp_path):
    hp.set_value("build", "n_classes", 7, overwrite=True, log=False)
    out = tmp_path / "saved.yaml"
    hp.save_current(out)
    hp2 = YAMLHParams(out, no_log=True, no_version_control=True)
    assert hp2["build"]["n_classes"] == 7
    # Anchors still resolve after round-trip
    assert isinstance(hp2["fit"]["callbacks"], list)


def test_version_stamping(tmp_path):
    dst = tmp_path / "train_hparams.yaml"
    shutil.copy(PRESET, dst)
    hp = YAMLHParams(dst, no_log=True)  # version control ON
    assert hp["__VERSION__"] is not None
    reparsed = yaml.safe_load(dst.read_text())
    assert reparsed["__VERSION__"] == hp["__VERSION__"]


def test_logger_files(tmp_path):
    from multiplanarunet_tpu.logging.loggers import Logger

    log = Logger(tmp_path, print_to_screen=False)
    log("hello", "world")
    log("to-other-file", out_file="other")
    log.warn("careful")
    log.close()
    assert "hello world" in (tmp_path / "logs/log.txt").read_text()
    assert "to-other-file" in (tmp_path / "logs/other.txt").read_text()
    assert "careful" in (tmp_path / "logs/warnings.txt").read_text()
    # Overwrite protection
    with pytest.raises(OSError):
        Logger(tmp_path, print_to_screen=False)
