"""`mp branch`: split a MultiTask project into per-task single-task projects.

Parity surface: `mpunet/bin/branch.py` (reimplemented working — the
reference's version carries a stale import and is broken in v0.2.12,
`bin/branch.py:7`): for each task of a MultiTask project, create
<out_dir>/<task>/train_hparams.yaml merging the shared build/fit groups with
the task's data groups and task_specifics, and link the trained shared
weights so the per-task project can be fine-tuned or predicted from."""

from __future__ import annotations

import os
import shutil
from argparse import ArgumentParser
from pathlib import Path

import yaml


def get_argparser():
    parser = ArgumentParser(description="Branch a MultiTask project into "
                                        "per-task projects")
    parser.add_argument("--project_dir", type=str, default="./")
    parser.add_argument("--out_dir", type=str, default="branches")
    parser.add_argument("--copy_weights", action="store_true",
                        help="Copy model weights into each branch")
    return parser


def build_branch_yaml(main_hparams, task_hparams):
    """Merged single-task hparams dict for one task."""
    merged = {}
    for group in ("train_data", "val_data", "test_data", "aug_data"):
        if group in task_hparams:
            merged[group] = task_hparams[group]
    build = dict(main_hparams.get("build", {}))
    build["model_class_name"] = "UNet"
    specifics = task_hparams.get("task_specifics", {})
    for key in ("n_classes", "n_channels", "dim", "out_activation",
                "biased_output_layer"):
        if key in specifics:
            build[key] = specifics[key]
    merged["build"] = build
    fit = dict(main_hparams.get("fit", {}))
    if "real_space_span" in specifics:
        fit["real_space_span"] = specifics["real_space_span"]
    merged["fit"] = fit
    return merged


def entry_func(args=None):
    args = get_argparser().parse_args(args)
    project_dir = Path(args.project_dir).absolute()
    main_path = project_dir / "train_hparams.yaml"
    if not main_path.exists():
        raise RuntimeError(f"No train_hparams.yaml in {project_dir}")
    main = yaml.safe_load(main_path.read_text())
    tasks = main.get("tasks")
    if not tasks:
        raise RuntimeError("Not a MultiTask project (no 'tasks' group)")

    out_root = project_dir / args.out_dir
    for name, hfile in zip(tasks["task_names"], tasks["hparam_files"]):
        task_conf = yaml.safe_load((project_dir / hfile).read_text())
        branch_dir = out_root / name
        branch_dir.mkdir(parents=True, exist_ok=True)
        merged = build_branch_yaml(main, task_conf)
        with open(branch_dir / "train_hparams.yaml", "w") as f:
            yaml.safe_dump(merged, f, sort_keys=False)
        views = project_dir / "views.npz"
        if views.exists():
            shutil.copy(views, branch_dir / "views.npz")
        model_dir = project_dir / "model"
        if args.copy_weights and model_dir.is_dir():
            shutil.copytree(model_dir, branch_dir / "model",
                            dirs_exist_ok=True)
        print(f"Branched task '{name}' -> {branch_dir}")


if __name__ == "__main__":
    entry_func()
