"""Data preparation: hparams -> audited loaders -> queues -> sequences.

Parity surface: `mpunet/preprocessing/data_preparation_funcs.py` — the base
loader flow (train/val ImagePairLoaders, Auditor fill of unspecified hparams,
aug-data merge with its sample weight, --just_one/--no_val handling, queue
selection), view creation/persistence (views.npz + views.png), and the
per-model prepare functions consumed by `mp train`."""

from __future__ import annotations

import os

import numpy as np

from multiplanarunet_tpu.image.auditor import Auditor
from multiplanarunet_tpu.image.image_pair_loader import ImagePairLoader
from multiplanarunet_tpu.image.queue import get_data_queues
from multiplanarunet_tpu.logging import ScreenLogger
from multiplanarunet_tpu.ops.geometry import (
    sample_random_views_with_angle_restriction,
)
from multiplanarunet_tpu.sequences import get_sequence


def _base_loader_func(hparams, just_one, no_val, logger, mtype):
    """Load + audit datasets; returns (train_queue, val_queue, logger,
    auditor)."""
    logger = logger or ScreenLogger()
    logger("Looking for images...")

    train_data = ImagePairLoader(logger=logger, **hparams["train_data"])
    val_data = ImagePairLoader(logger=logger, **hparams["val_data"])

    lab_paths = list(train_data.label_paths or []) + list(val_data.label_paths or [])
    auditor = Auditor(
        [str(p) for p in list(train_data.image_paths) + list(val_data.image_paths)],
        nii_lab_paths=[str(p) for p in lab_paths] or None,
        logger=logger,
        dim_3d=hparams.get_from_anywhere("dim") or 64,
        hparams=hparams,
    )
    auditor.fill(hparams, mtype)

    aug_data = hparams.get("aug_data")
    if aug_data:
        if "include" not in aug_data:
            logger.warn(
                "'aug_data' group found without the required 'include' key — "
                "NOT including augmented data."
            )
        elif aug_data["include"]:
            logger(f"\n[*] Adding augmented data with weight "
                   f"{aug_data['sample_weight']}")
            train_data.add_images(ImagePairLoader(logger=logger, **aug_data))

    if just_one:
        logger("[**NOTICE**] Only running on first train & val samples.")
        train_data.images = [train_data.images[0]]
        val_data.images = [val_data.images[0]]
        train_data._id_to_image = train_data.get_id_to_images_dict()
        val_data._id_to_image = val_data.get_id_to_images_dict()
    if no_val:
        val_data.images = []
        val_data._id_to_image = {}

    for dataset in (train_data, val_data):
        logger(f"Preparing dataset {dataset}")
        dataset.set_scaler_and_bg_values(
            bg_value=hparams.get_from_anywhere("bg_value"),
            scaler=hparams.get_from_anywhere("scaler"),
            compute_now=False,
        )

    max_loaded = hparams["fit"].get("max_loaded")
    train_queue, val_queue = get_data_queues(
        train_dataset=train_data,
        val_dataset=val_data if len(val_data) else None,
        train_queue_type="limitation" if max_loaded else "eager",
        val_queue_type="eager",
        max_loaded=max_loaded,
        num_access_before_reload=hparams["fit"].get("num_access"),
        logger=logger,
    )
    return train_queue, val_queue, logger, auditor


def add_noise_to_views(views, sd, rng=None):
    """Pre-add orientation noise to fixed views (non-iso_live styles)."""
    rng = rng or np.random
    out = []
    for v in np.asarray(views, np.float64):
        noisy = v + rng.normal(scale=sd, size=3)
        out.append(noisy / np.linalg.norm(noisy))
    return np.asarray(out)


def load_or_create_views(hparams, continue_training, logger, base_path,
                         auditor=None):
    """Resolve the 'views' hparam: int -> freshly sampled restricted views
    (persisted to views.npz + views.png); list -> optional pre-noising;
    continue -> reload views.npz."""
    views = hparams["fit"]["views"]
    view_path = os.path.join(base_path, "views.npz")
    if continue_training:
        hparams["fit"]["views"] = np.load(view_path)["arr_0"]
        return
    if isinstance(views, (int, np.integer)):
        weights = None
        if auditor is not None:
            weights = np.median(auditor.info["pixdims"], axis=0)
            logger(f"[OBS] Weighting random views by median res: {weights}")
        views = sample_random_views_with_angle_restriction(
            int(views), 60, weights=weights, logger=logger
        )
        hparams["fit"]["views"] = views
    elif isinstance(views, (list, tuple, np.ndarray)):
        views = np.asarray(views, np.float64)
        if hparams["fit"]["intrp_style"] != "iso_live":
            logger(f"[Note] Pre-adding noise to views "
                   f"(SD: {hparams['fit']['noise_sd']})")
            views = add_noise_to_views(views, hparams["fit"]["noise_sd"])
            hparams["fit"]["noise_sd"] = False
        hparams["fit"]["views"] = views
    else:
        raise ValueError(f"Invalid 'views' value {views!r}; must be an int "
                         f"or a list of vectors")
    logger(f"View SD:     {hparams['fit'].get('noise_sd')}")
    # Multi-process: the view axes (and pre-added noise) above are random
    # draws — every process must train on the MAIN process's draw, and
    # only that process persists views.npz/png to the shared project dir.
    from multiplanarunet_tpu.parallel import broadcast_from_main, \
        is_main_process

    hparams["fit"]["views"] = broadcast_from_main(
        np.asarray(hparams["fit"]["views"], np.float64))
    if not is_main_process():
        return
    np.savez(os.path.join(base_path, "views"), hparams["fit"]["views"])
    try:
        from multiplanarunet_tpu.utils.plotting import plot_views

        plot_views(hparams["fit"]["views"],
                   os.path.join(base_path, "views.png"))
    except Exception as e:  # plotting must not block training
        logger.warn(f"Could not plot views: {e}")


def get_sequencers(train_queue, val_queue, logger, hparams):
    logger("Preparing sequence objects...")
    out = []
    for queue, is_val in ((train_queue, False), (val_queue, True)):
        if not queue:
            out.append(None)
            continue
        out.append(get_sequence(
            data_queue=queue,
            is_validation=is_val,
            logger=logger,
            dim=hparams["build"]["dim"],
            n_classes=hparams["build"]["n_classes"],
            **hparams["fit"],
        ))
    return out[0], out[1]


def prepare_for_multi_view_unet(hparams, just_one=False, no_val=False,
                                continue_training=False, logger=None,
                                base_path="./"):
    train_queue, val_queue, logger, auditor = _base_loader_func(
        hparams, just_one, no_val, logger, "2d"
    )
    load_or_create_views(hparams, continue_training, logger, base_path,
                         auditor)
    return get_sequencers(train_queue, val_queue, logger, hparams)


def prepare_for_3d_unet(hparams, just_one=False, no_val=False,
                        continue_training=False, logger=None,
                        base_path="./"):
    train_queue, val_queue, logger, auditor = _base_loader_func(
        hparams, just_one, no_val, logger, "3d"
    )
    return get_sequencers(train_queue, val_queue, logger, hparams)


def _load_or_create_task_views(hparams, task_name, auditor, continue_training,
                               logger, base_path):
    """Per-task view resolution: each task samples (and persists) its own
    restricted view set at `views_<task>.npz` (spans/resolutions differ per
    task, so sharing one view set across tasks has no benefit)."""
    view_path = os.path.join(base_path, f"views_{task_name}.npz")
    if continue_training:
        return np.load(view_path)["arr_0"]
    views = hparams["fit"]["views"]
    if isinstance(views, (int, np.integer)):
        weights = None
        if auditor is not None:
            weights = np.median(auditor.info["pixdims"], axis=0)
        views = sample_random_views_with_angle_restriction(
            int(views), 60, weights=weights, logger=logger
        )
    else:
        views = np.asarray(views, np.float64)
    np.savez(view_path, views)
    return views


def prepare_for_multi_task_2d(hparams, just_one=False, no_val=False,
                              continue_training=False, logger=None,
                              base_path="./"):
    """MultiTask training data preparation: one audited loader/queue/sequence
    stack per task, wrapped in a MultiTaskSequence.

    The reference DISABLES MultiTask training in >=0.2.6
    (`mpunet/preprocessing/data_preparation_funcs.py:237-240` raises
    NotImplementedError); here it is fully supported — per-task YAMLs (the
    `tasks` group of the MultiTask preset) are loaded, audited into their
    `task_specifics` groups, and the main `build` group is filled with the
    per-task n_classes/n_channels/dim lists the MultiTaskUNet2D consumes."""
    from multiplanarunet_tpu.hyperparameters import YAMLHParams
    from multiplanarunet_tpu.sequences.multi_task import MultiTaskSequence

    logger = logger or ScreenLogger()
    tasks = hparams.get("tasks")
    if not tasks or "task_names" not in tasks:
        raise ValueError(
            "MultiTask training needs a 'tasks' group with 'task_names' and "
            "'hparam_files' in train_hparams.yaml (see the MultiTask preset)."
        )
    names = list(tasks["task_names"])
    files = list(tasks["hparam_files"])
    if len(names) != len(files):
        raise ValueError("tasks.task_names and tasks.hparam_files must have "
                         "equal length")

    train_seqs, val_seqs = [], []
    n_classes, n_channels, dims = [], [], []
    for name, fname in zip(names, files):
        logger(f"\n[*] Preparing task '{name}' ({fname})")
        task_hp = YAMLHParams(os.path.join(base_path, fname), logger=logger,
                              no_version_control=True)
        # Shared fit settings (bg_value, scaler, max_loaded, ...) come from
        # the main file; graft the group in-memory for get_from_anywhere
        # lookups (the raw YAML string of the task file is not touched)
        dict.__setitem__(task_hp, "fit", dict(hparams["fit"]))
        train_queue, val_queue, logger, auditor = _base_loader_func(
            task_hp, just_one, no_val, logger, "multi_task_2d"
        )
        spec = task_hp["task_specifics"]
        views = _load_or_create_task_views(
            hparams, name, auditor, continue_training, logger, base_path
        )
        fit_kwargs = dict(hparams["fit"])
        fit_kwargs["views"] = views
        fit_kwargs["real_space_span"] = spec["real_space_span"]
        for queue, is_val, out in ((train_queue, False, train_seqs),
                                   (val_queue, True, val_seqs)):
            if not queue:
                out.append(None)
                continue
            out.append(get_sequence(
                data_queue=queue, is_validation=is_val, logger=logger,
                dim=spec["dim"], n_classes=spec["n_classes"], **fit_kwargs,
            ))
        n_classes.append(int(spec["n_classes"]))
        n_channels.append(int(spec["n_channels"]))
        dims.append(int(spec["dim"]))

    # Push the per-task lists into the main build group (consumed by
    # MultiTaskUNet2D's constructor)
    for key, value in (("task_names", names), ("n_classes", n_classes),
                       ("n_channels", n_channels), ("dim", dims)):
        hparams.set_value(subdir="build", name=key, value=value,
                          overwrite=True, log=False)
    hparams.save_current()

    train = MultiTaskSequence(train_seqs, names, logger=logger)
    val = None
    if not no_val and all(s is not None for s in val_seqs):
        val = MultiTaskSequence(val_seqs, names, logger=logger, no_log=True)
    return train, val


PREPARATION_FUNCS = {
    "UNet": prepare_for_multi_view_unet,
    "UNet3D": prepare_for_3d_unet,
    "MultiTaskUNet2D": prepare_for_multi_task_2d,
}
