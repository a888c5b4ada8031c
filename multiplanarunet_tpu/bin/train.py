"""`mp train`: run a full training session inside a project directory.

Parity surface: `mpunet/bin/train.py` — argument surface (continue/overwrite/
just_one/no_val/epoch+image-count overrides/max_loaded_images/wait_for),
hparam validation, data preparation via the per-model PREPARATION_FUNCS,
model build with optional class-frequency output bias, Trainer compile + fit,
and a final model/model_weights.npz save. GPU bookkeeping
(num_GPUs/force_GPU/GPUMonitor) is replaced by JAX device discovery — the
data-parallel mesh spans whatever chips the runtime exposes."""

from __future__ import annotations

import os
from argparse import ArgumentParser
from pathlib import Path

import numpy as np


def get_argparser():
    parser = ArgumentParser(
        description="Fit a model defined in a project folder. Invoke "
                    "'mp init_project' to start a new project."
    )
    parser.add_argument("--project_dir", type=str, default="./",
                        help="Path to a project directory (default: cwd)")
    parser.add_argument("--num_devices", "--num_GPUs", dest="num_devices",
                        type=int, default=0,
                        help="Number of accelerator devices to use "
                             "(0 = all available)")
    parser.add_argument("--continue_training", action="store_true",
                        help="Continue the last training session")
    parser.add_argument("--overwrite", action="store_true",
                        help="Overwrite previous session in the project path")
    parser.add_argument("--initialize_from", type=str, default=None,
                        help="Path to a weights file to (partially) "
                             "initialize the model from")
    parser.add_argument("--just_one", action="store_true",
                        help="Run on only the first train/val image (testing)")
    parser.add_argument("--no_val", action="store_true",
                        help="Do not perform validation")
    parser.add_argument("--no_images", action="store_true",
                        help="Do not save sample images during training")
    parser.add_argument("--wait_for", type=str, default="",
                        help="Wait for these PIDs to terminate before "
                             "starting")
    parser.add_argument("--train_images_per_epoch", type=int, default=2500)
    parser.add_argument("--val_images_per_epoch", type=int, default=3500)
    parser.add_argument("--max_loaded_images", type=int, default=None,
                        help="Bound host/HBM-resident training images; "
                             "cycled every --num_access accesses")
    parser.add_argument("--epochs", type=int, default=None,
                        help="Override the configured number of epochs")
    parser.add_argument("--num_access", type=int, default=50)
    parser.add_argument("--debug", action="store_true",
                        help="Enable numerical debugging: jax_debug_nans "
                             "raises on the first NaN-producing op "
                             "(the reference wraps the tf session in tfdbg, "
                             "mpunet/bin/train.py:361-363)")
    return parser


def validate_args(args):
    if args.continue_training and args.overwrite:
        raise ValueError("Cannot both --continue_training and --overwrite.")
    if args.train_images_per_epoch <= 0:
        raise ValueError("train_images_per_epoch must be positive")
    if args.val_images_per_epoch <= 0:
        raise ValueError("val_images_per_epoch must be positive "
                         "(use --no_val to disable validation)")


def validate_project_dir(project_dir):
    if not (Path(project_dir) / "train_hparams.yaml").exists():
        raise RuntimeError(
            f"'{project_dir}' is not a valid project folder (no "
            f"train_hparams.yaml). Run 'mp init_project' first."
        )


def validate_hparams(hparams):
    loss_kwargs = hparams["fit"].get("loss_kwargs") or {}
    if hparams["fit"].get("class_weights") and "class_weights" not in loss_kwargs:
        if "Focal" not in str(hparams["fit"]["loss"]):
            raise ValueError(
                "class_weights are only supported with SparseFocalLoss"
            )
    return True


def remove_previous_session(project_dir):
    import shutil

    for sub in ("images", "logs", "tensorboard", "views.npz", "views.png"):
        path = Path(project_dir) / sub
        if path.is_dir():
            shutil.rmtree(path)
        elif path.exists():
            path.unlink()
    model_dir = Path(project_dir) / "model"
    if model_dir.is_dir():
        shutil.rmtree(model_dir)


def get_data_sequences(project_dir, hparams, logger, args):
    from multiplanarunet_tpu.preprocessing.data_preparation_funcs import (
        PREPARATION_FUNCS,
    )

    model_name = hparams["build"]["model_class_name"]
    if model_name not in PREPARATION_FUNCS:
        raise ValueError(
            f"No data preparation function for model '{model_name}'. "
            f"Available: {sorted(PREPARATION_FUNCS)}"
        )
    hparams["fit"]["max_loaded"] = args.max_loaded_images
    hparams["fit"]["num_access"] = args.num_access
    train, val = PREPARATION_FUNCS[model_name](
        hparams=hparams,
        just_one=args.just_one,
        no_val=args.no_val,
        continue_training=args.continue_training,
        logger=logger,
        base_path=project_dir,
    )
    return train, val


def get_model(project_dir, train_seq, hparams, logger, args):
    from multiplanarunet_tpu.models import model_initializer
    from multiplanarunet_tpu.utils.utils import (
        estimate_class_frequencies,
        set_bias_weights,
    )

    model, variables, init_epoch, restored_lr = model_initializer(
        hparams=hparams,
        continue_training=args.continue_training,
        project_dir=project_dir,
        logger=logger,
        initialize_from=args.initialize_from,
    )
    if isinstance(hparams["build"].get("n_classes"), (list, tuple)):
        # MultiTask: per-task output layers; bias init is per-task work the
        # shared estimate below cannot do — skip (upstream never did either)
        return model, variables, init_epoch, restored_lr
    if not args.continue_training and hparams["build"].get("biased_output_layer"):
        try:
            counts = estimate_class_frequencies(
                train_seq.image_pair_queue, hparams["build"]["n_classes"],
                logger=logger,
            )
            variables["params"] = set_bias_weights(
                variables["params"], counts, logger=logger
            )
        except Exception as e:
            logger.warn(f"Could not set biased output layer: {e}")
    return model, variables, init_epoch, restored_lr


def save_final_weights(trainer, project_dir, logger=None):
    path = Path(project_dir) / "model" / "model_weights.npz"
    if logger:
        logger(f"Saving current model to: {path}")
    trainer.save_checkpoint(path)


def run(project_dir, logger, args):
    import jax

    from multiplanarunet_tpu.hyperparameters import YAMLHParams
    from multiplanarunet_tpu.parallel import (
        get_mesh,
        maybe_initialize_distributed,
    )
    from multiplanarunet_tpu.train import Trainer

    # Multi-host: join the process group before any device use (no-op
    # single-process). The global mesh below then spans all hosts and each
    # process's sequences feed its local batch share.
    maybe_initialize_distributed(logger=logger)

    if getattr(args, "debug", False):
        jax.config.update("jax_debug_nans", True)
        logger("--debug: jax_debug_nans enabled (training will stop at the "
               "first op producing a NaN)")

    hparams = YAMLHParams(Path(project_dir) / "train_hparams.yaml",
                          logger=logger)
    validate_hparams(hparams)

    train, val = get_data_sequences(project_dir, hparams, logger, args)
    model, variables, init_epoch, restored_lr = get_model(
        project_dir, train, hparams, logger, args
    )

    devices = jax.devices()
    if args.num_devices:
        devices = devices[: args.num_devices]
    mesh = get_mesh(devices)
    logger(f"Using {len(devices)} device(s): {devices}")

    trainer = Trainer(model, variables, logger=logger, mesh=mesh)
    fit = hparams["fit"]
    loss_kwargs = dict(fit.get("loss_kwargs") or {})
    if fit.get("class_weights") is True and "class_weights" not in loss_kwargs:
        # Auto-compute inverse-frequency class weights from the training set
        # (parity: the reference's class_weights: True auto-fill)
        from multiplanarunet_tpu.utils.utils import (
            compute_class_weights,
            estimate_class_frequencies,
        )

        counts = estimate_class_frequencies(
            train.image_pair_queue, hparams["build"]["n_classes"],
            logger=logger,
        )
        weights = compute_class_weights(counts)
        loss_kwargs["class_weights"] = [round(float(w), 5) for w in weights]
        logger(f"Auto class weights: {loss_kwargs['class_weights']}")
    trainer.compile_model(
        optimizer=fit["optimizer"],
        optimizer_kwargs=fit.get("optimizer_kwargs"),
        loss=fit["loss"],
        metrics=fit.get("metrics"),
        loss_kwargs=loss_kwargs,
        l1_reg=hparams["build"].get("l1_reg") or 0.0,
        l2_reg=hparams["build"].get("l2_reg") or 0.0,
    )
    if restored_lr:
        trainer.set_learning_rate(restored_lr)
        logger(f"Restored learning rate: {restored_lr}")

    n_epochs = args.epochs or fit["n_epochs"]
    callbacks = fit.get("callbacks", [])
    if args.no_val:
        from multiplanarunet_tpu.callbacks import remove_validation_callbacks

        callbacks = remove_validation_callbacks(callbacks, logger)

    try:
        trainer.fit(
            train, val,
            batch_size=fit["batch_size"],
            n_epochs=n_epochs,
            callbacks=callbacks,
            train_im_per_epoch=args.train_images_per_epoch,
            val_im_per_epoch=args.val_images_per_epoch,
            init_epoch=init_epoch,
            verbose=fit.get("verbose", True),
            no_im=args.no_images,
        )
    finally:
        from multiplanarunet_tpu.parallel import is_main_process

        if is_main_process():
            save_final_weights(trainer, project_dir, logger)
    hparams.save_current()  # no-op on non-main processes


def entry_func(args=None):
    from multiplanarunet_tpu.logging import Logger
    from multiplanarunet_tpu.utils.utils import await_PIDs

    args = get_argparser().parse_args(args)
    validate_args(args)
    project_dir = os.path.abspath(args.project_dir)
    validate_project_dir(project_dir)
    os.chdir(project_dir)

    from multiplanarunet_tpu.parallel import (
        is_main_process,
        maybe_initialize_distributed,
        process_barrier,
    )

    # Initialize the process group BEFORE touching the shared project dir:
    # the overwrite cleanup below must complete before any other rank
    # creates its log file inside logs/ (measured race in
    # tests/test_distributed_cli.py — rank 1's freshly opened
    # train_rank1.txt vanished under rank 0's rmtree).
    maybe_initialize_distributed()
    if args.overwrite and is_main_process():
        remove_previous_session(project_dir)
    process_barrier("mp-train-overwrite")

    logger = Logger(
        project_dir,
        overwrite_existing=args.overwrite or args.continue_training,
        # Per-process log files: the shared `train` log belongs to the
        # main process; others keep their own rank-suffixed file
        active_file="train" if is_main_process()
        else f"train_rank{os.environ.get('MPUNET_PROCESS_ID', '')}",
    )
    logger(f"Project directory: {project_dir}")
    if args.wait_for:
        await_PIDs(args.wait_for, logger=logger)
    run(project_dir, logger, args)


if __name__ == "__main__":
    entry_func()
