"""Model construction from hparams + continue-training restoration.

Parity surface: `mpunet/models/model_init.py` — name->class resolution from
the build group, `initialize_from` transfer initialization, and
continue-training (find last `@epoch_NN` checkpoint, restore weights by name,
recover the epoch number and learning rate from logs/training.csv)."""

from __future__ import annotations

import inspect
from pathlib import Path

import jax
import jax.numpy as jnp

from multiplanarunet_tpu.logging import ScreenLogger
from multiplanarunet_tpu.models import checkpoint as ckpt
from multiplanarunet_tpu.models.fusion_model import FusionModel
from multiplanarunet_tpu.models.multitask_unet import MultiTaskUNet2D
from multiplanarunet_tpu.models.unet import UNet
from multiplanarunet_tpu.models.unet3d import UNet3D
from multiplanarunet_tpu.utils.utils import (
    clear_csv_after_epoch,
    get_last_model,
    get_lr_at_epoch,
)

MODELS = {
    "UNet": UNet,
    "UNet3D": UNet3D,
    "MultiTaskUNet2D": MultiTaskUNet2D,
    "FusionModel": FusionModel,
}


def _filter_build_kwargs(cls, build):
    fields = set(inspect.signature(cls).parameters)
    return {k: v for k, v in build.items() if k in fields and v is not None}


def build_model(build_hparams, mixed_precision=False, logger=None):
    """Construct an (uninitialized) flax module from the 'build' group."""
    logger = logger or ScreenLogger()
    build = dict(build_hparams)
    name = build.pop("model_class_name")
    if name not in MODELS:
        raise ValueError(f"Unknown model_class_name '{name}'. "
                         f"Available: {sorted(MODELS)}")
    cls = MODELS[name]
    kwargs = _filter_build_kwargs(cls, build)
    if mixed_precision and "dtype" in set(inspect.signature(cls).parameters):
        kwargs["dtype"] = jnp.bfloat16
    model = cls(**kwargs)
    logger(f"Built model: {name}({kwargs})")
    return model


def init_model_variables(model, rng=None, input_shape=None):
    """Initialize variables for any model family on a dummy batch."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    if input_shape is None:
        if isinstance(model, FusionModel):
            input_shape = (1, model.n_inputs, model.n_classes)
        elif isinstance(model, MultiTaskUNet2D):
            input_shape = None  # handled below (tuple of per-task shapes)
        elif isinstance(model, UNet3D):
            d = model.dim
            input_shape = (1, d, d, d, model.n_channels)
        else:
            d = model.dim
            input_shape = (1, d, d, model.n_channels)
    # Jit the init: flax's eager init would execute the whole forward pass
    # op-by-op (disastrous over a remote-device transport); under jit it is
    # one compiled program and XLA elides the unused forward compute.
    if isinstance(model, MultiTaskUNet2D) and input_shape is None:
        xs = tuple(
            jnp.zeros((1, d, d, c), jnp.float32)
            for d, c in zip(model.dim, model.n_channels)
        )
        variables = jax.jit(lambda r: model.init(r, xs, train=False))(rng)
    elif isinstance(model, FusionModel):
        x = jnp.zeros(input_shape, jnp.float32)
        variables = jax.jit(lambda r: model.init(r, x))(rng)
    else:
        x = jnp.zeros(input_shape, jnp.float32)
        variables = jax.jit(lambda r: model.init(r, x, train=False))(rng)
    return dict(variables)


def model_initializer(hparams, continue_training=False, project_dir=None,
                      logger=None, rng=None, initialize_from=None):
    """Build + initialize a model; optionally restore for continue-training.

    Returns (model, variables, init_epoch, restored_lr)."""
    logger = logger or ScreenLogger()
    mixed = bool(hparams.get("fit", {}).get("mixed_precision", False))
    model = build_model(hparams["build"], mixed_precision=mixed, logger=logger)
    variables = init_model_variables(model, rng=rng)

    init_epoch, restored_lr = 0, None
    weights_path = None
    if continue_training:
        if project_dir is None:
            raise ValueError("continue_training requires a project_dir")
        weights_path, init_epoch = get_last_model(Path(project_dir) / "model")
        if weights_path is None:
            logger.warn("No previous checkpoint found; training from scratch.")
        else:
            # Checkpoint filenames carry the 1-based completed-epoch count;
            # CSV rows are 0-based epoch indices. Training resumes at 0-based
            # index == count, so completed rows are those < init_epoch.
            csv_path = Path(project_dir) / "logs" / "training.csv"
            restored_lr, _ = get_lr_at_epoch(init_epoch - 1, csv_path.parent)
            clear_csv_after_epoch(init_epoch - 1, csv_path)
    elif initialize_from:
        weights_path = initialize_from

    if weights_path:
        logger(f"Restoring weights (by name) from {weights_path}")
        params, batch_stats, _ = ckpt.load_weights(weights_path)
        merged_params, n1 = ckpt.restore_by_name(
            variables["params"], params, logger
        )
        variables["params"] = merged_params
        if batch_stats and variables.get("batch_stats"):
            merged_bs, _ = ckpt.restore_by_name(
                variables["batch_stats"], batch_stats, logger
            )
            variables["batch_stats"] = merged_bs
        logger(f"Restored {n1} parameter arrays (epoch={init_epoch})")

    return model, variables, init_epoch, restored_lr
