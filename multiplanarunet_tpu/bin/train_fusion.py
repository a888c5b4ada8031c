"""`mp train_fusion`: train the per-class-per-view FusionModel.

Parity surface: `mpunet/bin/train_fusion.py` — predict all views over the
validation images (topped up with random training images to >= --min_val_images)
in sub-rounds of --images_per_round, stack the per-voxel (n_views, n_classes)
probability points, and fit the FusionLayer with Adam + Sparse Generalized
Dice Loss and early stopping, saving
model/fusion_weights/<weights>_fusion_weights.npz after each round."""

from __future__ import annotations

import os
from argparse import ArgumentParser
from pathlib import Path

import numpy as np


def get_argparser():
    parser = ArgumentParser(description="Train the view-fusion model")
    parser.add_argument("--project_dir", type=str, default="./")
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--num_devices", "--num_GPUs", dest="num_devices",
                        type=int, default=0)
    parser.add_argument("--images_per_round", type=int, default=5,
                        help="Images to map per fusion training round")
    parser.add_argument("--min_val_images", type=int, default=15,
                        help="Top up the validation image set to this many "
                             "images using random training images")
    parser.add_argument("--batch_size", type=int, default=2 ** 17,
                        help="Voxel batch size for fusion training")
    parser.add_argument("--epochs", type=int, default=30,
                        help="Epochs per training round")
    parser.add_argument("--early_stopping", type=int, default=3)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--dice_weight", type=str, default="Simple",
                        help="GDL weight type: Simple/Square/Uniform")
    parser.add_argument("--n_planes", type=str, default="same+20")
    parser.add_argument("--max_points_per_image", type=int, default=2 ** 22,
                        help="Train the fusion layer on at most this many "
                             "uniformly-sampled voxels per image (0 = all; "
                             "the layer has only (V+1)*C parameters, so a "
                             "few million points match training on every "
                             "voxel while bounding device memory)")
    parser.add_argument("--continue_training", action="store_true",
                        help="Resume fusion training from saved fusion "
                             "weights")
    parser.add_argument("--eval_prob", type=float, default=1.0)
    parser.add_argument("--wait_for", type=str, default="")
    parser.add_argument("--seed", type=int, default=None,
                        help="Seed the host RNG driving the fusion fit's "
                             "shuffles (reproducible fits; also what makes "
                             "the 2-process run bit-equal to 1-process)")
    return parser


def _fit_fusion(points, targets, n_views, n_classes, args, logger,
                init_params=None):
    """Fit the fusion layer on stacked voxel points with early stopping.

    Device-resident: `points`/`targets` may be (and from
    `predict_views_points` are) jax device arrays; they are split, shuffled,
    batched and evaluated ON DEVICE — one `lax.scan` dispatch per training
    epoch and one (3, n_classes) confusion-count fetch per validation pass.
    The reference re-feeds every 2^17-voxel batch through Keras `fit` from
    host memory each epoch (`mpunet/bin/train_fusion.py:211-216`), which on
    a remote-transport TPU costs more in H2D than the optimizer math."""
    import jax
    import jax.numpy as jnp
    import optax

    from multiplanarunet_tpu.evaluate.losses import SparseGeneralizedDiceLoss
    from multiplanarunet_tpu.models import FusionModel
    from multiplanarunet_tpu.models.fusion_model import FusionLayer

    fm = FusionModel(n_inputs=n_views, n_classes=n_classes)
    params = init_params if init_params is not None else fm.init_params()
    tx = optax.adam(args.learning_rate)
    opt_state = tx.init(params)
    loss_obj = SparseGeneralizedDiceLoss(type_weight=args.dice_weight)

    # Shuffle + 20% validation split (host permutation, device gather)
    points = jnp.asarray(points, jnp.float32)
    targets = jnp.asarray(targets).astype(jnp.int32)
    n = int(points.shape[0])
    perm = np.random.permutation(n)
    n_val = max(1, int(0.2 * n))
    Xtr = points[jnp.asarray(perm[n_val:])]
    ytr = targets[jnp.asarray(perm[n_val:])]
    Xval = points[jnp.asarray(perm[:n_val])]
    yval = targets[jnp.asarray(perm[:n_val])]
    del points, targets

    n_tr = int(Xtr.shape[0])
    bs = min(args.batch_size, n_tr)
    n_batches = max(n_tr // bs, 1)

    def step(params, opt_state, x, y):
        def loss_fn(p):
            out = fm.apply({"params": p}, x)
            # Treat the voxel batch as ONE element: GDL over the whole batch
            return (loss_obj(y[None, :, None], out[None]) +
                    FusionLayer.regularizer(p))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # Data splits are passed as jit ARGUMENTS: closure-captured device
    # arrays embed as program constants and the serialized HLO then
    # exceeds remote-compile transport limits (measured HTTP 413 at 7.8M
    # points) besides duplicating the data inside the executable.
    @jax.jit
    def epoch_fn(params, opt_state, key, Xtr, ytr):
        idx = jax.random.permutation(key, n_tr)
        idx = idx[: n_batches * bs].reshape(n_batches, bs)

        def body(carry, bidx):
            params, opt_state = carry
            params, opt_state, loss = step(params, opt_state,
                                           Xtr[bidx], ytr[bidx])
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), idx)
        return params, opt_state, jnp.mean(losses)

    @jax.jit
    def val_counts(params, Xval, yval):
        pred = jnp.argmax(fm.apply({"params": params}, Xval), -1)
        tp = jnp.bincount(jnp.where(pred == yval, yval, n_classes),
                          length=n_classes + 1)[:n_classes]
        rel = jnp.bincount(yval, length=n_classes)
        sel = jnp.bincount(pred, length=n_classes)
        return jnp.stack([tp, rel, sel])

    key = jax.random.PRNGKey(np.random.randint(2 ** 31))
    best_dice, best_params, wait = -1.0, params, 0
    for epoch in range(args.epochs):
        key, ekey = jax.random.split(key)
        params, opt_state, mean_loss = epoch_fn(params, opt_state, ekey,
                                                Xtr, ytr)
        tp, rel, sel = np.asarray(val_counts(params, Xval, yval), np.float64)
        # dice_all semantics: NaN for absent classes, fg-only mean
        denom = rel + sel
        with np.errstate(invalid="ignore"):
            dice = np.where(denom > 0, 2.0 * tp / denom, np.nan)
        val_dice = float(np.nanmean(dice[1:] if n_classes > 1 else dice))
        logger(f"  epoch {epoch + 1}/{args.epochs}: "
               f"loss={float(mean_loss):.5f} val_dice={val_dice:.5f}")
        if val_dice > best_dice:
            best_dice, best_params, wait = val_dice, params, 0
        else:
            wait += 1
            if wait >= args.early_stopping:
                logger("  early stopping.")
                break
    logger(f"  best fusion val_dice: {best_dice:.5f}")
    return jax.device_get(best_params)


def entry_func(args=None):
    args = get_argparser().parse_args(args)
    if args.wait_for:
        from multiplanarunet_tpu.utils.utils import await_PIDs

        await_PIDs(args.wait_for)
    project_dir = os.path.abspath(args.project_dir)
    os.chdir(project_dir)

    from multiplanarunet_tpu.hyperparameters import YAMLHParams
    from multiplanarunet_tpu.image import ImagePairLoader
    from multiplanarunet_tpu.logging import Logger
    from multiplanarunet_tpu.models import checkpoint as ckpt
    from multiplanarunet_tpu.models import model_initializer
    from multiplanarunet_tpu.utils.fusion import MultiViewPredictor
    from multiplanarunet_tpu.utils.utils import get_best_model

    # Join the process group BEFORE the logger (per-rank log files) and
    # before the first JAX computation (model_initializer below
    # initializes the backend, after which jax.distributed refuses to
    # start).
    from multiplanarunet_tpu.parallel import (
        is_main_process,
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed()
    logger = Logger(
        project_dir,
        active_file="train_fusion" if is_main_process()
        else f"train_fusion_rank{os.environ.get('MPUNET_PROCESS_ID', '')}",
        overwrite_existing=True)
    hparams = YAMLHParams(Path(project_dir) / "train_hparams.yaml",
                          logger=logger, no_version_control=True)
    views = np.load(Path(project_dir) / "views.npz")["arr_0"]
    n_classes = hparams["build"]["n_classes"]
    n_views = len(views)

    weights_path = get_best_model(Path(project_dir) / "model")
    weights_name = Path(weights_path).stem
    fusion_dir = Path(project_dir) / "model" / "fusion_weights"
    fusion_dir.mkdir(parents=True, exist_ok=True)
    fusion_out = fusion_dir / f"{weights_name}_fusion_weights.npz"
    if fusion_out.exists() and not (args.overwrite or args.continue_training):
        raise RuntimeError(f"{fusion_out} exists; pass --overwrite or "
                           f"--continue_training")

    # Unet with best weights
    model, variables, *_ = model_initializer(hparams=hparams, logger=logger)
    params, batch_stats, _ = ckpt.load_weights(weights_path)
    variables["params"], _ = ckpt.restore_by_name(
        variables["params"], params, logger
    )
    if batch_stats:
        variables["batch_stats"], _ = ckpt.restore_by_name(
            variables.get("batch_stats", {}), batch_stats, logger
        )
    logger(f"Loaded U-Net weights from {weights_path}")

    predictor = MultiViewPredictor(
        model, variables, sample_dim=hparams["build"]["dim"],
        real_space_span=hparams["fit"]["real_space_span"],
        n_classes=n_classes, logger=logger,
    )

    # Image set: all val images, topped up with random train images
    val_loader = ImagePairLoader(logger=logger, **hparams["val_data"])
    images = list(val_loader.images)
    if len(images) < args.min_val_images:
        train_loader = ImagePairLoader(logger=logger, **hparams["train_data"])
        need = args.min_val_images - len(images)
        extra = list(train_loader.get_random(
            min(need, len(train_loader)), unique=True
        ))
        logger(f"Adding {len(extra)} random training images to the fusion "
               f"set")
        images += extra
    for im in images:
        im.set_bg_value(hparams.get_from_anywhere("bg_value"))
        im.set_scaler(hparams.get_from_anywhere("scaler"))

    fusion_params = None
    if args.continue_training and fusion_out.exists():
        fusion_params, _, _ = ckpt.load_weights(fusion_out)
        logger(f"Resuming fusion training from {fusion_out}")
    import jax
    import jax.numpy as jnp

    from multiplanarunet_tpu.parallel import is_main_process, process_barrier

    if args.seed is not None:
        np.random.seed(args.seed)
    n_procs, proc_id = jax.process_count(), jax.process_index()
    points_tmp = fusion_dir / ".points_tmp"
    if n_procs > 1:  # every rank: no barrier precedes the first savez
        points_tmp.mkdir(parents=True, exist_ok=True)

    n_rounds = -(-len(images) // args.images_per_round)
    for rnd in range(n_rounds):
        batch = images[rnd * args.images_per_round:
                       (rnd + 1) * args.images_per_round]
        logger(f"\n=== Fusion round {rnd + 1}/{n_rounds} "
               f"({len(batch)} images) ===")
        # Multi-process: the expensive per-view predict stage is cohort-
        # split round-robin across ranks (reference replicates it,
        # `mpunet/bin/train_fusion.py:111-216`); each image's points are
        # DETERMINISTIC given (rnd, i) — the subsample key is
        # PRNGKey(rnd*1000+i) — so ownership does not change values.
        # Ranks exchange points via the shared project dir (the same
        # single-writer filesystem contract as `mp predict_3D`'s results
        # merge), rank 0 fits on the full set in image order — bit-equal
        # to the 1-process fit — and writes the checkpoint; other ranks
        # reload it so --continue/init state stays lockstep.
        points_coll, targets_coll = [], []
        for i, image in enumerate(batch):
            if i % n_procs != proc_id:
                continue
            with image.loaded_in_context():
                logger(f"Mapping views over {image.identifier}...")
                pts, tgt = predictor.predict_views_points(
                    image, views, n_planes=args.n_planes,
                    max_points=args.max_points_per_image or None,
                    key=jax.random.PRNGKey(rnd * 1000 + i),
                )
                if n_procs > 1:
                    np.savez(points_tmp / f"r{rnd}_i{i:04d}.npz",
                             pts=np.asarray(pts, np.float32),
                             tgt=np.asarray(tgt, np.int32))
                else:
                    points_coll.append(pts)
                    targets_coll.append(tgt)
        if n_procs > 1:
            process_barrier(f"mp-fusion-r{rnd}-points")
            if is_main_process():
                for i in range(len(batch)):
                    with np.load(points_tmp / f"r{rnd}_i{i:04d}.npz") as f:
                        points_coll.append(jnp.asarray(f["pts"]))
                        targets_coll.append(jnp.asarray(f["tgt"]))
        if is_main_process():
            X = jnp.concatenate(points_coll, axis=0)
            y = jnp.concatenate(targets_coll, axis=0)
            del points_coll, targets_coll
            logger(f"Training fusion on {len(X)} voxel points "
                   f"(device-resident)")
            fusion_params = _fit_fusion(X, y, n_views, n_classes, args,
                                        logger, init_params=fusion_params)
            ckpt.save_weights(fusion_out, fusion_params,
                              meta={"round": rnd + 1, "n_views": n_views})
            logger(f"Saved fusion weights to {fusion_out}")
        if n_procs > 1:
            process_barrier(f"mp-fusion-r{rnd}-fit")
            if not is_main_process():
                fusion_params, _, _ = ckpt.load_weights(fusion_out)
    if n_procs > 1:
        process_barrier("mp-fusion-done")
        if is_main_process():
            import shutil

            shutil.rmtree(points_tmp, ignore_errors=True)
    logger("Fusion training complete.")
    logger(f"Final fusion W:\n"
           f"{np.asarray(fusion_params['fusion']['W'])}")


if __name__ == "__main__":
    entry_func()
