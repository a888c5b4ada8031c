"""`mp predict_3D`: inference with a 3D model.

Parity surface: `mpunet/bin/predict_3D.py` — isotropic scanner-space box
inference (`pred_3D_iso`: base tiling + extra random boxes, scatter-add
recon) or voxel-space patch inference, dice evaluation and nii saving."""

from __future__ import annotations

import os
from argparse import ArgumentParser
from pathlib import Path

import numpy as np


def get_argparser():
    parser = ArgumentParser(description="Predict with a 3D model")
    parser.add_argument("--project_dir", type=str, default="./")
    parser.add_argument("-f", type=str, default="",
                        help="Predict on a single file")
    parser.add_argument("-l", type=str, default="",
                        help="Label file for single-file mode")
    parser.add_argument("--out_dir", type=str, default="predictions_3D")
    parser.add_argument("--num_devices", "--num_GPUs", dest="num_devices",
                        type=int, default=0)
    parser.add_argument("--extra_boxes", type=str, default="2x",
                        help="Extra random boxes: an int or 'Nx' multiplier "
                             "of the base-tile count")
    parser.add_argument("--min_coverage", type=float, default=None)
    parser.add_argument("--N_extra_patches", type=int, default=0,
                        help="Extra random patches in voxel-patch mode")
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--no_eval", action="store_true")
    parser.add_argument("--on_val", action="store_true")
    parser.add_argument("--save_input_files", action="store_true")
    parser.add_argument("--save_only_pred", action="store_true",
                        help="Save only the PRED file (no IMAGE/LABELS)")
    parser.add_argument("--data_dir", type=str, default=None,
                        help="Predict on all images of this folder instead "
                             "of the configured test set")
    parser.add_argument("--strides", type=int, default=None,
                        help="Stride for sliding-window patch mode")
    parser.add_argument("--wait_for", type=str, default="")
    return parser


def entry_func(args=None):
    args = get_argparser().parse_args(args)
    project_dir = os.path.abspath(args.project_dir)
    out_dir = os.path.abspath(os.path.join(project_dir, args.out_dir))
    if os.path.exists(out_dir) and not args.overwrite:
        raise RuntimeError(f"{out_dir} exists; pass --overwrite")
    os.makedirs(out_dir, exist_ok=True)

    import jax

    from multiplanarunet_tpu.evaluate.metrics import dice_all
    from multiplanarunet_tpu.hyperparameters import YAMLHParams
    from multiplanarunet_tpu.image import ImagePair, ImagePairLoader
    from multiplanarunet_tpu.io import nifti
    from multiplanarunet_tpu.logging import Logger, log_results as lr
    from multiplanarunet_tpu.models import checkpoint as ckpt
    from multiplanarunet_tpu.models import model_initializer
    from multiplanarunet_tpu.sequences import get_sequence
    from multiplanarunet_tpu.utils.fusion import (
        pred_3D_iso,
        predict_3D_patches,
    )
    from multiplanarunet_tpu.utils.utils import get_best_model

    from multiplanarunet_tpu.parallel import is_main_process

    logger = Logger(out_dir,
                    active_file="predict_log" if is_main_process() else
                    f"predict_log_rank"
                    f"{os.environ.get('MPUNET_PROCESS_ID', '')}",
                    overwrite_existing=True, no_sub_folder=True)
    hparams = YAMLHParams(Path(project_dir) / "train_hparams.yaml",
                          logger=logger, no_version_control=True)
    n_classes = hparams["build"]["n_classes"]

    if args.wait_for:
        from multiplanarunet_tpu.utils.utils import await_PIDs

        await_PIDs(args.wait_for)
    # Data
    if args.f:
        loader = ImagePairLoader(predict_mode=not args.l,
                                 initialize_empty=True, logger=logger)
        loader.add_image(ImagePair(args.f, args.l or None, logger=logger))
    elif args.data_dir:
        loader = ImagePairLoader(base_dir=args.data_dir, logger=logger,
                                 predict_mode=args.no_eval,
                                 img_subdir=hparams["test_data"]["img_subdir"],
                                 label_subdir=hparams["test_data"]["label_subdir"])
    else:
        group = "val_data" if args.on_val else "test_data"
        loader = ImagePairLoader(logger=logger, predict_mode=args.no_eval,
                                 **hparams[group])
    loader.set_scaler_and_bg_values(
        bg_value=hparams.get_from_anywhere("bg_value"),
        scaler=hparams.get_from_anywhere("scaler"),
        compute_now=False,
    )

    # Multi-host: join the process group BEFORE the first JAX computation
    # (no-op single-process; images are independent work items — spread a
    # cohort over hosts with cv_experiment-style splitting)
    from multiplanarunet_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed(logger=logger)

    # Model
    model, variables, *_ = model_initializer(hparams=hparams, logger=logger)
    weights = get_best_model(Path(project_dir) / "model")
    params, batch_stats, _ = ckpt.load_weights(weights)
    variables["params"], _ = ckpt.restore_by_name(
        variables["params"], params, logger
    )
    if batch_stats:
        variables["batch_stats"], _ = ckpt.restore_by_name(
            variables.get("batch_stats", {}), batch_stats, logger
        )
    logger(f"Loaded weights from {weights}")
    predict_fn = jax.jit(
        lambda x: model.apply(variables, x, train=False)
    )

    # Sequence (inference mode)
    fit_kwargs = dict(hparams["fit"])
    if args.strides:
        fit_kwargs["intrp_style"] = "sliding_patches_3d"
        fit_kwargs["strides"] = args.strides
    seq = get_sequence(
        data_queue=loader,
        is_validation=True,
        logger=logger,
        dim=hparams["build"]["dim"],
        n_classes=n_classes,
        no_log=True,
        **fit_kwargs,
    )
    iso_mode = fit_kwargs["intrp_style"].lower() == "iso_live_3d"
    all_ids = sorted(loader.id_to_image)
    results, detailed = lr.init_result_dict_3D(all_ids, n_classes)
    # Multi-process: images are independent work items — round-robin
    # share per process (per-image nii dirs never collide); the main
    # process merges per-rank partial tables at the end.
    n_procs, proc_id = jax.process_count(), jax.process_index()
    image_ids = all_ids
    if n_procs > 1:
        image_ids = all_ids[proc_id::n_procs]
        logger(f"Multi-process predict_3D: process {proc_id + 1}/"
               f"{n_procs} handles {len(image_ids)}/{len(all_ids)} images")
    nii_dir = os.path.join(out_dir, "nii_files")

    # Cohort pipeline (same shape as `mp predict`): an input IO thread
    # decodes + device-stages image i+1 (pure transfer — kernel dispatch
    # stays on this thread; the remote transport is not dispatch-thread-
    # safe) and an output thread evaluates + gzip-saves image i-1, both
    # overlapped with device inference of image i.
    from concurrent.futures import ThreadPoolExecutor

    io_pool = ThreadPoolExecutor(max_workers=1)
    out_pool = ThreadPoolExecutor(max_workers=1)

    def _preload(idx):
        if idx >= len(image_ids):
            return None
        img = loader.get_by_id(image_ids[idx])
        img.load()
        img.interpolator.device_volume()  # prestage the scaled volume
        return img

    def _finalize(image, pred_cls):
        image_id = image.identifier
        try:
            if not args.no_eval and image.labels is not None:
                dices = dice_all(image.labels, pred_cls,
                                 n_classes=n_classes, ignore_zero=True)
                detailed[image_id] = dices
                results[image_id] = [float(np.nanmean(dices))]
                logger(f"[{image_id}] Mean dice: {np.nanmean(dices):.4f} "
                       f"(per-class {np.round(dices, 4)})")
            img_out = Path(nii_dir) / image_id
            img_out.mkdir(parents=True, exist_ok=True)
            nifti.save(pred_cls, img_out / "PRED.nii.gz",
                       affine=image.affine)
            if args.save_input_files and not args.save_only_pred:
                nifti.save(image.image.squeeze().astype(np.float32),
                           img_out / "IMAGE.nii.gz", affine=image.affine)
                if image.labels is not None:
                    nifti.save(image.labels.astype(np.uint8),
                               img_out / "LABELS.nii.gz",
                               affine=image.affine)
        finally:
            image.unload()

    next_future = io_pool.submit(_preload, 0)
    out_future = None
    try:
        for i, image_id in enumerate(image_ids):
            image = next_future.result()
            next_future = io_pool.submit(_preload, i + 1)
            try:
                logger(f"\n--- Predicting on {image_id} ---")
                # want_argmax: only the uint8 class map crosses device->
                # host (the full float32 softmax volume is n_classes*4 x
                # larger — the dominant cost on remote transports)
                if iso_mode:
                    pred_cls = pred_3D_iso(predict_fn, seq, image,
                                           extra_boxes=args.extra_boxes,
                                           min_coverage=args.min_coverage,
                                           logger=logger, want_argmax=True)
                else:
                    pred_cls = predict_3D_patches(
                        predict_fn, seq, image,
                        n_extra=args.N_extra_patches, n_classes=n_classes,
                        logger=logger, want_argmax=True)
                if out_future is not None:
                    # Join finalize(i-1) only AFTER predicting image i, so
                    # its dice_all + gzip save overlapped this inference;
                    # joining here still bounds in-flight finalizes to one
                    # and surfaces eval/save errors promptly
                    pending_out, out_future = out_future, None
                    pending_out.result()
                out_future = out_pool.submit(_finalize, image, pred_cls)
            except BaseException:
                image.unload()
                raise
        if out_future is not None:
            out_future.result()
    finally:
        # Drain the in-flight preload so an aborted run does not leak its
        # staged host+device volume
        try:
            pending = next_future.result(timeout=300)
            if pending is not None:
                pending.unload()
        except Exception:
            pass
        io_pool.shutdown(wait=False)
        out_pool.shutdown(wait=True)
    if not args.no_eval:
        if n_procs > 1:
            # Exactly-once results: non-main ranks persist their share as
            # JSON; after a host-level barrier the main process folds the
            # non-NaN entries in and writes the final tables alone.
            import json

            from multiplanarunet_tpu.parallel import process_barrier

            if proc_id != 0:
                part = {
                    "results": {im: results[im] for im in image_ids},
                    "detailed": {im: list(np.asarray(detailed[im],
                                                     np.float64))
                                 for im in image_ids},
                }
                with open(os.path.join(out_dir, f".rank{proc_id}.json"),
                          "w") as f:
                    json.dump(part, f)
            process_barrier("mp-predict3d-results")
            if proc_id == 0:
                for r in range(1, n_procs):
                    path = os.path.join(out_dir, f".rank{r}.json")
                    with open(path) as f:
                        part = json.load(f)
                    results.update(part["results"])
                    detailed.update(part["detailed"])
                    os.remove(path)
                lr.save_all_3D(results, detailed, out_dir)
            process_barrier("mp-predict3d-done")
        else:
            lr.save_all_3D(results, detailed, out_dir)
    elif n_procs > 1:
        from multiplanarunet_tpu.parallel import process_barrier

        process_barrier("mp-predict3d-done")
    logger("3D prediction complete.")


if __name__ == "__main__":
    entry_func()
