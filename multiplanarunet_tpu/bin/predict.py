"""`mp predict`: multi-planar inference + evaluation over a test set.

Parity surface: `mpunet/bin/predict.py` — per-view whole-volume prediction,
fusion merge (learned FusionModel weights or --sum_fusion), per-view and
fused dice evaluation written to csv/txt result tables, PRED nii.gz saving
(optionally alongside the input image/labels), `--continue` resume skipping
images already predicted, single-file mode via -f/-l, and --on_val to predict
the validation split.

The heavy path runs through `MultiViewPredictor`: one fused on-device graph
per view (sample -> U-Net -> remap -> weighted fusion accumulation) with no
host round-trips between stages."""

from __future__ import annotations

import os
from argparse import ArgumentParser
from pathlib import Path

import numpy as np


def get_argparser():
    parser = ArgumentParser(
        description="Predict (and evaluate) using a trained project model"
    )
    parser.add_argument("--project_dir", type=str, default="./")
    parser.add_argument("-f", type=str, default="",
                        help="Predict on a single image file")
    parser.add_argument("-l", type=str, default="",
                        help="Label file for single-image mode (optional)")
    parser.add_argument("--out_dir", type=str, default="predictions")
    parser.add_argument("--num_devices", "--num_GPUs", dest="num_devices",
                        type=int, default=0)
    parser.add_argument("--sum_fusion", action="store_true",
                        help="Average the per-view softmaxes instead of "
                             "applying the learned fusion model")
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--no_eval", action="store_true",
                        help="Do not evaluate against labels")
    parser.add_argument("--eval_prob", type=float, default=1.0,
                        help="Evaluate only this fraction of images")
    parser.add_argument("--on_val", action="store_true",
                        help="Predict on the validation set instead of test")
    parser.add_argument("--dataset", type=str, default=None,
                        help="Predict on an arbitrary hparams data group, "
                             "e.g. 'train' (overrides --on_val)")
    parser.add_argument("--wait_for", type=str, default="",
                        help="Wait for these PIDs before starting")
    parser.add_argument("--continue", action="store_true", dest="continue_",
                        help="Skip images already predicted in out_dir")
    parser.add_argument("--save_input_files", action="store_true",
                        help="Save image/labels alongside predictions")
    parser.add_argument("--no_argmax", action="store_true",
                        help="Save the full softmax volume instead of the "
                             "argmax class map")
    parser.add_argument("--resampler", type=str, default="auto",
                        choices=("auto", "shear", "gather"),
                        help="Plane-extraction/remap kernel: 'gather' is the "
                             "exact trilinear/nearest path; 'shear' the "
                             "faster shear-decomposed path; 'auto' (default) "
                             "uses shear when the view affines factor within "
                             "the memory guard")
    parser.add_argument("--n_planes", type=str, default="same+20",
                        help="Planes per view: 'same', 'same+N', "
                             "'by_radius' or an integer")
    parser.add_argument("--stage_dtype", type=str, default="bf16",
                        choices=("bf16", "u8"),
                        help="Host->device volume staging: 'u8' ships "
                             "per-channel affine uint8 codes (half the bf16 "
                             "transfer, dequantized on device; max intensity "
                             "error = channel range/510)")
    parser.add_argument("--no_fuse_views", action="store_true",
                        help="Dispatch each view's programs separately "
                             "instead of the fused multi-view graph (the "
                             "default below the big-volume HBM threshold); "
                             "debugging/benchmark knob")
    return parser


def validate_folders(project_dir, out_dir, overwrite, continue_):
    if not (Path(project_dir) / "train_hparams.yaml").exists():
        raise RuntimeError(f"No train_hparams.yaml in {project_dir}")
    if not (Path(project_dir) / "views.npz").exists():
        raise RuntimeError(f"No views.npz in {project_dir} — was the model "
                           f"trained with 'mp train'?")
    if not (Path(project_dir) / "model").is_dir():
        raise RuntimeError(f"No model/ folder in {project_dir}")
    if Path(out_dir).exists() and not (overwrite or continue_):
        raise RuntimeError(
            f"Output dir {out_dir} exists; pass --overwrite or --continue"
        )


def get_image_pair_loader(args, hparams, out_dir, logger):
    from multiplanarunet_tpu.image import ImagePair, ImagePairLoader

    if args.f:
        loader = ImagePairLoader(predict_mode=not args.l,
                                 initialize_empty=True, logger=logger)
        loader.add_image(ImagePair(args.f, args.l or None, logger=logger))
        return loader, bool(args.l)
    if args.dataset:
        group = args.dataset if args.dataset.endswith("_data") \
            else f"{args.dataset}_data"
    else:
        group = "val_data" if args.on_val else "test_data"
    predict_mode = args.no_eval
    loader = ImagePairLoader(logger=logger, predict_mode=predict_mode,
                             **hparams[group])
    return loader, not predict_mode


def save_nii_files(merged_cls, image_pair, nii_res_dir, save_input_files,
                   logger):
    from multiplanarunet_tpu.io import nifti

    out_dir = Path(nii_res_dir) / image_pair.identifier
    out_dir.mkdir(parents=True, exist_ok=True)
    if np.issubdtype(np.asarray(merged_cls).dtype, np.floating):
        # Full softmax volume (--no_argmax)
        nifti.save(merged_cls.astype(np.float32), out_dir / "PRED.nii.gz",
                   affine=image_pair.affine)
    else:
        nifti.save(merged_cls.astype(np.uint8), out_dir / "PRED.nii.gz",
                   affine=image_pair.affine)
    if save_input_files:
        nifti.save(image_pair.image.squeeze().astype(np.float32),
                   out_dir / "IMAGE.nii.gz", affine=image_pair.affine)
        if image_pair.labels is not None:
            nifti.save(image_pair.labels.astype(np.uint8),
                       out_dir / "LABELS.nii.gz", affine=image_pair.affine)
    logger(f"Saved prediction for {image_pair.identifier} to {out_dir}")


def run_predictions_and_eval(loader, predictor, views, fusion_params, args,
                             out_dir, hparams, logger):
    from multiplanarunet_tpu.evaluate.metrics import dice_all
    from multiplanarunet_tpu.logging import log_results as lr

    n_classes = hparams["build"]["n_classes"]
    image_ids = sorted(loader.id_to_image)
    csv_dir = os.path.join(out_dir, "csv")
    nii_dir = os.path.join(out_dir, "nii_files")

    already_done = set()
    if args.continue_ and os.path.isdir(nii_dir):
        already_done = {p for p in os.listdir(nii_dir)}
        logger(f"[--continue] {len(already_done)} images already predicted")
    if args.continue_ and os.path.isdir(csv_dir):
        results, pc_results = lr.load_result_dicts(csv_dir, views)
    else:
        results, pc_results = lr.init_result_dicts(views, image_ids, n_classes)

    rng = np.random.RandomState(0)
    todo = [i for i in image_ids if i not in already_done]
    for image_id in image_ids:
        if image_id in already_done:
            logger(f"Skipping {image_id} (already predicted)")

    # Multi-process: images are independent work items — each process of
    # the group takes a round-robin share (nii outputs are per-image dirs,
    # so shares never collide on disk); the eval CSVs are merged by the
    # main process at the end.
    import jax

    n_procs, proc_id = jax.process_count(), jax.process_index()
    if n_procs > 1:
        n_total = len(todo)
        todo = todo[proc_id::n_procs]
        logger(f"Multi-process predict: process {proc_id + 1}/{n_procs} "
               f"handles {len(todo)}/{n_total} images")

    # Three-stage software pipeline over the cohort: an input IO thread
    # decodes + scales + device-stages image i+1 and an output IO thread
    # fetches (slow remote transport) + saves image i-1's result, both
    # overlapped with device inference of image i.
    from concurrent.futures import ThreadPoolExecutor

    io_pool = ThreadPoolExecutor(max_workers=1)
    out_pool = ThreadPoolExecutor(max_workers=1)

    def _preload(idx):
        if idx < len(todo):
            img = loader.get_by_id(todo[idx])
            img.load()
            predictor.prestage(img, views, n_planes=args.n_planes)
            return img
        return None

    def _finalize(image, fused):
        try:
            to_save = fused() if callable(fused) else fused
            save_nii_files(to_save, image, nii_dir, args.save_input_files,
                           logger)
        finally:
            # Never leak the staged volume (host + device) on a failed
            # fetch/save — the exception still surfaces at the caller's
            # out_future.result()
            image.unload()

    next_future = io_pool.submit(_preload, 0)
    out_future = None
    try:
        for i, image_id in enumerate(todo):
            image = next_future.result()
            next_future = io_pool.submit(_preload, i + 1)
            try:
                if out_future is not None:
                    # Bound in-flight results to one (each holds a device-
                    # side class map until fetched) and surface save errors
                    # promptly. Cleared BEFORE .result() so a raised save
                    # error still unloads the current image in the finally.
                    pending_out, out_future = out_future, None
                    pending_out.result()
                logger(f"\n--- Predicting on {image_id} "
                       f"(shape {tuple(image.shape)}) ---")
                evaluate = (not args.no_eval and image.labels is not None
                            and rng.rand() <= args.eval_prob)
                if (getattr(predictor, "mesh", None) is not None
                        and not evaluate and not args.no_argmax):
                    # Multi-device: shard views over mesh (no per-view eval)
                    fused = predictor.predict_image_sharded(
                        image, views, predictor.mesh,
                        fusion_params=fusion_params, n_planes=args.n_planes,
                    )
                    per_view = None
                else:
                    fused, per_view = predictor.predict_image(
                        image, views, fusion_params=fusion_params,
                        n_planes=args.n_planes, return_per_view=evaluate,
                        return_probs=args.no_argmax,
                        defer_fetch=not evaluate and not args.no_argmax,
                        # Per-view dice from on-device confusion counts:
                        # only (3, n_classes) scalars cross device->host
                        # per view, never the per-view class maps
                        eval_labels=image.labels if evaluate else None,
                    )
                if not evaluate and not args.no_argmax:
                    out_future = out_pool.submit(_finalize, image, fused)
                    continue
                fused_cls = (fused.argmax(-1).astype(np.uint8)
                             if args.no_argmax else fused)
                if evaluate:
                    from multiplanarunet_tpu.evaluate.metrics import (
                        dice_from_counts,
                    )

                    labels = image.labels
                    for v, view in enumerate(views):
                        dices = dice_from_counts(per_view[v],
                                                 ignore_zero=True)
                        pc_results[str(view)][image_id] = dices
                        results.loc[image_id, str(view)] = np.nanmean(dices)
                        logger(f"View {v}: mean dice {np.nanmean(dices):.4f}")
                    merged_dices = dice_all(labels, fused_cls,
                                            n_classes=n_classes,
                                            ignore_zero=True)
                    pc_results["MJ"][image_id] = merged_dices
                    results.loc[image_id, "MJ"] = np.nanmean(merged_dices)
                    logger(f"Fused: mean dice {np.nanmean(merged_dices):.4f} "
                           f"(per-class {np.round(merged_dices, 4)})")
                    if proc_id == 0:  # progress save; final merge below
                        lr.save_all(results, pc_results, out_dir)
                to_save = fused if args.no_argmax else fused_cls
                save_nii_files(to_save, image, nii_dir,
                               args.save_input_files, logger)
            finally:
                if out_future is None:
                    image.unload()
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
            # Each non-main process persists its partial tables to a
            # hidden per-rank dir; after a group barrier the main process
            # folds the non-NaN entries into its own and writes the final
            # results exactly once.
            import shutil

            from multiplanarunet_tpu.parallel import process_barrier

            if proc_id != 0:
                rank_dir = os.path.join(out_dir, f".rank{proc_id}")
                os.makedirs(rank_dir, exist_ok=True)
                lr.save_all(results, pc_results, rank_dir)
            process_barrier("mp-predict-results")
            if proc_id == 0:
                for r in range(1, n_procs):
                    rank_dir = os.path.join(out_dir, f".rank{r}")
                    r_res, r_pc = lr.load_result_dicts(
                        os.path.join(rank_dir, "csv"), views)
                    results.update(r_res)
                    # load_result_dicts keys per-view tables by the
                    # float64 str(view); the in-memory dicts key by the
                    # views' own dtype (float32 from views.npz formats
                    # differently) — align by view, not by string
                    for v in views:
                        pc_results[str(v)].update(
                            r_pc[str(np.asarray(v, np.float64))])
                    pc_results["MJ"].update(r_pc["MJ"])
                    shutil.rmtree(rank_dir, ignore_errors=True)
                lr.save_all(results, pc_results, out_dir)
        else:
            lr.save_all(results, pc_results, out_dir)
    if n_procs > 1:
        # Hold every rank until the slowest (incl. rank 0's merge above)
        # is done: a rank that exits minutes early trips jax.distributed's
        # Shutdown-barrier timeout (measured in tests/test_distributed_cli).
        from multiplanarunet_tpu.parallel import process_barrier

        process_barrier("mp-predict-done")
    return results


def entry_func(args=None):
    args = get_argparser().parse_args(args)
    if args.wait_for:
        from multiplanarunet_tpu.utils.utils import await_PIDs

        await_PIDs(args.wait_for)
    project_dir = os.path.abspath(args.project_dir)
    out_dir = os.path.abspath(os.path.join(project_dir, args.out_dir))
    validate_folders(project_dir, out_dir, args.overwrite, args.continue_)
    os.makedirs(out_dir, exist_ok=True)

    from multiplanarunet_tpu.hyperparameters import YAMLHParams
    from multiplanarunet_tpu.logging import Logger
    from multiplanarunet_tpu.models import checkpoint as ckpt
    from multiplanarunet_tpu.models import model_initializer
    from multiplanarunet_tpu.utils.fusion import MultiViewPredictor
    from multiplanarunet_tpu.utils.utils import get_best_model

    from multiplanarunet_tpu.parallel import is_main_process

    logger = Logger(out_dir,
                    active_file="predict_log" if is_main_process() else
                    f"predict_log_rank"
                    f"{os.environ.get('MPUNET_PROCESS_ID', '')}",
                    overwrite_existing=True, no_sub_folder=True)
    hparams = YAMLHParams(Path(project_dir) / "train_hparams.yaml",
                          logger=logger, no_version_control=True)

    loader, has_labels = get_image_pair_loader(args, hparams, out_dir, logger)
    loader.set_scaler_and_bg_values(
        bg_value=hparams.get_from_anywhere("bg_value"),
        scaler=hparams.get_from_anywhere("scaler"),
        compute_now=False,
    )

    views = np.load(Path(project_dir) / "views.npz")["arr_0"]
    logger(f"Using {len(views)} views")

    # Multi-host: join the process group BEFORE the first JAX computation
    # (jax.distributed.initialize refuses to run once the backend exists —
    # model_initializer below initializes it). No-op single-process.
    from multiplanarunet_tpu.parallel import maybe_initialize_distributed

    n_procs, _ = maybe_initialize_distributed(logger=logger)

    model, variables, *_ = model_initializer(hparams=hparams, logger=logger)
    weights = get_best_model(Path(project_dir) / "model")
    logger(f"Loading model weights from {weights}")
    params, batch_stats, _ = ckpt.load_weights(weights)
    merged, _ = ckpt.restore_by_name(variables["params"], params, logger)
    variables["params"] = merged
    if batch_stats:
        merged_bs, _ = ckpt.restore_by_name(
            variables.get("batch_stats", {}), batch_stats, logger
        )
        variables["batch_stats"] = merged_bs

    fusion_params = None
    if not args.sum_fusion:
        fusion_dir = Path(project_dir) / "model" / "fusion_weights"
        candidates = sorted(fusion_dir.glob("*fusion_weights*.npz")) \
            if fusion_dir.is_dir() else []
        if candidates:
            fusion_params, _, _ = ckpt.load_weights(candidates[-1])
            logger(f"Loaded fusion weights from {candidates[-1]}")
        else:
            logger.warn("No fusion weights found — falling back to sum "
                        "fusion. Run 'mp train_fusion' to train them.")

    predictor = MultiViewPredictor(
        model, variables,
        sample_dim=hparams["build"]["dim"],
        real_space_span=hparams["fit"]["real_space_span"],
        n_classes=hparams["build"]["n_classes"],
        logger=logger, resampler=args.resampler,
        stage_dtype=args.stage_dtype,
        fuse_views=not args.no_fuse_views,
    )
    import jax

    # Multi-process predict keeps a per-host mesh: each process predicts
    # with its own local devices (images are independent work items; use
    # cv_experiment-style splitting to spread a cohort over hosts).
    devices = jax.local_devices() if n_procs > 1 else jax.devices()
    if args.num_devices:
        devices = devices[: args.num_devices]
    predictor.mesh = None
    if len(devices) > 1:
        from multiplanarunet_tpu.parallel import get_mesh

        predictor.mesh = get_mesh(devices)
        logger(f"View-parallel inference over {len(devices)} devices")
    run_predictions_and_eval(loader, predictor, views, fusion_params, args,
                             out_dir, hparams, logger)
    logger("Prediction complete.")


if __name__ == "__main__":
    entry_func()
