"""Auditor: scans dataset headers and proposes sampling hyperparameters.

Reproduces the reference's autonomous hyperparameter heuristic
(`mpunet/image/auditor.py`): scan every train+val NIfTI header for shapes /
pixdims / real sizes / memory; infer `n_classes` by reading up to 50 label
volumes; choose

  * 2D `sample_dim`: nearest integer in [min_dim, max_dim] divisible by 2^4
    (so depth-4 pooling stays integral) to real_space_span / sample_res,
    shrinking the span when the chosen dim would under-resolve it
    (`auditor.py:199-209`),
  * `real_space_span`: 75th percentile of per-axis physical sizes,
  * 3D `real_box_span` = dim_3d * sample_res (25th-percentile resolution),

and push the values into the YAML config via `fill()` patterns."""

from __future__ import annotations

import numpy as np

from multiplanarunet_tpu.io import nifti
from multiplanarunet_tpu.logging import ScreenLogger
from multiplanarunet_tpu.ops.geometry import get_pix_dim, get_real_image_size


def audit_n_classes(label_paths, logger=None, max_files=50, rng=None):
    """Infer class count by uniting label values over <=50 random volumes."""
    logger = logger or ScreenLogger()
    logger("Auditing number of target classes (reads label data from disk; "
           "set n_classes in train_hparams.yaml to skip).")
    rng = rng or np.random
    paths = list(label_paths)
    if len(paths) > max_files:
        idx = rng.choice(len(paths), max_files, replace=False)
        paths = [paths[i] for i in idx]
    values = set()
    for p in paths:
        values.update(np.unique(nifti.load(p).get_raw_data()).tolist())
    classes = np.array(sorted(int(v) for v in values))
    if classes[0] != 0:
        raise ValueError(
            f"Class audit failed: classes must start at 0, found {classes}"
        )
    if len(classes) != classes[-1] + 1:
        raise ValueError(
            f"Class audit failed: classes must be contiguous from 0, "
            f"found {classes}"
        )
    return int(len(classes))


class Auditor:
    """Header audit + sampling-hyperparameter heuristic for a NIfTI dataset."""

    def __init__(self, nii_paths, nii_lab_paths=None, logger=None,
                 min_dim_2d=128, max_dim_2d=512, dim_3d=64,
                 span_percentile=75, res_percentile=25, hparams=None):
        self.nii_paths = list(nii_paths)
        self.nii_lab_paths = list(nii_lab_paths) if nii_lab_paths else None
        self.logger = logger or ScreenLogger()
        self.hparams = hparams

        self.info = self.audit()

        channels = np.asarray(self.info["n_channels"])
        if not np.all(channels == channels[0]):
            raise ValueError(
                f"Images have differing channel counts: {sorted(set(channels))}"
            )
        self.n_channels = int(channels[0])
        self.n_classes = self.info["n_classes"]

        real_space_span = float(
            np.percentile(self.info["real_sizes"], span_percentile)
        )
        sample_res = float(np.percentile(self.info["pixdims"], res_percentile))

        self.sample_dim_2D, self.real_space_span_2D = self.heuristic_sample_dim(
            real_space_span, sample_res, min_dim_2d, max_dim_2d
        )
        self.sample_dim_3D = int(dim_3d)
        self.real_space_span_3D = real_space_span
        self.real_box_span = dim_3d * sample_res

        self.total_memory_bytes = int(sum(self.info["memory_bytes"]))
        self.total_memory_gib = self.total_memory_bytes / 1024 ** 3

        # attribute -> ([group, ...], [key, ...]) destinations in the YAML file
        self.patterns = {
            "2d": {
                "real_space_span_2D": (["fit"], ["real_space_span"]),
                "sample_dim_2D": (["build"], ["dim"]),
                "n_channels": (["build"], ["n_channels"]),
                "n_classes": (["build"], ["n_classes"]),
            },
            "3d": {
                "real_space_span_3D": (["fit"], ["real_space_span"]),
                "sample_dim_3D": (["build"], ["dim"]),
                "real_box_span": (["fit"], ["real_box_dim"]),
                "n_channels": (["build"], ["n_channels"]),
                "n_classes": (["build"], ["n_classes"]),
            },
            "multi_task_2d": {
                "real_space_span_2D": (["task_specifics"], ["real_space_span"]),
                "sample_dim_2D": (["task_specifics"], ["dim"]),
                "n_channels": (["task_specifics"], ["n_channels"]),
                "n_classes": (["task_specifics"], ["n_classes"]),
            },
        }
        self.log()

    # ---------------------------------------------------------------- audit
    def audit(self):
        shapes, channels, real_sizes, pixdims, memory = [], [], [], [], []
        for path in self.nii_paths:
            img = nifti.load(path)  # header only
            shape = img.shape
            shapes.append(shape[:3])
            channels.append(shape[3] if len(shape) > 3 else 1)
            real_sizes.append(get_real_image_size(img))
            pixdims.append(get_pix_dim(img))
            memory.append(img.get_data_dtype().itemsize * int(np.prod(shape)))

        n_classes = None
        if self.nii_lab_paths is not None:
            if self.hparams is not None:
                n_classes = self.hparams.get_from_anywhere("n_classes")
            if n_classes is None:
                n_classes = audit_n_classes(self.nii_lab_paths, self.logger)

        return {
            "shapes": shapes,
            "real_sizes": real_sizes,
            "pixdims": pixdims,
            "memory_bytes": memory,
            "n_channels": channels,
            "n_classes": n_classes,
        }

    # ------------------------------------------------------------- heuristic
    @staticmethod
    def heuristic_sample_dim(real_space_span, res, min_dim, max_dim):
        """Pick the valid (16-divisible) pixel dim nearest span/res; if it
        under-resolves the span by >10%, shrink the span toward dim*res."""
        valid = np.array([d for d in range(min_dim, max_dim + 1) if d % 16 == 0])
        ideal = real_space_span / res
        dim = int(valid[np.abs(valid - ideal).argmin()])
        if dim < ideal * 0.90:
            preferred = dim * res
            real_space_span = max(int(real_space_span * 0.70), preferred)
        return dim, real_space_span

    # --------------------------------------------------------------- outputs
    def log(self):
        self.logger(f"\nAudit for {len(self.nii_paths)} images")
        self.logger(f"Total memory GiB:  {self.total_memory_gib:.3f}")
        if self.n_classes is not None:
            self.logger(f"Number of classes: {self.n_classes}")
        self.logger(
            f"\n2D:\nReal space span:   {self.real_space_span_2D:.3f}\n"
            f"Sample dim:        {self.sample_dim_2D:.3f}"
        )
        self.logger(
            f"\n3D:\nSample dim:        {self.sample_dim_3D}\n"
            f"Real space span:   {self.real_space_span_3D:.3f}\n"
            f"Box span:          {self.real_box_span:.3f}"
        )

    def fill(self, hparams, model_type):
        """Write audited values into the hparams object + YAML file. Values
        the user already set manually are left untouched (overwrite=False)."""
        pattern = self.patterns.get(model_type.lower())
        if pattern is None:
            raise ValueError(f"Unknown model type: '{model_type}'")
        for attr, (groups, names) in pattern.items():
            value = getattr(self, attr)
            for group, name in zip(groups, names):
                hparams.set_value(subdir=group, name=name, value=value)
        hparams.save_current()
