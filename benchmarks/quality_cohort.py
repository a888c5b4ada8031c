"""N>=20 heterogeneous quality cohort: gather vs shear vs u8-staged shear.

Round-2 VERDICT item 8: the resampler-acceptance evidence was toy-64^3 at
N=4 (inside noise). This driver builds a 20-subject test cohort that is
heterogeneous in shape (--vary_size), multi-channel and anisotropic at the
128-class scale, trains a model on matching training data, then predicts
the SAME test set with
  * the exact gather resampler,
  * the shear-decomposed resampler (production default via 'auto'),
  * the shear resampler with uint8-quantized H2D staging (--stage_dtype u8)
and reports fused-Dice mean +/- sd per mode plus PAIRED per-image deltas
with a bootstrap 95% CI — the statistic that bounds the resampler /
staging quality cost.

Usage: python benchmarks/quality_cohort.py [workdir] [--skip_train]
           [--n_test N] [--image_size S]
The project is left on disk so re-runs with --skip_train only re-predict.
Round-5 standing config (VERDICT r4 item 9): --n_test 40 --image_size 192
— the MSD Hippocampus/Liver-class workloads named in BASELINE.md are not
obtainable in this environment (zero egress), so this heterogeneous
40-subject 192^3 2-channel anisotropic cohort is the pinned quality
proxy (VALIDATION 36).
"""
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

MP = [sys.executable, "-m", "multiplanarunet_tpu.bin.mp"]


def run(args, **kw):
    print("+", " ".join(str(a) for a in args), flush=True)
    t0 = time.time()
    subprocess.run([str(a) for a in args], check=True, **kw)
    print(f"  ({time.time() - t0:.0f} s)", flush=True)


def fused_dice(pred_dir):
    import pandas as pd

    df = pd.read_csv(Path(pred_dir) / "csv" / "results.csv", index_col=0)
    return df["MJ"].dropna().astype(float)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    work = Path(args[0] if args else "/tmp/quality_cohort")
    skip_train = "--skip_train" in sys.argv

    def opt(name, default):
        return (sys.argv[sys.argv.index(name) + 1]
                if name in sys.argv else default)

    n_test = int(opt("--n_test", 20))
    image_size = int(opt("--image_size", 128))
    work.mkdir(parents=True, exist_ok=True)
    data = work / "data"
    proj = work / "proj"

    if not skip_train:
        run(MP + ["toy_data", "--out_dir", data, "--N_train", 12, "--N_val",
                  3, "--N_test", n_test, "--image_size", image_size,
                  "--N_channels", 2,
                  "--pixdim", "1,0.8,1.3", "--vary_size", "--seed", 7])
        run(MP + ["init_project", "--name", "proj", "--root", work,
                  "--data_dir", data, "--overwrite"])
        # cf=1 keeps training quick; quality deltas between resamplers are
        # independent of model capacity
        hp = proj / "train_hparams.yaml"
        hp.write_text(hp.read_text().replace("complexity_factor: 2",
                                             "complexity_factor: 1"))
        run(MP + ["train", "--project_dir", proj, "--overwrite",
                  "--no_images", "--epochs", 25, "--train_images_per_epoch",
                  400, "--val_images_per_epoch", 100])
        run(MP + ["train_fusion", "--project_dir", proj, "--overwrite",
                  "--images_per_round", 3, "--min_val_images", 3,
                  "--epochs", 8])

    modes = [
        ("gather", ["--resampler", "gather"]),
        ("shear", ["--resampler", "shear"]),
        ("shear_u8", ["--resampler", "shear", "--stage_dtype", "u8"]),
    ]
    series = {}
    for name, extra in modes:
        out = f"pred_{name}"
        run(MP + ["predict", "--project_dir", proj, "--out_dir", out,
                  "--overwrite"] + extra)
        series[name] = fused_dice(proj / out)
        print(f"{name}: N={len(series[name])} fused dice "
              f"{series[name].mean():.4f} +/- {series[name].std():.4f}",
              flush=True)

    rng = np.random.RandomState(0)
    g = series["gather"]
    for name in ("shear", "shear_u8"):
        d = (series[name] - g).dropna().values
        boots = [rng.choice(d, len(d)).mean() for _ in range(10000)]
        lo, hi = np.percentile(boots, [2.5, 97.5])
        print(f"paired delta {name} - gather: mean {d.mean():+.5f} "
              f"(95% CI [{lo:+.5f}, {hi:+.5f}], N={len(d)})", flush=True)
    d = (series["shear_u8"] - series["shear"]).dropna().values
    boots = [rng.choice(d, len(d)).mean() for _ in range(10000)]
    lo, hi = np.percentile(boots, [2.5, 97.5])
    print(f"paired delta shear_u8 - shear: mean {d.mean():+.5f} "
          f"(95% CI [{lo:+.5f}, {hi:+.5f}], N={len(d)})", flush=True)


if __name__ == "__main__":
    main()
