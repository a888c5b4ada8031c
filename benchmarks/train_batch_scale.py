"""Batch-scaled training A/B: throughput vs quality (VERDICT r2 item 3).

The training-step probe (train_profile_probe.py) showed the jitted step's
MXU utilization rising with batch (17% at 16 -> 33% at 64) while the
pipelined sampler hides most of the host work; what that probe cannot show
is whether a larger batch TRAINS AS WELL. This driver runs the 30-epoch
toy training (VALIDATION section 9 setup: 3 views, cf=1) twice on the same
data —

  A: reference defaults   batch 16, Adam lr 5e-5
  B: batch-scaled         batch 64, Adam lr 1e-4 (sqrt-scaling for Adam)

— with the SAME number of sampled images per epoch, so both see identical
total training data and the comparison isolates batch size. Reports
per-epoch wall time, training images/s, best val dice, and sum-fused test
dice from `mp predict`.

Usage: python benchmarks/train_batch_scale.py [workdir]
"""
import re
import subprocess
import sys

sys.path.insert(0, ".")
import time
from pathlib import Path

MP = [sys.executable, "-m", "multiplanarunet_tpu.bin.mp"]


def run(args, **kw):
    print("+", " ".join(str(a) for a in args), flush=True)
    t0 = time.time()
    subprocess.run([str(a) for a in args], check=True, **kw)
    dt = time.time() - t0
    print(f"  ({dt:.0f} s)", flush=True)
    return dt


def fused_dice(pred_dir):
    import pandas as pd

    df = pd.read_csv(Path(pred_dir) / "csv" / "results.csv", index_col=0)
    return df["MJ"].dropna().astype(float)


def best_val_dice(proj):
    import pandas as pd

    df = pd.read_csv(Path(proj) / "logs" / "training.csv")
    return float(df["val_dice"].max()), df["epoch_minutes"].iloc[2:].mean()


def main():
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/batch_scale")
    work.mkdir(parents=True, exist_ok=True)
    data = work / "data"
    if not (data / "train").exists():
        run(MP + ["toy_data", "--out_dir", data, "--N_train", 10, "--N_val",
                  4, "--N_test", 4, "--image_size", 64, "--seed", 7])

    variants = [("b16", 16, "5.0e-05"), ("b64", 64, "1.0e-04")]
    report = {}
    for name, batch, lr in variants:
        proj = work / f"proj_{name}"
        run(MP + ["init_project", "--name", f"proj_{name}", "--root", work,
                  "--data_dir", data, "--overwrite"])
        hp = proj / "train_hparams.yaml"
        text = hp.read_text()
        text = text.replace("views: 6", "views: 3")
        text = text.replace("complexity_factor: 2", "complexity_factor: 1")
        text = text.replace("batch_size: 16", f"batch_size: {batch}")
        text = re.sub(r"lr: \S+,", f"lr: {lr},", text)
        hp.write_text(text)
        t_train = run(MP + ["train", "--project_dir", proj, "--overwrite",
                            "--no_images", "--epochs", 30,
                            "--train_images_per_epoch", 1600,
                            "--val_images_per_epoch", 256])
        run(MP + ["predict", "--project_dir", proj, "--out_dir",
                  "predictions", "--overwrite", "--sum_fusion"])
        bd, epoch_min = best_val_dice(proj)
        fd = fused_dice(proj / "predictions")
        report[name] = dict(batch=batch, lr=lr, train_s=t_train,
                            epoch_s=epoch_min * 60,
                            img_per_s=1600 / (epoch_min * 60),
                            best_val_dice=bd, fused=fd)

    print("\n=== batch-scale A/B ===", flush=True)
    for name, r in report.items():
        print(f"{name}: batch {r['batch']} lr {r['lr']}  "
              f"epoch {r['epoch_s']:.2f} s ({r['img_per_s']:.0f} img/s)  "
              f"best val dice {r['best_val_dice']:.4f}  "
              f"test fused {r['fused'].mean():.4f} +/- {r['fused'].std():.4f}",
              flush=True)


if __name__ == "__main__":
    main()
