"""Per-image / per-view / per-class evaluation result tables.

Parity surface: `mpunet/logging/log_results.py` — a results DataFrame of
image x (views + fused "MJ") mean dice, per-view per-class frames, csv + txt
writers under <out_dir>/{csv,txt}, and `--continue` reloading that matches
view float strings back to their csv files."""

from __future__ import annotations

import copy
import os
import re
from glob import glob

import numpy as np
import pandas as pd

from multiplanarunet_tpu.utils.utils import create_folders

_FLOAT_RE = re.compile(r"[-]?\d\.\d+")


def init_result_dicts(views, all_images, n_classes):
    """(results df indexed by image id, {view/MJ: per-class df})."""
    if n_classes == 1:
        n_classes = 2
    results = {"identifier": sorted(all_images)}
    results.update({str(v): [np.nan] * len(all_images) for v in views})
    results["MJ"] = [np.nan] * len(all_images)
    results = pd.DataFrame(results).set_index("identifier")

    inner = {"class": list(range(1, n_classes))}
    inner.update({im: [np.nan] * (n_classes - 1) for im in all_images})
    keys = [str(v) for v in views] + ["MJ"]
    pc_results = {
        k: pd.DataFrame(copy.deepcopy(inner)).set_index("class") for k in keys
    }
    return results, pc_results


def init_result_dict_3D(all_images, n_classes):
    if n_classes == 1:
        n_classes = 2
    detailed = {"class": list(range(1, n_classes))}
    detailed.update({im: [np.nan] * (n_classes - 1) for im in all_images})
    return {im: [np.nan] for im in all_images}, detailed


def load_result_dicts(csv_dir, views):
    """Reload result tables from a previous run (`mp predict --continue`)."""
    csv_dir = os.path.abspath(csv_dir)
    results = pd.read_csv(os.path.join(csv_dir, "results.csv"), index_col=0)
    pc_results = {
        "MJ": pd.read_csv(os.path.join(csv_dir, "MJ.csv"), index_col=0)
    }
    paths = glob(os.path.join(csv_dir, "*csv"))
    for v in views:
        v = np.asarray(v, np.float64)
        matched = False
        for path in paths:
            stem = os.path.splitext(os.path.basename(path))[0]
            comps = np.array(_FLOAT_RE.findall(stem), np.float64)
            if len(comps) == 3 and np.all(comps.round(4) == v.round(4)):
                pc_results[str(v)] = pd.read_csv(path, index_col=0)
                matched = True
                break
        if not matched:
            raise RuntimeError(
                f"Could not match view {v} to any csv in {csv_dir}"
            )
    return results, pc_results


def to_df(results, transpose=False):
    df = results if isinstance(results, pd.DataFrame) else pd.DataFrame(results)
    if not isinstance(results, pd.DataFrame) and "class" in results:
        df = df.set_index("class")
    return df.transpose() if transpose else df


def results_to_csv(results, res_path, fname="results", transpose=False):
    df = to_df(results, transpose)
    with open(os.path.join(res_path, f"{fname}.csv"), "w") as f:
        f.write(df.to_csv(index=True) + "\n")


def results_to_txt(results, res_path, fname="results", transpose=False):
    df = to_df(results, transpose)
    with open(os.path.join(res_path, f"{fname}.txt"), "w") as f:
        f.write(df.to_string() + "\n")


def _view_fname(view):
    return str(view).replace("[", "").strip().replace("]", "").replace(" ", "_")


def save_all(results, pc_results, out_dir):
    txt_dir = os.path.join(out_dir, "txt")
    csv_dir = os.path.join(out_dir, "csv")
    create_folders([txt_dir, csv_dir])
    results_to_txt(results, txt_dir)
    results_to_csv(results, csv_dir)
    for view, frame in pc_results.items():
        results_to_txt(frame, txt_dir, fname=_view_fname(view))
        results_to_csv(frame, csv_dir, fname=_view_fname(view))


def save_all_3D(results, detailed_res, out_dir):
    txt_dir = os.path.join(out_dir, "txt")
    csv_dir = os.path.join(out_dir, "csv")
    create_folders([txt_dir, csv_dir])
    results_to_txt(results, txt_dir, transpose=True)
    results_to_csv(results, csv_dir, transpose=True)
    results_to_txt(detailed_res, txt_dir, fname="detailed")
    results_to_csv(detailed_res, csv_dir, fname="detailed")
