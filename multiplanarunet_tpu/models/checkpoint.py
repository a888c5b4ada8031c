"""Checkpoint IO: flat .npz weight files with by-name partial loading.

Replaces the reference's Keras h5 weight files (same lifecycle: best-model
files named `@epoch_{epoch:02d}_val_dice_{val:.5f}.npz` with
delete-previous-best semantics via `ModelCheckPointClean`, a final
`model_weights.npz` on exit, by-name weight restoration for transfer /
continue-training — `mpunet/models/model_init.py:23-58`).

Format: numpy .npz where each entry key is "params/<module>/<leaf>" or
"batch_stats/<module>/<leaf>". Loading restores by key intersection
("by_name=True" semantics), reporting missing/unexpected keys."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
from flax import traverse_util


def _flatten(tree, prefix):
    flat = traverse_util.flatten_dict(tree, sep="/")
    return {f"{prefix}/{k}": np.asarray(v) for k, v in flat.items()}


def _unflatten(entries):
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in entries.items()}
    )


def save_weights(path, params, batch_stats=None, meta=None):
    """Write params (+ batch stats, + json metadata) to a single .npz file."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    entries = _flatten(params, "params")
    if batch_stats:
        entries.update(_flatten(batch_stats, "batch_stats"))
    if meta is not None:
        entries["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
    np.savez(path, **entries)


def load_weights(path):
    """Read a weight file -> (params, batch_stats, meta)."""
    path = Path(path)
    with np.load(path, allow_pickle=False) as data:
        entries = {k: data[k] for k in data.files}
    meta = None
    if "__meta__" in entries:
        meta = json.loads(entries.pop("__meta__").tobytes().decode())
    params = _unflatten(
        {k[len("params/"):]: v for k, v in entries.items()
         if k.startswith("params/")}
    )
    batch_stats = _unflatten(
        {k[len("batch_stats/"):]: v for k, v in entries.items()
         if k.startswith("batch_stats/")}
    )
    return params, batch_stats, meta


def restore_by_name(current, loaded, logger=None):
    """Overlay `loaded` onto `current` wherever names AND shapes match.

    Mirrors Keras `load_weights(by_name=True)` used for transfer init and
    continue-training. Returns (merged_tree, n_restored)."""
    cur_flat = traverse_util.flatten_dict(current, sep="/")
    new_flat = traverse_util.flatten_dict(loaded, sep="/") if loaded else {}
    restored = 0
    for k, v in new_flat.items():
        if k in cur_flat and tuple(cur_flat[k].shape) == tuple(v.shape):
            cur_flat[k] = v
            restored += 1
        elif logger is not None:
            logger.warn(f"Checkpoint key '{k}' not restored "
                        f"(missing or shape mismatch)")
    return (
        traverse_util.unflatten_dict({tuple(k.split("/")): v
                                      for k, v in cur_flat.items()}),
        restored,
    )
