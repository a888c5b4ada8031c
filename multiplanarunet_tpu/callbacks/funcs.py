"""Callback registry: YAML config dicts -> callback objects.

Parity surface: `mpunet/callbacks/funcs.py` — each config entry is
{class_name, kwargs, nickname?, pass_logger?, start_from?}; classes resolve
from this package's callback modules; `start_from` wraps in DelayedCallback;
`remove_validation_callbacks` drops any callback whose kwargs reference
validation data when running with --no_val."""

from __future__ import annotations

from multiplanarunet_tpu.callbacks import callbacks as cb_mod
from multiplanarunet_tpu.callbacks import validation as val_mod


def _resolve(class_name):
    for mod in (cb_mod, val_mod):
        cls = getattr(mod, class_name, None)
        if cls is not None:
            return cls
    raise ValueError(f"Unknown callback class '{class_name}'")


def init_callback_objects(callbacks, logger=None):
    """Instantiate a list of callbacks from config dicts (already-instantiated
    callbacks pass through). Returns (objects, {nickname: obj})."""
    initialized = []
    by_name = {}
    for spec in callbacks or []:
        if isinstance(spec, cb_mod.Callback):
            initialized.append(spec)
            continue
        spec = dict(spec)
        cls = _resolve(spec["class_name"])
        kwargs = dict(spec.get("kwargs", {}))
        if spec.get("pass_logger"):
            kwargs["logger"] = logger
        obj = cls(**kwargs)
        start_from = spec.get("start_from", 0)
        if start_from:
            obj = cb_mod.DelayedCallback(obj, start_from=start_from)
        nickname = spec.get("nickname")
        if nickname:
            by_name[nickname] = obj
        if logger:
            logger(f"Callback: {spec['class_name']}({kwargs})")
        initialized.append(obj)
    return initialized, by_name


def remove_validation_callbacks(callbacks, logger=None):
    """Drop callbacks that monitor or consume validation data (--no_val)."""
    kept = []
    for spec in callbacks or []:
        if isinstance(spec, dict):
            text = str(spec.get("kwargs", {}))
            if "val" in text:
                if logger:
                    logger(f"[OBS] Removing callback "
                           f"{spec.get('class_name')} (validation-dependent)")
                continue
        kept.append(spec)
    return kept
