"""Persistent XLA compilation cache setup.

Compiles for the big fused inference graphs are expensive (minutes on
remote-compile transports); the persistent cache makes them one-time per
machine. Enabled by the CLI entry points and bench harness."""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = os.environ.get(
    "MPUNET_TPU_CACHE_DIR", str(Path.home() / ".cache" / "multiplanarunet_tpu_xla")
)


def enable_compilation_cache(cache_dir=None):
    import jax

    cache_dir = str(cache_dir or _DEFAULT)
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these flags
    return cache_dir
