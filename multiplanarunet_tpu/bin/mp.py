"""`mp` CLI dispatcher.

Parity surface: `mpunet/bin/mp.py` — discovers every script module in
`multiplanarunet_tpu.bin` and forwards the remaining argv to its
`entry_func`. Usage: ``mp <script> [script args...]``."""

from __future__ import annotations

import argparse
import importlib
import pkgutil
import sys

import multiplanarunet_tpu.bin


def get_scripts():
    return sorted(
        m.name for m in pkgutil.iter_modules(multiplanarunet_tpu.bin.__path__)
        if m.name not in ("mp", "defaults") and not m.ispkg
    )


def get_parser():
    scripts = get_scripts()
    usage = ("mp <script> [script args...]\n\n"
             "Available scripts:\n  " + "\n  ".join(scripts))
    parser = argparse.ArgumentParser(prog="mp", usage=usage)
    parser.add_argument("script", choices=scripts, help="script to run")
    parser.add_argument("args", nargs=argparse.REMAINDER)
    return parser


def entry_func(args=None):
    import os

    from multiplanarunet_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    # `MP_PLATFORM=cpu mp train ...` forces a JAX platform before any
    # backend initialization. Needed because an installed TPU plugin may
    # pin the platform via jax.config at interpreter start (where the
    # JAX_PLATFORMS env var alone is ignored) — e.g. to run the CLI on
    # CPU when the TPU is unavailable.
    platform = os.environ.get("MP_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    enable_compilation_cache()
    parsed = get_parser().parse_args(args)
    module = importlib.import_module(
        f"multiplanarunet_tpu.bin.{parsed.script}"
    )
    return module.entry_func(parsed.args)


if __name__ == "__main__":
    entry_func(sys.argv[1:])
