"""Test configuration: force a virtual 8-device CPU mesh so sharding tests run
fast and without TPU hardware.

Note: the environment's TPU plugin (axon) force-selects its platform via
``jax.config.update("jax_platforms", ...)`` at interpreter startup, so setting
the JAX_PLATFORMS env var is not enough — we must override the config value
before any backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert all(d.platform == "cpu" for d in jax.devices()), jax.devices()
