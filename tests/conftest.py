"""Test environment: force CPU with 8 virtual devices so sharding tests run
anywhere (SURVEY.md §4 — multi-host tests via xla_force_host_platform_device_count).

Note: this image's sitecustomize force-registers the axon TPU backend and
overrides the JAX_PLATFORMS env var, so we must select CPU via
``jax.config.update`` *after* importing jax.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
