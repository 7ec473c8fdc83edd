"""Test configuration: force JAX onto CPU with 8 virtual devices.

Multi-chip TPU hardware is unavailable in CI; sharding tests run on a
virtual 8-device CPU mesh per JAX's standard recipe. The axon sitecustomize
registers a TPU backend and overrides JAX_PLATFORMS, so we must both set the
XLA flag before importing jax AND force the platform via jax.config after.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
