"""Test configuration: force an 8-device CPU mesh so sharding tests run
without TPU hardware (the reference has no tests at all — SURVEY.md §4; we
use jax's host-device simulation as the 'fake backend')."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
