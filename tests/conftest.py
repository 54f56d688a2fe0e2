"""Test configuration: force an 8-device CPU mesh so tests are deterministic
and sharding tests run without TPU hardware (the reference has no tests at
all — SURVEY.md §4; jax's host-device simulation is our 'fake backend').

Note: the environment may preset JAX_PLATFORMS (e.g. to the TPU plugin), so
this must overwrite, not setdefault — on TPU, float32 matmuls default to
bfloat16 multiplies and golden-math tests would see 1e-3-level error.
"""

import os

# VRT_TPU_SMOKE=1 keeps the real backend so tests/test_tpu_smoke.py can
# exercise the Pallas kernels on hardware.  Run ONLY that file with the
# flag — the golden/oracle tests need the CPU platform and x64 (on TPU,
# f32 matmuls default to one bf16 pass and they fail at 1e-3 level).
if os.environ.get("VRT_TPU_SMOKE") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("VRT_TPU_SMOKE") != "1":
    # float64 oracles; TPUs have no f64, so the smoke run leaves this off
    jax.config.update("jax_enable_x64", True)
