"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Env vars must be set before jax initializes its backends. Physics-fidelity tests
need float64 (MuJoCo computes in double); RL-op tests pass explicit float32 inputs
so they still exercise the TPU dtype path.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
