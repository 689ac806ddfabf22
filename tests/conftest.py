"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

jax may already be imported by pytest plugins (jaxtyping) before this conftest
runs, and jax bakes JAX_PLATFORMS into its config at import time — so we must
use jax.config.update, not os.environ. The XLA flag for virtual host devices is
read lazily at first backend init, so the env var is still effective here.
Physics-fidelity tests need float64 (MuJoCo computes in double); RL-op tests
pass explicit float32 inputs so they still exercise the TPU dtype path.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the fast tier is compile-dominated on a
# 2-core host (fresh CPU compiles of physics programs), so warm re-runs get
# most of their time back. The cache dir is gitignored; the first run on a
# fresh host seeds it.
if not os.environ.get("PPO_TPU_NO_TEST_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
