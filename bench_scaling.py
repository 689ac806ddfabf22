"""Data-parallel scaling harness: env-steps/s of the FULL training iteration
per device-mesh size (the measured 1-chip / 1-host / N-host scaling artifact
from BASELINE.json).

On a multi-chip TPU slice this sweeps real mesh sizes; on a single chip it
reports that point; under XLA_FLAGS=--xla_force_host_platform_device_count=8
(CPU) it demonstrates the scaling path functionally.

Prints one JSON line per mesh size:
  {"devices": n, "env_steps_per_s": v, "iter_ms": t}
"""

import json
import statistics
import sys
import time

import jax

if "--cpu" in sys.argv:
    # JAX_PLATFORMS env is overridden by the accelerator plugin on this image;
    # the config update is the only reliable platform switch (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def bench_mesh(n_devices: int, num_envs: int = 512, num_steps: int = 16, reps: int = 3):
    from ppo_tpu.algos import ppo
    from ppo_tpu.config import PPOConfig
    from ppo_tpu.envs import VectorEnv, make_env
    from ppo_tpu.models import GaussianActorCritic
    from ppo_tpu.parallel import (
        init_distributed_runner_state,
        make_distributed_train_iteration,
        make_mesh,
    )

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    cfg = PPOConfig(
        env_id="HalfCheetah-v5", num_envs=num_envs, num_steps=num_steps,
        num_minibatches=4, update_epochs=2, total_timesteps=10**9,
        solver_iterations=4,
    )
    mesh = make_mesh(n_devices)
    env = make_env(cfg.env_id, dtype=jnp.float32, solver_iterations=cfg.solver_iterations)
    venv_g = VectorEnv(env, cfg.num_envs, normalize_obs=True, normalize_reward=True)
    venv_l = VectorEnv(env, cfg.num_envs // n_devices, normalize_obs=True, normalize_reward=True)
    model = GaussianActorCritic(act_dim=env.act_dim)
    optimizer = ppo.make_optimizer(cfg)
    rs, specs = init_distributed_runner_state(
        cfg, venv_g, model, optimizer, jax.random.PRNGKey(0), mesh
    )
    run = jax.jit(lambda r: make_distributed_train_iteration(cfg, venv_l, model, optimizer, mesh)(r, specs),
                  donate_argnums=(0,))
    # measurement discipline (see bench.py docstring): on this runtime
    # block_until_ready returns before remote execution finishes; every timed
    # window must end with a device_get of a scalar that data-depends on the
    # work, and reps are chained through the runner state so they can't overlap
    rs, out = run(rs)
    float(jax.device_get(out.mean_reward))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        rs, out = run(rs)
        float(jax.device_get(out.mean_reward))
        times.append(time.perf_counter() - t0)
    it_done = int(jax.device_get(jax.tree.leaves(rs.iteration)[0]).ravel()[0])
    assert it_done == reps + 1, f"executed {it_done} iterations != {reps + 1}"
    dt = statistics.median(times)
    return {
        "devices": n_devices,
        "env_steps_per_s": round(cfg.num_envs * cfg.num_steps / dt),
        "iter_ms": round(dt * 1e3, 2),
    }


if __name__ == "__main__":
    n = len(jax.devices())
    sizes = [s for s in (1, 2, 4, 8) if s <= n] or [1]
    # real accelerator: large-batch config so the ~26 ms per-call RTT of the
    # tunneled runtime is amortized (131k env-steps per iteration call; the
    # round-4 phase attribution showed collection dominates and the update is
    # ~13 ms, so the flagship batch closes the stepping->training gap: 976k
    # full-iteration env-steps/s vs 1.10M pure stepping);
    # CPU/virtual-mesh: small functional-demo config
    kw = {} if jax.default_backend() == "cpu" else {"num_envs": 4096, "num_steps": 32}
    for s in sizes:
        print(json.dumps(bench_mesh(s, **kw)))
