"""Throughput benchmark: HalfCheetah-v5 massively vectorized lockstep env steps.

Runs the flagship config from BASELINE.json ("HalfCheetah-v5 massively
vectorized: 4096 lockstep envs on one chip") on whatever backend is available
(the real TPU chip under the driver; CPU elsewhere) and prints ONE json line:

  {"metric": "env_steps_per_s", "value": N, "unit": "steps/s", "vs_baseline": r}

vs_baseline is value / 1e6 — the fraction of the >1M aggregate env-steps/s
multi-host target from BASELINE.json (the reference itself publishes no
numbers, README.md:82).

Validity: timing uses block_until_ready over chained calls (each rep's state
feeds the next), and AFTER the timed section the final state is fetched and
checked (episode step counters advanced exactly, rewards finite) so the
reported number corresponds to real executed physics. Data fetches happen only
after timing — on the tunneled TPU runtime used here, mixing host fetches into
the timed loop can flip the device into a degraded dispatch mode.
"""

import json
import statistics
import time

import jax
import jax.numpy as jnp


def bench(num_envs=4096, steps=50, solver_iterations=8, warmup=2, reps=3):
    import numpy as np

    from ppo_tpu.envs import make_env
    from ppo_tpu.models import GaussianActorCritic

    env = make_env("HalfCheetah-v5", dtype=jnp.float32, solver_iterations=solver_iterations)
    model = GaussianActorCritic(act_dim=env.act_dim)
    params = model.init_params(jax.random.PRNGKey(1), env.obs_dim)
    consts = env.consts  # device-resident model arrays, passed as arguments

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
    # compile + warmup (no host fetches)
    for _ in range(warmup):
        state, obs, key, rsum = jax.block_until_ready(loop(params, state, obs, key, consts))

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, obs, key, rsum = jax.block_until_ready(loop(params, state, obs, key, consts))
        times.append(time.perf_counter() - t0)

    # validity check AFTER timing: the step counters must have advanced by
    # exactly (warmup + reps) * steps (no episode ends: cheetah never
    # terminates and 1000-step truncation is not reached)
    t_expect = (warmup + reps) * steps
    t_actual = int(jax.device_get(state.t[0]))
    r = float(jax.device_get(rsum))
    assert t_actual == t_expect, f"executed steps {t_actual} != {t_expect}"
    assert np.isfinite(r), "non-finite rewards"

    dt = statistics.median(times)
    return num_envs * steps / dt


if __name__ == "__main__":
    sps = bench()
    print(json.dumps({
        "metric": "env_steps_per_s",
        "value": round(sps),
        "unit": "steps/s",
        "vs_baseline": round(sps / 1_000_000, 4),
    }))
