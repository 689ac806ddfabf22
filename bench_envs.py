"""Per-env single-chip stepping throughput: {env x batch -> env-steps/s}.

Extends bench.py's flagship HalfCheetah measurement to Hopper/Ant/Humanoid at
tile-2D-eligible batch sizes (>= 256, multiples of 128 — physics/lanes.py
substeps_batched), with the same fetch-validated measurement discipline
(every timed window ends with a jax.device_get of a scalar that data-depends
on the work; reps chained through the env state; step counters checked).

This is the per-env hot path the reference pays serially per env
(libs/gymcpp/mujoco/mujoco_env.h:97-108, one mj_step chain per env thread);
here every row is the whole lockstep batch on one chip.

Usage:
  python bench_envs.py                 # default sweep, one JSON line per row
  python bench_envs.py --env Humanoid-v4 --batch 512 --steps 30
"""

import argparse
import json
import os
import statistics
import sys
import time


DEFAULT_SWEEP = [
    # (env_id, num_envs, scan_steps) — batch sizes where each env's schedule
    # is HBM/compute-bound rather than RTT-bound; Humanoid (nv=23, RK4,
    # ~569 efc rows) gets smaller batches
    ("HalfCheetah-v5", 4096, 50),
    ("Hopper-v5", 4096, 50),
    ("Ant-v5", 2048, 50),
    ("Humanoid-v4", 256, 30),
    ("Humanoid-v4", 512, 30),
    ("Humanoid-v4", 1024, 30),
]


def _fetch(x) -> float:
    """Only trustworthy sync on the tunneled runtime (see bench.py)."""
    import jax

    return float(jax.device_get(x))


def measure(env_id: str, num_envs: int, steps: int, solver_iterations: int = 4,
            warmup: int = 2, reps: int = 3, topk: int | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from ppo_tpu.envs import make_env
    from ppo_tpu.models import GaussianActorCritic

    env = make_env(env_id, dtype=jnp.float32, solver_iterations=solver_iterations,
                   contact_topk=topk)
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
            state, obs, reward, term, trunc = env.step_batch(state, action, consts)
            return (state, obs, key), jnp.sum(reward)

        (state, obs, key), rs = jax.lax.scan(body, (state, obs, key), None, length=steps)
        return state, obs, key, jnp.sum(rs)

    key = jax.random.PRNGKey(2)
    for _ in range(warmup):
        state, obs, key, rsum = loop(params, state, obs, key, consts)
    _fetch(rsum)  # drain compile + warmup queue
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, obs, key, rsum = loop(params, state, obs, key, consts)
        _fetch(rsum)
        times.append(time.perf_counter() - t0)
    t_actual = int(_fetch(state.t[0]))
    # autoreset clamps each env's t to its episode; with <=1000-step episodes
    # and short scans the counter equals total steps unless a reset happened,
    # so only assert a lower bound after the first possible termination
    assert t_actual > 0, "no steps executed"
    dt = statistics.median(times)
    return {
        "env": env_id,
        "num_envs": num_envs,
        "scan_steps": steps,
        "env_steps_per_s": round(num_envs * steps / dt),
        "ms_per_vector_step": round(dt / steps * 1e3, 3),
        "contact_topk": env.ctx.topk,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="")
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--solver_iterations", type=int, default=4)
    ap.add_argument("--topk", type=int, default=-1,
                    help="-1 per-model default, 0 full slot table, >0 explicit k")
    args = ap.parse_args(argv)
    if args.env:
        rows = [(args.env, args.batch or 1024, args.steps)]
    else:
        rows = DEFAULT_SWEEP
    for env_id, batch, steps in rows:
        try:
            row = measure(env_id, batch, steps, args.solver_iterations,
                          topk=None if args.topk < 0 else args.topk)
        except Exception as e:  # keep sweeping; a row failure is a result too
            row = {"env": env_id, "num_envs": batch, "error": repr(e)[:200]}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
