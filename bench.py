"""Throughput benchmark: HalfCheetah-v5 massively vectorized lockstep env steps.

Runs the flagship config from BASELINE.json ("HalfCheetah-v5 massively
vectorized: 4096 lockstep envs on one chip") and prints ONE json line:

  {"metric": "env_steps_per_s", "value": N, "unit": "steps/s", "vs_baseline": r}

vs_baseline is value / 1e6 — the fraction of the >1M aggregate env-steps/s
multi-host target from BASELINE.json (the reference publishes no numbers,
README.md:82).

MEASUREMENT VALIDITY (hard-learned): on the tunneled TPU runtime used here,
`jax.block_until_ready` returns BEFORE remote execution finishes (measured: a
chain of 4096^3 matmuls "timed" at >10,000 TFLOP/s that way). Every timed
window in this file therefore ends with `jax.device_get` of a scalar that
data-depends on the computation — the only fetch that provably waits for the
work. Calls are chained (each rep's input depends on the previous rep's
output) so reps cannot overlap, and the env state's step counters are checked
afterwards so the reported number corresponds to real executed physics.

Two stages: a quick single-vector-step measurement that always produces a
number, then the full 50-step scan loop in a subprocess with a hard timeout
(amortizes the ~26 ms per-call RTT of the tunneled runtime over 50 steps).
The larger valid measurement wins. Total wall time is capped (see
bench(deadline_s=...): ~few minutes healthy, <=~45 min worst case with a sick
runtime). See docs/PERF.md "Single-chip throughput" for the honest numbers,
the profiler breakdown, and the correction of an earlier physically-impossible
measurement.
"""

import json
import os
import statistics
import subprocess
import sys
import time


def _fetch(x) -> float:
    """The only trustworthy sync point on this runtime (see module docstring)."""
    import jax

    return float(jax.device_get(x))


def _setup_cache():
    """Persistent XLA compilation cache: the lane-major physics program takes
    ~3.5 min to compile cold; the cache makes every later bench/train run
    skip it."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def _quick(num_envs=4096, solver_iterations=4, reps=10):
    _setup_cache()
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
        state, obs, reward, term, trunc = env.step_batch(state, action, consts)
        return state, obs, key, jnp.sum(reward)

    key = jax.random.PRNGKey(2)
    state, obs, key, rsum = one(params, state, obs, key, consts)
    _fetch(rsum)  # warmup + queue drain
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, obs, key, rsum = one(params, state, obs, key, consts)
        _fetch(rsum)  # blocks until THIS rep's work is done
        times.append(time.perf_counter() - t0)
    t_actual = int(_fetch(state.t[0]))
    assert t_actual == reps + 1, f"executed {t_actual} != {reps + 1}"
    return num_envs / statistics.median(times)


def _full(num_envs=4096, steps=50, solver_iterations=4, warmup=2, reps=3):
    _setup_cache()
    import jax
    import jax.numpy as jnp

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
    assert t_actual == (warmup + reps) * steps, f"executed {t_actual}"
    return num_envs * steps / statistics.median(times)


def _stage_subprocess(flag, timeout):
    """Run a measurement stage in a subprocess with a hard timeout.

    BOTH stages run out-of-process: the tunneled runtime has a failure mode
    after long idle where device calls block indefinitely (even an 8-element
    reduction — observed 2026-08-20), so an in-process stage could hang the
    whole bench and leave the driver with no number at all.
    """
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag],
            capture_output=True, text=True, timeout=timeout,
        )
        for line in out.stdout.strip().splitlines()[::-1]:
            try:
                return float(line)
            except ValueError:
                continue
    except (subprocess.TimeoutExpired, OSError):
        pass
    return 0.0


# Below BOTH healthy stages (quick is RTT-bound at ~130k steps/s — one ~26 ms
# call round-trip per vectorized step; full amortizes the RTT over a 50-step
# scan and reaches ~1.1M, docs/PERF.md) but far above the runtime's documented
# degraded mode (~1000x slow): a result under this threshold means the RUNTIME
# was sick, not the engine, so it is worth letting the device idle and
# re-measuring.
DEGRADED_SPS = 100_000


def bench(quick_timeout=600, full_timeout=900, idle_retries=2, idle_s=240,
          deadline_s=1800):
    """Best valid measurement across stages, with bounded retry-after-idle.

    The tunneled TPU runtime has two sick modes (docs/PERF.md): a degraded
    mode that slows in-program execution ~1000x, and a post-idle mode where
    device calls hang outright. Both are device-side and recover after the
    device sits idle, so on a bad measurement we sleep and retry in fresh
    subprocesses, a bounded number of times. Every retained number still
    passes the execution-validity checks in _quick/_full.

    Total wall time is capped by `deadline_s` (default 30 min): no new stage
    or idle sleep starts past the deadline, so an external driver gets its
    best-so-far number (possibly 0.0 in the fully-sick-runtime case) within
    deadline_s + the in-flight stage's own timeout — worst case ~45 min,
    healthy-runtime case a few minutes.
    """
    best = 0.0
    t_start = time.monotonic()
    remaining = lambda: deadline_s - (time.monotonic() - t_start)
    for attempt in range(idle_retries + 1):
        if remaining() <= 0:
            break
        best = max(best, _stage_subprocess("--quick-only",
                                           min(quick_timeout, max(remaining(), 60))))
        if remaining() > 0:
            best = max(best, _stage_subprocess("--full-only",
                                               min(full_timeout, max(remaining(), 60))))
        if best >= DEGRADED_SPS or attempt == idle_retries:
            break
        if remaining() <= idle_s:
            break
        time.sleep(idle_s)
    return best


if __name__ == "__main__":
    if "--quick-only" in sys.argv:
        print(_quick())
        sys.exit(0)
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
