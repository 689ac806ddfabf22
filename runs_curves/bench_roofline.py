"""Roofline statement for the stepping programs (VERDICT r4 item 7): compile
the exact bench.py stepping program per env, pull XLA's own cost analysis
(bytes accessed / FLOPs) for the compiled module, and relate both to the
measured step time -> achieved HBM GB/s and FLOP/s vs chip peaks.

Run on the chip (needs the TPU compiler's cost model). Prints one JSON line
per env row.
"""
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from ppo_tpu.envs import make_env
from ppo_tpu.models import GaussianActorCritic

# v5e (1 chip) peaks: ~197 TFLOP/s bf16 / ~98 f32; HBM ~819 GB/s.
PEAK_HBM_GBS = 819.0
PEAK_F32_TFLOPS = 98.0

ROWS = [
    ("HalfCheetah-v5", 4096, 50),
    ("Ant-v5", 2048, 50),
    ("Humanoid-v4", 1024, 30),
]

for env_id, B, steps in ROWS:
    env = make_env(env_id, dtype=jnp.float32, solver_iterations=4)
    model = GaussianActorCritic(act_dim=env.act_dim)
    params = model.init_params(jax.random.PRNGKey(1), env.obs_dim)
    consts = env.consts
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    state, obs = jax.jit(jax.vmap(env.reset, in_axes=(0, None)))(keys, consts)

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
    compiled = jax.jit(loop).lower(params, state, obs, key, consts).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    byt = float(ca.get("bytes accessed", float("nan")))

    # measured time for the same program (fetch-validated)
    out = compiled(params, state, obs, key, consts)
    float(jax.device_get(out[3]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = compiled(params, state, obs, key, consts)
        float(jax.device_get(out[3]))
        ts.append(time.perf_counter() - t0)
    dt = statistics.median(ts)
    row = {
        "env": env_id,
        "batch": B,
        "scan_steps": steps,
        "ms_per_vector_step": round(dt / steps * 1e3, 3),
        "env_steps_per_s": round(B * steps / dt),
        "xla_gflops_per_step": round(flops / steps / 1e9, 3),
        "xla_bytes_per_step_MB": round(byt / steps / 1e6, 2),
        "achieved_HBM_GBs": round(byt / dt / 1e9, 1),
        "pct_HBM_roofline": round(100 * byt / dt / 1e9 / PEAK_HBM_GBS, 1),
        "achieved_TFLOPs": round(flops / dt / 1e12, 2),
        "pct_F32_peak": round(100 * flops / dt / 1e12 / PEAK_F32_TFLOPS, 1),
    }
    print(json.dumps(row), flush=True)
