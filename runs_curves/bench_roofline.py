"""Roofline statement for the stepping programs (VERDICT r4 item 7), from a
jax.profiler trace: sum MEASURED per-op device durations + bytes accessed +
model flops over leaf ops (loop bodies appear per executed iteration in the
timeline, so trip counts are real — unlike compile-time cost_analysis, which
counts while bodies once). Prints per-env totals, achieved HBM GB/s and
FLOP/s vs chip peaks, and the top op categories.

Run on the chip: python runs_curves/bench_roofline.py
"""
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from ppo_tpu.envs import make_env
from ppo_tpu.models import GaussianActorCritic

PEAK_HBM_GBS = 819.0
PEAK_F32_TFLOPS = 98.0

ROWS = [
    ("HalfCheetah-v5", 4096, 50),
    ("Ant-v5", 2048, 50),
    ("Humanoid-v4", 1024, 30),
]


def analyze(trace_dir, steps):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    data = json.load(gzip.open(sorted(paths)[-1]))
    evs = data["traceEvents"] if isinstance(data, dict) else data
    pid_names = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    tot_d = tot_f = tot_b = 0.0
    bycat = collections.defaultdict(lambda: [0.0, 0.0, 0.0])
    for e in evs:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pid_names.get(e["pid"], ""):
            continue
        a = e.get("args") or {}
        cat = a.get("hlo_category", "")
        if not cat or cat == "while":
            continue
        d = e["dur"]
        f = float(a.get("model_flops", 0) or 0)
        b = float(a.get("raw_bytes_accessed", 0) or 0)
        tot_d += d
        tot_f += f
        tot_b += b
        c = bycat[cat]
        c[0] += d
        c[1] += f
        c[2] += b
    return tot_d, tot_f, tot_b, bycat


for env_id, B, steps in ROWS:
    env = make_env(env_id, dtype=jnp.float32, solver_iterations=4)
    model = GaussianActorCritic(act_dim=env.act_dim)
    params = model.init_params(jax.random.PRNGKey(1), env.obs_dim)
    consts = env.consts
    keys = jax.random.split(jax.random.PRNGKey(0), B)
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
    out = loop(params, state, obs, key, consts)
    float(jax.device_get(out[3]))  # compile + warm
    tdir = tempfile.mkdtemp(prefix=f"roofline_{env_id.split('-')[0]}_")
    jax.profiler.start_trace(tdir)
    t0 = time.perf_counter()
    out = loop(params, out[0], out[1], out[2], consts)
    float(jax.device_get(out[3]))
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()

    d, f, b, bycat = analyze(tdir, steps)
    n_env_steps = B * steps
    row = {
        "env": env_id, "batch": B, "scan_steps": steps,
        "wall_ms_per_step": round(wall / steps * 1e3, 3),
        "device_ms_per_step": round(d / 1e3 / steps, 3),
        "bytes_per_step_MB": round(b / steps / 1e6, 1),
        "achieved_HBM_GBs": round(b / (d * 1e-6) / 1e9, 1),
        "pct_HBM_roofline": round(100 * b / (d * 1e-6) / 1e9 / PEAK_HBM_GBS, 1),
        "achieved_TFLOPs": round(f / (d * 1e-6) / 1e12, 2),
        "pct_F32_peak": round(100 * f / (d * 1e-6) / 1e12 / PEAK_F32_TFLOPS, 1),
    }
    print(json.dumps(row), flush=True)
    for cat, (cd, cf, cb) in sorted(bycat.items(), key=lambda kv: -kv[1][0])[:6]:
        print(f"    {cat:28s} {cd/1e3/steps:7.3f} ms/step  "
              f"{cb/(cd*1e-6)/1e9:6.1f} GB/s  {cf/(cd*1e-6)/1e12:5.2f} TF/s",
              flush=True)
