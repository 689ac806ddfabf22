"""Regenerate SCALING.md virtual-mesh rows at flagship-shaped configs."""
import json
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")

import sys
sys.path.insert(0, "/root/repo")
from bench_scaling import bench_mesh

for s in (1, 2, 4, 8):
    print(json.dumps(bench_mesh(s, num_envs=1024, num_steps=32, reps=2)), flush=True)
# the exact flagship config, one point on the full 8-device mesh
print(json.dumps({"flagship_4096x32": bench_mesh(8, num_envs=4096, num_steps=32, reps=1)}), flush=True)
