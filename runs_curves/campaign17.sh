#!/bin/bash
# Round-5 chip queue #3 — top-k contact selection perf (VERDICT item 1).
# 1) solver-variant microbench at the NEW post-selection shapes (H-build gate)
# 2) per-env sweep with per-model top-k defaults, incl. Humanoid knee batches
# 3) per-env sweep with selection OFF (same session -> same conditions A/B)
# 4) flagship bench.py (cheetah k=8 must not regress the headline)
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
{
  echo "== solver variants: Humanoid post-topk (ne=81 nv=23 B=1024) =="
  NE=81 NV=23 BATCH=1024 timeout 900 python bench_solver_variants.py
  echo "== solver variants: Ant post-topk (ne=56 nv=14 B=2048) =="
  NE=56 NV=14 BATCH=2048 timeout 900 python bench_solver_variants.py
} > runs_curves/solver_variants_topk.log 2>&1
echo STAGE1_DONE
{
  timeout 900 python bench_envs.py --env Ant-v5 --batch 2048
  timeout 900 python bench_envs.py --env Ant-v5 --batch 4096
  timeout 900 python bench_envs.py --env Humanoid-v4 --batch 1024 --steps 30
  timeout 900 python bench_envs.py --env Humanoid-v4 --batch 2048 --steps 30
  timeout 900 python bench_envs.py --env Humanoid-v4 --batch 4096 --steps 30
  timeout 900 python bench_envs.py --env HalfCheetah-v5 --batch 4096
  timeout 900 python bench_envs.py --env Hopper-v5 --batch 4096
} > runs_curves/bench_envs_topk.log 2>&1
echo STAGE2_DONE
{
  timeout 900 python bench_envs.py --env Ant-v5 --batch 2048 --topk 0
  timeout 900 python bench_envs.py --env Humanoid-v4 --batch 1024 --steps 30 --topk 0
  timeout 900 python bench_envs.py --env HalfCheetah-v5 --batch 4096 --topk 0
} > runs_curves/bench_envs_notopk.log 2>&1
echo STAGE3_DONE
timeout 900 python bench.py > runs_curves/bench_flagship_topk.log 2>&1
echo CAMPAIGN17_DONE
