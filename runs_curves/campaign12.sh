#!/bin/bash
# Round-3 chip queue #3:
# 1) bench_scaling with the RTT-amortized on-chip config (2048 x 32).
# 2) sync-PPO Humanoid-v4 (Gaussian, CleanRL hyperparameters, batch 2048 kept
#    as 4 envs x 512 steps so the op-latency-bound 1-env config doesn't
#    dominate wall time): the reference's OWN Humanoid validation is this
#    sync trainer (README.md:80, docs/humanoid_clearnrl_ppo_cpp.png), not
#    AC-PPO — 2M steps to show the curve past the 1M mark.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
timeout 1500 python bench_scaling.py > runs_curves/bench_scaling_r3b.log 2>&1
echo SCALING2_DONE
timeout 5400 python -m ppo_tpu.train_ppo --env_id Humanoid-v4 --seed 1 \
  --num_envs 4 --num_steps 512 --total_timesteps 2000000 \
  --checkpoint_every 0 --exp_name hum_sync --exp_folder runs_curves \
  > runs_curves/hum_sync_s1.log 2>&1
echo HUM_SYNC_DONE
echo CAMPAIGN12_DONE
