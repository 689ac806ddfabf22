#!/bin/bash
# Round-2 continuation: finish the learning-parity campaign.
# 1) Humanoid-v4 AC-PPO seed 2 (seed 1 reached eval 406 over 128 episodes).
# 2) Ant-v5 PPO at 4x512 — same 2048 batch as CleanRL, 512-step GAE horizon
#    (4x the round-1 128 that plateaued; 1x2048 on-device is 42 s/iter and
#    infeasible in-round; the CPU gym control covers the exact schedule).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
timeout 1200 python -m ppo_tpu.train_ac_ppo --env_id Humanoid-v4 --seed 2 \
  --num_envs 64 --total_timesteps 1000000 --checkpoint_every 0 \
  --exp_name hum_r2 --exp_folder runs_curves > runs_curves/hum_r2_s2.log 2>&1
timeout 2200 python -m ppo_tpu.train_ppo --env_id Ant-v5 --seed 1 \
  --num_envs 4 --num_steps 512 --total_timesteps 1000000 \
  --checkpoint_every 0 --exp_name ant_h512 \
  --exp_folder runs_curves > runs_curves/ant_h512_s1.log 2>&1
echo CAMPAIGN7_DONE
