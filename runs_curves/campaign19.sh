#!/bin/bash
# Round-5 chip queue #5 — learning-quality validation of the physics changes
# + the Humanoid 10M stretch curve (VERDICT r4 item 8).
# 1) Ant sync PPO 1M with top-k defaults (round-1 table row reproduction)
# 2) Humanoid sync 64x128 1M (r4's hum_sync64 rows: 535-568 window at 1M)
# 3) Humanoid 10M at the tile-eligible 1024x32 schedule, seed 1
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
timeout 1800 python -m ppo_tpu.train_ppo --env_id Ant-v5 --seed 1 \
  --num_envs 16 --num_steps 128 --total_timesteps 1000000 --checkpoint_every 0 \
  --exp_name ant_topk_r5 --exp_folder runs_curves \
  > runs_curves/ant_topk_r5_s1.log 2>&1
echo STAGE1_DONE
timeout 2400 python -m ppo_tpu.train_ppo --env_id Humanoid-v4 --seed 1 \
  --num_envs 64 --num_steps 128 --total_timesteps 1048576 --checkpoint_every 0 \
  --exp_name hum_topk_r5 --exp_folder runs_curves \
  > runs_curves/hum_topk_r5_s1.log 2>&1
echo STAGE2_DONE
timeout 3600 python -m ppo_tpu.train_ppo --env_id Humanoid-v4 --seed 1 \
  --num_envs 1024 --num_steps 32 --num_minibatches 32 --update_epochs 10 \
  --total_timesteps 10485760 --checkpoint_every 0 \
  --exp_name hum_10m --exp_folder runs_curves \
  > runs_curves/hum_10m_s1.log 2>&1
echo CAMPAIGN19_DONE
