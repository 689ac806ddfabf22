#!/bin/bash
# Round-3 chip queue (sequential; single tunneled chip).
# 1) Humanoid-v4 AC-PPO seed 2, 1M steps (completes the round-2 table row).
# 2) CleanRL-config HalfCheetah 1x2048 wall-time measurement (8 iterations).
# 3+4) AC-PPO pipelined-vs-serial overlap measurement (round-1 VERDICT item 8).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
timeout 2400 python -m ppo_tpu.train_ac_ppo --env_id Humanoid-v4 --seed 2 \
  --num_envs 64 --total_timesteps 1000000 --checkpoint_every 0 \
  --exp_name hum_r2 --exp_folder runs_curves > runs_curves/hum_r2_s2.log 2>&1
echo STAGE1_DONE
timeout 900 python -m ppo_tpu.train_ppo --env_id HalfCheetah-v5 --seed 1 \
  --num_envs 1 --num_steps 2048 --total_timesteps 16384 \
  --checkpoint_every 0 --exp_name cheetah_clean_timing \
  --exp_folder /tmp/timing_runs > runs_curves/cheetah_clean_timing.log 2>&1
echo STAGE2_DONE
timeout 700 python -m ppo_tpu.train_ac_ppo --env_id HalfCheetah-v5 --seed 1 \
  --num_envs 64 --total_timesteps 262144 --checkpoint_every 0 --pipelined 1 \
  --exp_name ac_overlap_pipe --exp_folder /tmp/timing_runs \
  > runs_curves/ac_overlap_pipelined.log 2>&1
echo STAGE3_DONE
timeout 700 python -m ppo_tpu.train_ac_ppo --env_id HalfCheetah-v5 --seed 1 \
  --num_envs 64 --total_timesteps 262144 --checkpoint_every 0 --pipelined 0 \
  --exp_name ac_overlap_serial --exp_folder /tmp/timing_runs \
  > runs_curves/ac_overlap_serial.log 2>&1
echo CAMPAIGN9_DONE
