#!/bin/bash
# Learning-curve campaign, round 1 (BASELINE.json configs 2 + 3):
#   - Hopper-v5 / Ant-v5 PPO, 16 vectorized envs, on-device obs/reward norm
#   - Humanoid-v4 AC-PPO, 64 envs, pipelined rollout/update, Beta policy
# Golden-curve methodology from the reference (README.md:73-82): compare
# final returns against CleanRL's published bands.
cd /root/repo
for seed in 1 2 3; do
  timeout 3000 python -m ppo_tpu.train_ppo --env_id Hopper-v5 --num_envs 16 --num_steps 128 \
    --total_timesteps 1000000 --seed $seed --solver_iterations 10 \
    --exp_folder runs_curves > runs_curves/hopper_s$seed.log 2>&1
done
for seed in 1 2 3; do
  timeout 3000 python -m ppo_tpu.train_ppo --env_id Ant-v5 --num_envs 16 --num_steps 128 \
    --total_timesteps 1000000 --seed $seed --solver_iterations 10 \
    --exp_folder runs_curves > runs_curves/ant_s$seed.log 2>&1
done
for seed in 1 2; do
  timeout 10000 python -m ppo_tpu.train_ac_ppo --env_id Humanoid-v4 --num_envs 64 \
    --total_timesteps 1000000 --seed $seed --solver_iterations 10 \
    --exp_folder runs_curves > runs_curves/humanoid_ac_s$seed.log 2>&1
done
echo done > runs_curves/campaign2.done
