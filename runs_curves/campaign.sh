#!/bin/bash
cd /root/repo
timeout 10000 python -m ppo_tpu.train_ppo --env_id HalfCheetah-v5 --total_timesteps 1000000 --seed 1 --solver_iterations 10 --exp_folder runs_curves > runs_curves/cheetah_s1.log 2>&1
timeout 20000 python -m ppo_tpu.train_ppo --env_id Humanoid-v4 --total_timesteps 1000000 --seed 1 --solver_iterations 10 --exp_folder runs_curves > runs_curves/humanoid_s1.log 2>&1
echo done > runs_curves/campaign.done
