#!/bin/bash
# Round-2 learning-parity campaign: Ant-v5 on the EXACT CleanRL schedule
# (1 env x 2048 steps, the control for the round-1 Ant plateau diagnosis),
# then Humanoid-v4 AC-PPO seeds. Sequential: one chip.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
for s in 1 2 3; do
  timeout 4200 python -m ppo_tpu.train_ppo --env_id Ant-v5 --seed $s \
    --num_envs 1 --num_steps 2048 --total_timesteps 1000000 \
    --checkpoint_every 0 --exp_name ant_clean \
    --exp_folder runs_curves > runs_curves/ant_clean_s$s.log 2>&1
done
for s in 1 2; do
  timeout 2400 python -m ppo_tpu.train_ac_ppo --env_id Humanoid-v4 --seed $s \
    --total_timesteps 1000000 --checkpoint_every 0 --exp_name hum_r2 \
    --exp_folder runs_curves > runs_curves/hum_r2_s$s.log 2>&1
done
echo CAMPAIGN5_DONE
