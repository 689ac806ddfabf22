#!/bin/bash
# Round-4 chip queue #1: sync-PPO Humanoid seeds 2+3 at the EXACT schedule of
# the finished seed-1 run (64 envs x 128 steps, 4M steps, Gaussian, CleanRL
# hyperparameters) so the three seeds form a comparable table for the
# reference's published Humanoid curve (README.md:80).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
for SEED in 2 3; do
  timeout 2400 python -m ppo_tpu.train_ppo --env_id Humanoid-v4 --seed $SEED \
    --num_envs 64 --num_steps 128 --total_timesteps 4000000 \
    --checkpoint_every 0 --exp_name hum_sync64_4m --exp_folder runs_curves \
    > runs_curves/hum_sync64_4m_s$SEED.log 2>&1
  echo HUM_SYNC64_S${SEED}_DONE
done
echo CAMPAIGN13_DONE
