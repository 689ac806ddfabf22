#!/bin/bash
# Round-3 learning-parity queue: Humanoid-v4 AC-PPO with the now-default
# SERIAL (reference-faithful) iteration order — the pipelined A/B showed the
# one-iteration policy staleness costs real learning (see ACPPOConfig note).
# Seeds 1+2, 1M steps each, num_eval_runs=128.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
for seed in 1 2; do
  timeout 3600 python -m ppo_tpu.train_ac_ppo --env_id Humanoid-v4 --seed $seed \
    --num_envs 64 --total_timesteps 1000000 --checkpoint_every 0 \
    --exp_name hum_serial --exp_folder runs_curves \
    > runs_curves/hum_serial_s${seed}.log 2>&1
  echo HUM_SERIAL_S${seed}_DONE
done
echo CAMPAIGN10_DONE
