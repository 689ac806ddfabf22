#!/bin/bash
# Round-3 chip queue #2:
# 1) full-training-iteration throughput (bench_scaling, 1 real device)
# 2) CNN-policy trainer throughput (synthetic driving, BASELINE config 5)
# 3) Humanoid-v4 AC-PPO serial, 4M steps: the reference's published curve is
#    1M; this shows the framework carries the curve well past it.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
timeout 1200 python bench_scaling.py > runs_curves/bench_scaling_r3.log 2>&1
echo SCALING_DONE
timeout 1200 python -m ppo_tpu.train_cnn --num_envs 64 --num_steps 64 \
  --total_timesteps 131072 --checkpoint_every 0 --exp_name cnn_bench \
  --exp_folder /tmp/timing_runs > runs_curves/cnn_bench_r3.log 2>&1
echo CNN_DONE
timeout 5400 python -m ppo_tpu.train_ac_ppo --env_id Humanoid-v4 --seed 1 \
  --num_envs 64 --total_timesteps 4000000 --checkpoint_every 0 \
  --exp_name hum_serial_4m --exp_folder runs_curves \
  > runs_curves/hum_serial_4m_s1.log 2>&1
echo HUM_4M_DONE
echo CAMPAIGN11_DONE
