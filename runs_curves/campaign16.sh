#!/bin/bash
# Round-5 chip queue #2.
# 1+2) pipelined-vs-serial A/B at 1M steps (VERDICT item 2 "done" criterion:
#      staleness must show normal degradation at a real budget, not 50x).
# 3) active-contact-count measurement for top-k selection sizing.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
timeout 1200 python -m ppo_tpu.train_ac_ppo --env_id HalfCheetah-v5 --seed 1 \
  --num_envs 64 --total_timesteps 1048576 --checkpoint_every 0 --pipelined 1 \
  --exp_name ac_pipe_1m --exp_folder /tmp/r5_runs \
  > runs_curves/ac_pipe_1m.log 2>&1
echo STAGE1_DONE
timeout 1200 python -m ppo_tpu.train_ac_ppo --env_id HalfCheetah-v5 --seed 1 \
  --num_envs 64 --total_timesteps 1048576 --checkpoint_every 0 --pipelined 0 \
  --exp_name ac_serial_1m --exp_folder /tmp/r5_runs \
  > runs_curves/ac_serial_1m.log 2>&1
echo STAGE2_DONE
PYTHONPATH=/root/.axon_site:/root/repo timeout 1800 python runs_curves/count_contacts.py \
  > runs_curves/count_contacts.log 2>&1
echo CAMPAIGN16_DONE
