#!/bin/bash
# Round-5 chip queue #1 — pipelined-mode diagnosis (VERDICT r4 item 2).
# Same-seed 262k HalfCheetah A/B/C:
#   A) pipelined with params donation restored (the round-3/4 shipping code) —
#      expect the eval-7 collapse to reproduce
#   B) pipelined with the round-5 fix (update no longer donates params) —
#      discriminates buffer-clobber (heals) vs policy staleness (still fails)
#   C) serial control — expect ~360 (matches runs_curves/ac_overlap_serial.log)
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
PPO_TPU_PIPELINED_DONATE_PARAMS=1 timeout 700 python -m ppo_tpu.train_ac_ppo \
  --env_id HalfCheetah-v5 --seed 1 \
  --num_envs 64 --total_timesteps 262144 --checkpoint_every 0 --pipelined 1 \
  --exp_name ac_pipe_donate --exp_folder /tmp/r5_runs \
  > runs_curves/ac_pipe_donate.log 2>&1
echo STAGE1_DONE
timeout 700 python -m ppo_tpu.train_ac_ppo --env_id HalfCheetah-v5 --seed 1 \
  --num_envs 64 --total_timesteps 262144 --checkpoint_every 0 --pipelined 1 \
  --exp_name ac_pipe_nodonate --exp_folder /tmp/r5_runs \
  > runs_curves/ac_pipe_nodonate.log 2>&1
echo STAGE2_DONE
timeout 700 python -m ppo_tpu.train_ac_ppo --env_id HalfCheetah-v5 --seed 1 \
  --num_envs 64 --total_timesteps 262144 --checkpoint_every 0 --pipelined 0 \
  --exp_name ac_serial_r5 --exp_folder /tmp/r5_runs \
  > runs_curves/ac_serial_r5.log 2>&1
echo CAMPAIGN15_DONE
