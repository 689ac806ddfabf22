#!/bin/bash
# Round-2 learning-parity campaign (revised): 1x2048 CleanRL-exact is
# ~42 s/iteration for Ant (RK4 single-env latency-bound) = 5.7 h/run, so the
# control uses 8x256 — same 2048 batch and LR schedule, 256-step GAE horizon
# (2x the round-1 128 that plateaued). Interleaved seeds so partial results
# cover both envs if the round ends.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
run_ant () {
  timeout 4200 python -m ppo_tpu.train_ppo --env_id Ant-v5 --seed $1 \
    --num_envs 8 --num_steps 256 --total_timesteps 1000000 \
    --checkpoint_every 0 --exp_name ant_mid \
    --exp_folder runs_curves > runs_curves/ant_mid_s$1.log 2>&1
}
run_hum () {
  timeout 3000 python -m ppo_tpu.train_ac_ppo --env_id Humanoid-v4 --seed $1 \
    --num_envs 64 --total_timesteps 1000000 --checkpoint_every 0 \
    --exp_name hum_r2 --exp_folder runs_curves > runs_curves/hum_r2_s$1.log 2>&1
}
run_ant 1
run_hum 1
run_ant 2
run_hum 2
run_ant 3
echo CAMPAIGN6_DONE
