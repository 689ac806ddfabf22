#!/bin/bash
# Round-4 ablation queue: WHICH ingredient of the AC-PPO/Atari config caps
# Humanoid at ~365 train return (VERDICT r3 weak #9)? The sync Gaussian
# trainer reaches ~500 at 1M with: clip 0.2, 32 minibatches, 10 epochs,
# ent 0.0, lr 3e-4, running obs/reward normalization. The AC baseline
# (Beta + baked stats, clip 0.1, 4 mb, 4 ep, ent 0.01, lr 2.5e-4) made
# 457/390 at 1M (runs_curves/hum_serial_s{1,2}.log). Each run flips ONE
# knob at 1M steps, 64 envs, seed 1 — same schedule as hum_serial.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
run () {
  name=$1; shift
  timeout 3600 python -m ppo_tpu.train_ac_ppo --env_id Humanoid-v4 --seed 1 \
    --num_envs 64 --total_timesteps 1000000 --checkpoint_every 0 \
    --exp_name $name --exp_folder runs_curves "$@" \
    > runs_curves/${name}_s1.log 2>&1
  echo ${name}_DONE
}
run hum_abl_clip02 --clip_coef 0.2
run hum_abl_mb32ep10 --num_minibatches 32 --update_epochs 10
run hum_abl_ent0 --ent_coef 0.0
run hum_abl_allsync --clip_coef 0.2 --num_minibatches 32 --update_epochs 10 \
  --ent_coef 0.0 --learning_rate 3e-4
echo CAMPAIGN14_DONE
