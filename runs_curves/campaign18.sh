#!/bin/bash
# Round-5 chip queue #4 — CNN at reference scale (VERDICT r4 item 3).
# 84x84 sweep rerun with committed logs (r4's numbers had no artifact), then
# the 192x192 BEV config (the Roach encoders' native CARLA input size),
# then a profiler trace at 192x192 bf16.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
run () {
  name=$1; shift
  timeout 1200 python -m ppo_tpu.train_cnn --exp_name "$name" \
    --exp_folder /tmp/r5_cnn --checkpoint_every 0 "$@" \
    > "runs_curves/cnn_${name}.log" 2>&1
  echo "DONE $name"
}
# 84x84 (BASELINE stress config), 128 envs x 128 steps, 12 iterations
run 84_f32  --num_envs 128 --total_timesteps 327680
run 84_bf16 --num_envs 128 --total_timesteps 327680 --compute_dtype bfloat16
# 192x192 (reference-scale BEV): 32 and 64 envs, f32 vs bf16
run 192_n32_f32  --image_size 192 --num_envs 32 --total_timesteps 81920
run 192_n32_bf16 --image_size 192 --num_envs 32 --total_timesteps 81920 --compute_dtype bfloat16
run 192_n64_bf16 --image_size 192 --num_envs 64 --total_timesteps 163840 --compute_dtype bfloat16
run 192_n128_bf16 --image_size 192 --num_envs 128 --total_timesteps 327680 --compute_dtype bfloat16
# profiler trace at the best 192 config (iterations 3-5)
run 192_prof --image_size 192 --num_envs 64 --total_timesteps 65536 \
  --compute_dtype bfloat16 --profile 1
echo CAMPAIGN18_DONE
