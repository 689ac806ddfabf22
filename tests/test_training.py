"""End-to-end trainer smoke tests: PPO, AC-PPO, CNN (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_ppo_trains_and_checkpoints(tmp_path):
    from ppo_tpu.config import PPOConfig
    from ppo_tpu.train_ppo import train
    from ppo_tpu.utils import checkpoint as ckpt

    cfg = PPOConfig(
        env_id="HalfCheetah-v5", num_envs=2, num_steps=32, num_minibatches=2,
        update_epochs=2, total_timesteps=128, exp_folder=str(tmp_path),
        solver_iterations=4, num_eval_runs=1,
    )
    rs, returns = train(cfg, verbose=False)
    for leaf in jax.tree.leaves(jax.device_get(rs.params)):
        assert np.all(np.isfinite(leaf))
    # checkpoint written and restorable
    import glob, os

    runs = glob.glob(str(tmp_path / "*"))
    assert runs
    path, it = ckpt.latest_checkpoint(runs[0])
    assert it == cfg.num_iterations
    restored = ckpt.restore_state(path, rs)
    np.testing.assert_array_equal(
        jax.tree.leaves(restored.params)[0], jax.tree.leaves(jax.device_get(rs.params))[0]
    )


def test_ac_ppo_beta_trains(tmp_path):
    from ppo_tpu.train_ac_ppo import ACPPOConfig, train

    cfg = ACPPOConfig(
        env_id="Hopper-v5", num_envs=2, num_steps=16, num_minibatches=2,
        update_epochs=1, total_timesteps=96, exp_folder=str(tmp_path),
        solver_iterations=4, num_eval_runs=1, pipelined=True,
    )
    params, returns = train(cfg, verbose=False)
    for leaf in jax.tree.leaves(jax.device_get(params)):
        assert np.all(np.isfinite(leaf))


def test_cnn_trains(tmp_path):
    from ppo_tpu.train_cnn import CNNConfig, train

    cfg = CNNConfig(
        num_envs=2, num_steps=8, num_minibatches=2, update_epochs=1,
        total_timesteps=32, exp_folder=str(tmp_path),
    )
    params = train(cfg, verbose=False)
    for leaf in jax.tree.leaves(jax.device_get(params)):
        assert np.all(np.isfinite(leaf))


def test_gaussian_ppo_learns_quickly_on_cheetah():
    """Short learning sanity: losses finite, approx_kl sane, SPS positive —
    plus the policy visibly changes (update actually moves parameters)."""
    from ppo_tpu.algos import ppo
    from ppo_tpu.config import PPOConfig
    from ppo_tpu.envs import VectorEnv, make_env
    from ppo_tpu.models import GaussianActorCritic

    cfg = PPOConfig(
        env_id="HalfCheetah-v5", num_envs=4, num_steps=32, num_minibatches=4,
        update_epochs=4, total_timesteps=4 * 32 * 3, solver_iterations=4,
    )
    env = make_env(cfg.env_id, dtype=jnp.float32, solver_iterations=cfg.solver_iterations)
    venv = VectorEnv(env, cfg.num_envs, normalize_obs=True, normalize_reward=True)
    model = GaussianActorCritic(act_dim=env.act_dim)
    optimizer = ppo.make_optimizer(cfg)
    rs = ppo.init_runner_state(cfg, venv, model, optimizer, jax.random.PRNGKey(0))
    step = jax.jit(ppo.make_train_iteration(cfg, venv, model, optimizer))
    p0 = jax.tree.leaves(jax.device_get(rs.params))[0].copy()
    for _ in range(cfg.num_iterations):
        rs, out = step(rs)
    assert np.isfinite(float(out.stats.total_loss))
    assert 0 <= float(out.stats.clipfrac) <= 1
    p1 = jax.tree.leaves(jax.device_get(rs.params))[0]
    assert np.abs(p1 - p0).max() > 1e-5
