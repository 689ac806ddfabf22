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


def test_ppo_resume_continues_run(tmp_path):
    """Kill-and-resume: a run checkpointed at iteration k, restarted with
    --resume_from, continues at k+1 with the full runner state (params,
    optimizer, env normalizers, RNG) — the reference's crash-recovery path
    (ac_ppo_carla.cpp:226-255) plus the normalizer-state gap fixed."""
    import glob

    from ppo_tpu.config import PPOConfig
    from ppo_tpu.train_ppo import train
    from ppo_tpu.utils import checkpoint as ckpt

    base = dict(
        env_id="HalfCheetah-v5", num_envs=2, num_steps=16, num_minibatches=2,
        update_epochs=1, exp_folder=str(tmp_path), solver_iterations=4,
        num_eval_runs=1, checkpoint_every=1,
    )
    # phase 1: 2 iterations
    cfg1 = PPOConfig(total_timesteps=64, **base)
    rs1, _ = train(cfg1, verbose=False)
    run1 = glob.glob(str(tmp_path / "*"))[0]
    path, it = ckpt.latest_checkpoint(run1)
    assert it == 2

    # phase 2: resume from the folder, run to 4 iterations total
    cfg2 = PPOConfig(total_timesteps=128, resume_from=run1, **base)
    rs2, _ = train(cfg2, verbose=False)
    assert int(rs2.iteration) == 4
    # resumed run must have moved past the checkpoint
    p_ckpt = jax.tree.leaves(ckpt.restore_state(path, rs1).params)[0]
    p_new = jax.tree.leaves(jax.device_get(rs2.params))[0]
    assert np.abs(p_new - p_ckpt).max() > 0

def test_resolve_checkpoint_file_and_folder(tmp_path):
    from ppo_tpu.utils import checkpoint as ckpt

    p = ckpt.save_state({"a": np.zeros(3)}, tmp_path, 7)
    # folder resolves to newest latest-file; file parses iteration from name
    assert ckpt.resolve_checkpoint(tmp_path) == (p, 7)
    assert ckpt.resolve_checkpoint(p) == (p, 7)
    f = ckpt.save_final({"a": np.zeros(3)}, tmp_path)
    assert ckpt.resolve_checkpoint(f) == (f, 0)
    assert ckpt.resolve_checkpoint(tmp_path / "nope") == (None, -1)


def test_ac_ppo_resume(tmp_path):
    import glob

    from ppo_tpu.train_ac_ppo import ACPPOConfig, train

    base = dict(
        env_id="Hopper-v5", num_envs=2, num_steps=16, num_minibatches=2,
        update_epochs=1, exp_folder=str(tmp_path), solver_iterations=4,
        num_eval_runs=1, pipelined=False, checkpoint_every=1,
    )
    train(ACPPOConfig(total_timesteps=64, **base), verbose=False)
    run1 = glob.glob(str(tmp_path / "*"))[0]
    params, _ = train(ACPPOConfig(total_timesteps=96, resume_from=run1, **base), verbose=False)
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
