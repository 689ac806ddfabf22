"""End-to-end trainer smoke tests: PPO, AC-PPO, CNN (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


pytestmark = pytest.mark.slow


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


def test_evaluate_keeps_training_normalizer_and_episode_count():
    """The final eval must see observations normalized with the TRAINING
    statistics (reference reuses training envs for exactly this,
    ppo_continuous_action.cpp:595-599) and collect num_eval_runs episodes
    even when num_envs < num_eval_runs (autoreset keeps collecting)."""
    from ppo_tpu.algos import ppo
    from ppo_tpu.config import PPOConfig
    from ppo_tpu.envs import VectorEnv, make_env
    from ppo_tpu.models import GaussianActorCritic

    cfg = PPOConfig(
        env_id="HalfCheetah-v5", num_envs=2, num_steps=16, num_minibatches=2,
        update_epochs=1, total_timesteps=64, solver_iterations=4, num_eval_runs=4,
    )
    env = make_env(cfg.env_id, dtype=jnp.float32, solver_iterations=cfg.solver_iterations)
    venv = VectorEnv(env, cfg.num_envs, normalize_obs=True, normalize_reward=True)
    model = GaussianActorCritic(act_dim=env.act_dim)
    optimizer = ppo.make_optimizer(cfg)
    rs = ppo.init_runner_state(cfg, venv, model, optimizer, jax.random.PRNGKey(0))
    step = jax.jit(ppo.make_train_iteration(cfg, venv, model, optimizer))
    for _ in range(cfg.num_iterations):
        rs, _ = step(rs)

    # carried statistics actually reach the eval env state
    state, _ = venv.reset(jax.random.PRNGKey(5), norm_state=rs.env)
    trained_mean = jax.device_get(rs.env.obs_rms.mean)
    np.testing.assert_allclose(
        jax.device_get(state.obs_rms.count), jax.device_get(rs.env.obs_rms.count) + 1
    )
    fresh, _ = venv.reset(jax.random.PRNGKey(5))
    assert float(jnp.abs(state.obs_rms.mean - fresh.obs_rms.mean).max()) > 0

    # episode count honored with fewer envs than requested episodes: shorten
    # the truncation horizon so episodes end every 10 steps; 2 envs must still
    # deliver the 4 requested episodes (autoreset keeps collecting)
    env.max_episode_steps = 10
    returns = ppo.evaluate(
        cfg, venv, model, rs.params, jax.random.PRNGKey(1),
        max_steps=10, norm_state=rs.env,
    )
    assert len(returns) == cfg.num_eval_runs


def test_ppo_trainer_num_devices(tmp_path):
    """The trainer CLI's --num_devices path: full train() over a 4-device
    mesh (envs sharded, params replicated), the TPU-native `mpirun -n N`."""
    from ppo_tpu.config import PPOConfig
    from ppo_tpu.train_ppo import train

    cfg = PPOConfig(
        env_id="HalfCheetah-v5", num_envs=4, num_steps=16, num_minibatches=2,
        update_epochs=1, total_timesteps=128, exp_folder=str(tmp_path),
        solver_iterations=4, num_eval_runs=1, num_devices=4,
    )
    rs, returns = train(cfg, verbose=False)
    assert int(rs.iteration) == cfg.num_iterations
    leaf = jax.tree.leaves(rs.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


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


def test_eval_cli_on_saved_run(tmp_path):
    """python -m ppo_tpu.eval: offline checkpoint evaluation (the documented
    path for multi-host runs whose in-trainer eval is skipped)."""
    from ppo_tpu.config import PPOConfig
    from ppo_tpu.train_ppo import train
    from ppo_tpu import eval as eval_cli

    cfg = PPOConfig(
        env_id="HalfCheetah-v5", num_envs=2, num_steps=16, num_minibatches=2,
        update_epochs=1, total_timesteps=64, exp_folder=str(tmp_path),
        solver_iterations=4, num_eval_runs=1,
    )
    train(cfg, verbose=False)
    import glob

    run = glob.glob(str(tmp_path / "*"))[0]
    result = eval_cli.main(["--checkpoint", run, "--episodes", "1"])
    assert result["episodes"] == 1
    assert np.isfinite(result["mean_return"])
    assert result["iteration"] == cfg.num_iterations
