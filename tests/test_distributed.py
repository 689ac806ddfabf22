"""Data-parallel training on a virtual 8-device CPU mesh.

Validates the reference's "DP equals a bigger single-device batch" argument
(ac_ppo_continuous_action.cpp:548-550) structurally: the distributed iteration
runs, params stay replicated (identical across devices), and training is
deterministic for fixed seeds.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppo_tpu.algos import ppo
from ppo_tpu.config import PPOConfig
from ppo_tpu.envs import VectorEnv, make_env
from ppo_tpu.models import GaussianActorCritic
from ppo_tpu.parallel import (
    init_distributed_runner_state,
    make_distributed_train_iteration,
    make_mesh,
)


def tiny_cfg(num_envs=8):
    return PPOConfig(
        env_id="HalfCheetah-v5", num_envs=num_envs, num_steps=8,
        num_minibatches=2, update_epochs=2, total_timesteps=num_envs * 8 * 2,
        solver_iterations=5,
    )


def test_distributed_iteration_runs_and_replicates():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)
    cfg = tiny_cfg(num_envs=8)
    env = make_env(cfg.env_id, dtype=jnp.float32, solver_iterations=cfg.solver_iterations)
    venv_global = VectorEnv(env, cfg.num_envs, normalize_obs=True, normalize_reward=True)
    venv_local = VectorEnv(env, cfg.num_envs // 8, normalize_obs=True, normalize_reward=True)
    model = GaussianActorCritic(act_dim=env.act_dim)
    optimizer = ppo.make_optimizer(cfg)

    rs, specs = init_distributed_runner_state(
        cfg, venv_global, model, optimizer, jax.random.PRNGKey(0), mesh
    )
    run = make_distributed_train_iteration(cfg, venv_local, model, optimizer, mesh)
    rs2, out = jax.jit(lambda r: run(r, specs))(rs)

    # params remain replicated and finite after a distributed update
    p = jax.device_get(rs2.params)
    for leaf in jax.tree.leaves(p):
        assert np.all(np.isfinite(leaf))
    # value of a replicated leaf is identical on every device
    leaf = jax.tree.leaves(rs2.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    # episode buffers keep the global env axis
    assert out.episode_return.shape == (cfg.num_steps, cfg.num_envs)
    assert int(rs2.iteration) == 1


def test_distributed_deterministic():
    mesh = make_mesh(8)
    cfg = tiny_cfg(num_envs=8)
    env = make_env(cfg.env_id, dtype=jnp.float32, solver_iterations=cfg.solver_iterations)
    model = GaussianActorCritic(act_dim=env.act_dim)
    optimizer = ppo.make_optimizer(cfg)
    venv_global = VectorEnv(env, cfg.num_envs)
    venv_local = VectorEnv(env, 1)

    outs = []
    for _ in range(2):
        rs, specs = init_distributed_runner_state(
            cfg, venv_global, model, optimizer, jax.random.PRNGKey(7), mesh
        )
        run = make_distributed_train_iteration(cfg, venv_local, model, optimizer, mesh)
        rs, _ = jax.jit(lambda r: run(r, specs))(rs)
        outs.append(jax.device_get(rs.params))
    a, b = outs
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(x, y)
