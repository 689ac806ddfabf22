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


@pytest.mark.slow  # ~2 min compile on 2 cores; dryrun_multichip covers the path
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


@pytest.mark.slow  # ~1.5 min; determinism also pinned by the fast golden test
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


def test_ac_update_dp_equals_big_batch():
    """The reference argues DP = a bigger single-device batch
    (ac_ppo...cpp:548-550). With one minibatch per epoch this is exact: the
    sharded update's pmean'd gradient equals the global full-batch gradient,
    and distributed (Bessel) advantage normalization equals global
    normalization. Feed the SAME rollout to both paths and compare params."""
    from ppo_tpu.algos import ac_ppo
    from ppo_tpu.parallel import dp

    n = 4
    mesh = make_mesh(n)
    cfg = PPOConfig(
        env_id="HalfCheetah-v5", num_envs=8, num_steps=8,
        num_minibatches=1, update_epochs=1, total_timesteps=8 * 8,
        solver_iterations=3,
    )
    env = make_env(cfg.env_id, dtype=jnp.float32, solver_iterations=cfg.solver_iterations)
    venv = VectorEnv(env, cfg.num_envs, clip_actions=True)
    model = GaussianActorCritic(act_dim=env.act_dim)
    optimizer = ppo.make_optimizer(cfg)

    key = jax.random.PRNGKey(3)
    k_env, k_model, k_coll, k_up = jax.random.split(key, 4)
    env_state, obs = venv.reset(k_env)
    params = model.init_params(k_model, venv.obs_dim, dtype=venv.dtype)
    opt_state = optimizer.init(params)

    collect = jax.jit(ac_ppo.make_collect_fn(cfg, venv, model))
    _, _, _, _, rollout = collect(params, env_state, obs, jnp.zeros(cfg.num_envs, bool), k_coll)

    # single-device big-batch update
    upd_global = jax.jit(ac_ppo.make_update_fn(cfg, model, optimizer))
    p_ref, _, _ = upd_global(params, opt_state, rollout, k_up)

    # 4-way sharded update on the SAME rollout
    cfg_local = dp.local_config(cfg, n)
    upd_local = ac_ppo.make_update_fn(cfg_local, model, optimizer, axis_name=dp.AXIS)
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    ro_specs = dp._rollout_specs()
    f = shard_map(
        lambda p, o, r, k: upd_local(p, o, r, k),
        mesh=mesh, in_specs=(P(), P(), ro_specs, P()),
        out_specs=(P(), P(), P()), check_vma=False,
    )
    ro_sharded = jax.device_put(
        rollout, jax.tree.map(lambda s: NamedSharding(mesh, s), ro_specs,
                              is_leaf=lambda x: isinstance(x, P))
    )
    p_dp, _, _ = jax.jit(f)(params, opt_state, ro_sharded, k_up)

    for a, b in zip(jax.tree.leaves(jax.device_get(p_ref)), jax.tree.leaves(jax.device_get(p_dp))):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


@pytest.mark.slow  # ~25 s; dryrun_multichip CNN leg covers the shard path every round
def test_cnn_trainer_dp_runs(tmp_path):
    from ppo_tpu.train_cnn import CNNConfig, train

    cfg = CNNConfig(
        num_envs=8, num_steps=4, num_minibatches=2, update_epochs=1,
        total_timesteps=8 * 4, num_devices=4, exp_folder=str(tmp_path),
    )
    params = train(cfg, verbose=False)
    for leaf in jax.tree.leaves(jax.device_get(params)):
        assert np.all(np.isfinite(leaf))
