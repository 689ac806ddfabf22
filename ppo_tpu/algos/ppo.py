"""Synchronous PPO, fully on-device: rollout scan + GAE + minibatched update.

TPU-native redesign of the reference train loop (src/ppo_continuous_action.cpp:375-585):
the entire iteration — num_steps of policy-forward + env physics, GAE, and
update_epochs x num_minibatches of clipped-surrogate SGD — is ONE jitted
function. The host loop only feeds iteration indices and drains metrics, so
there are no per-step host round-trips (the reference's `.to(device)` churn
disappears by construction).

Supports optional data-parallel sharding over a device mesh: envs sharded along
the mesh axis, params replicated, gradient pmean inside the update (replacing
torchfort::Comm allreduce, ac_ppo_continuous_action.cpp:874-888).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ppo_tpu.config import PPOConfig
from ppo_tpu.envs.vector import VectorEnv, VectorState
from ppo_tpu.ops.gae import compute_gae
from ppo_tpu.ops.ppo_loss import PPOStats, normalize_advantages, ppo_losses


@struct.dataclass
class RunnerState:
    params: Any
    opt_state: Any
    env: VectorState
    obs: jax.Array            # [N, D]
    done: jax.Array           # [N]
    key: jax.Array
    iteration: jax.Array      # int32


class IterationOut(NamedTuple):
    stats: PPOStats
    episode_return: jax.Array   # [T, N]
    episode_length: jax.Array   # [T, N]
    episode_done: jax.Array     # [T, N] bool
    mean_reward: jax.Array
    mean_return: jax.Array      # mean GAE return (losses/discounted_returns tag)
    nonfinite: jax.Array        # [] total divergence-guard activations so far


def make_optimizer(cfg: PPOConfig):
    """Adam(eps=1e-5) with grad-clip 0.5 applied before the update, and the
    reference's per-iteration linear LR anneal expressed as an optax schedule."""
    updates_per_iter = cfg.update_epochs * cfg.num_minibatches

    def schedule(count):
        it = count // updates_per_iter
        frac = 1.0 - it.astype(jnp.float32) / cfg.num_iterations
        return jnp.where(cfg.anneal_lr, frac, 1.0) * cfg.learning_rate

    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(learning_rate=schedule, eps=cfg.adam_eps),
    )


def current_lr(cfg: PPOConfig, iteration: int) -> float:
    frac = 1.0 - iteration / cfg.num_iterations
    return (frac if cfg.anneal_lr else 1.0) * cfg.learning_rate


def make_train_iteration(cfg: PPOConfig, venv: VectorEnv, model, optimizer, axis_name=None):
    """Build the jitted one-iteration function (collect + GAE + update)."""

    sample_kwargs = {}
    if cfg.agent == "beta" and cfg.sample_type != "sample":
        sample_kwargs = {"sample_type": cfg.sample_type}

    def rollout_step(carry, _):
        params, env_state, obs, done, key = carry
        key, k_act = jax.random.split(key)
        action, logprob, _, value = model.get_action_and_value(params, obs, k_act, **sample_kwargs)
        env_state, next_obs, reward, term, trunc, infos = venv.step(env_state, action)
        next_done = term | trunc
        transition = (obs, done, action, logprob, value, reward, infos)
        return (params, env_state, next_obs, next_done, key), transition

    def update_minibatch(carry, mb_inds):
        params, opt_state, b = carry
        b_obs, b_actions, b_logprobs, b_advantages, b_returns, b_values = b

        def loss_fn(p):
            _, newlogprob, entropy, newvalue = model.get_action_and_value(
                p, b_obs[mb_inds], action=b_actions[mb_inds]
            )
            adv = b_advantages[mb_inds]
            if cfg.norm_adv:
                adv = normalize_advantages(adv, axis_name=axis_name)
            stats = ppo_losses(
                newlogprob, b_logprobs[mb_inds], entropy, newvalue, b_values[mb_inds],
                adv, b_returns[mb_inds],
                cfg.clip_coef, cfg.ent_coef, cfg.vf_coef, cfg.clip_vloss,
            )
            return stats.total_loss, stats

        grads, stats = jax.grad(loss_fn, has_aux=True)(params)
        if axis_name is not None:
            # gradient average across data-parallel devices BEFORE clipping,
            # matching ac_ppo_continuous_action.cpp:874-888
            grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, b), stats

    def train_iteration(rs: RunnerState) -> tuple[RunnerState, IterationOut]:
        # ---- COLLECT (hot loop #1, ppo_continuous_action.cpp:387-434)
        carry = (rs.params, rs.env, rs.obs, rs.done, rs.key)
        carry, traj = jax.lax.scan(rollout_step, carry, None, length=cfg.num_steps)
        params, env_state, next_obs, next_done, key = carry
        obs, dones, actions, logprobs, values, rewards, infos = traj

        # ---- GAE (ppo_continuous_action.cpp:446-467)
        next_value = model.get_value(params, next_obs)
        advantages, returns = compute_gae(
            rewards, values, dones, next_value, next_done.astype(values.dtype),
            cfg.gamma, cfg.gae_lambda,
        )

        # ---- UPDATE (hot loop #2, ppo_continuous_action.cpp:489-542)
        obs_dim = obs.shape[-1]
        act_dim = actions.shape[-1]
        # in distributed use, cfg is the per-device config (num_envs = local envs)
        local_batch = cfg.num_steps * cfg.num_envs
        b = (
            obs.reshape(local_batch, obs_dim),
            actions.reshape(local_batch, act_dim),
            logprobs.reshape(local_batch),
            advantages.reshape(local_batch),
            returns.reshape(local_batch),
            values.reshape(local_batch),
        )
        mb_size = local_batch // cfg.num_minibatches

        def epoch_body(carry, key_epoch):
            params, opt_state = carry
            inds = jax.random.permutation(key_epoch, local_batch)
            mb_inds = inds.reshape(cfg.num_minibatches, mb_size)
            (params, opt_state, _), stats = jax.lax.scan(
                update_minibatch, (params, opt_state, b), mb_inds
            )
            return (params, opt_state), stats

        key, k_perm = jax.random.split(key)
        if axis_name is not None:
            # identical permutation on every device is NOT required (each device
            # shuffles its own shard, like per-rank train generators)
            k_perm = jax.random.fold_in(k_perm, jax.lax.axis_index(axis_name))
        epoch_keys = jax.random.split(k_perm, cfg.update_epochs)
        (params, opt_state), stats = jax.lax.scan(
            epoch_body, (rs.params, rs.opt_state), epoch_keys
        )
        last = jax.tree.map(lambda x: x[-1, -1], stats)  # last minibatch, like the reference logs

        new_rs = RunnerState(
            params=params, opt_state=opt_state, env=env_state,
            obs=next_obs, done=next_done, key=key, iteration=rs.iteration + 1,
        )
        out = IterationOut(
            stats=last,
            episode_return=infos["episode_return"],
            episode_length=infos["episode_length"],
            episode_done=infos["done"],
            mean_reward=jnp.mean(rewards),
            mean_return=jnp.mean(returns),
            nonfinite=jnp.sum(infos["nonfinite"][-1])
            if "nonfinite" in infos else jnp.zeros((), jnp.int32),
        )
        return new_rs, out

    return train_iteration


def init_runner_state(cfg: PPOConfig, venv: VectorEnv, model, optimizer, key) -> RunnerState:
    k_env, k_model, key = jax.random.split(key, 3)
    env_state, obs = venv.reset(k_env)
    params = model.init_params(k_model, venv.obs_dim, dtype=venv.dtype)
    opt_state = optimizer.init(params)
    return RunnerState(
        params=params, opt_state=opt_state, env=env_state, obs=obs,
        done=jnp.zeros(venv.num_envs, bool), key=key,
        iteration=jnp.zeros((), jnp.int32),
    )


def evaluate(cfg: PPOConfig, venv: VectorEnv, model, params, key, num_episodes=None,
             max_steps=1000, norm_state=None):
    """Final eval like ppo_continuous_action.cpp:589-626: keep the TRAINING
    normalization statistics (pass the final VectorState as `norm_state`),
    stochastic actions, run until num_eval_runs episodes finished (autoreset
    keeps collecting across episode boundaries)."""
    num_episodes = num_episodes or cfg.num_eval_runs
    state, obs = venv.reset(key, norm_state=norm_state)
    kwargs = {"sample_type": cfg.sample_type} if cfg.agent == "beta" and cfg.sample_type != "sample" else {}

    def eval_step(carry, _):
        state, obs, key = carry
        key, k = jax.random.split(key)
        action, _, _, _ = model.get_action_and_value(params, obs, k, **kwargs)
        state, obs, _, term, trunc, infos = venv.step(state, action)
        return (state, obs, key), (infos["episode_return"], infos["done"])

    # enough steps for num_episodes to finish even with a single env
    # (each episode after the first costs max_steps + 1: autoreset interposes
    # a non-counting reset step between episodes)
    rounds = -(-num_episodes // venv.num_envs)
    (_, _, _), (ep_returns, ep_done) = jax.lax.scan(
        eval_step, (state, obs, key), None, length=rounds * (max_steps + 1) + 1
    )
    returns = np.asarray(ep_returns)[np.asarray(ep_done)]
    return returns[:num_episodes]
