"""AC-PPO: asynchronous-collection PPO re-designed as pipelined rollout/update.

The reference (src/ac_ppo_continuous_action.cpp) hides env latency with
per-env collector threads on private CUDA streams (lines 604-698). On TPU,
lockstep vmap stepping removes per-env latency variance entirely, so the
asynchrony that remains worth exploiting is between COLLECTION and UPDATE:

    collect(theta_k)  ||  update with rollout_{k-1}  ->  theta_{k+1}

Both are independent jitted computations (the update consumes the previous
iteration's rollout, exactly the policy-staleness AC-PPO accepts when its
actors keep sampling while the learner steps), so XLA can overlap them across
devices of a mesh, and the host never blocks between them. With
`pipelined=False` the same code degenerates to the synchronous order.

Also provides the reference's --estimate_mean_std pass
(ac_ppo_continuous_action.cpp:956-963).
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
from ppo_tpu.ops.ppo_loss import normalize_advantages, ppo_losses


class Rollout(NamedTuple):
    obs: jax.Array        # [T, N, D]
    dones: jax.Array      # [T, N]
    actions: jax.Array
    logprobs: jax.Array
    values: jax.Array
    rewards: jax.Array
    next_obs: jax.Array   # [N, D]
    next_done: jax.Array  # [N]
    infos: dict


def make_collect_fn(cfg: PPOConfig, venv: VectorEnv, model):
    sample_kwargs = {"sample_type": cfg.sample_type} if cfg.agent == "beta" and cfg.sample_type != "sample" else {}

    def collect(params, env_state, obs, done, key):
        def step(carry, _):
            env_state, obs, done, key = carry
            key, k = jax.random.split(key)
            action, logprob, _, value = model.get_action_and_value(params, obs, k, **sample_kwargs)
            env_state, next_obs, reward, term, trunc, infos = venv.step(env_state, action)
            return (env_state, next_obs, term | trunc, key), (obs, done, action, logprob, value, reward, infos)

        (env_state, next_obs, next_done, key), tr = jax.lax.scan(
            step, (env_state, obs, done, key), None, length=cfg.num_steps
        )
        obs_t, dones, actions, logprobs, values, rewards, infos = tr
        return env_state, next_obs, next_done, key, Rollout(
            obs=obs_t, dones=dones, actions=actions, logprobs=logprobs,
            values=values, rewards=rewards, next_obs=next_obs, next_done=next_done,
            infos=infos,
        )

    return collect


def make_update_fn(cfg: PPOConfig, model, optimizer, axis_name=None):
    def update(params, opt_state, rollout: Rollout, key):
        next_value = model.get_value(params, rollout.next_obs)
        advantages, returns = compute_gae(
            rollout.rewards, rollout.values, rollout.dones,
            next_value, rollout.next_done.astype(rollout.values.dtype),
            cfg.gamma, cfg.gae_lambda,
        )
        local_batch = rollout.obs.shape[0] * rollout.obs.shape[1]
        b = (
            rollout.obs.reshape(local_batch, -1),
            rollout.actions.reshape(local_batch, -1),
            rollout.logprobs.reshape(local_batch),
            advantages.reshape(local_batch),
            returns.reshape(local_batch),
            rollout.values.reshape(local_batch),
        )
        mb_size = local_batch // cfg.num_minibatches

        def update_minibatch(carry, mb_inds):
            params, opt_state = carry
            b_obs, b_actions, b_logprobs, b_adv, b_ret, b_val = b

            def loss_fn(p):
                _, newlogprob, entropy, newvalue = model.get_action_and_value(
                    p, b_obs[mb_inds], action=b_actions[mb_inds]
                )
                adv = b_adv[mb_inds]
                if cfg.norm_adv:
                    adv = normalize_advantages(adv, axis_name=axis_name)
                stats = ppo_losses(
                    newlogprob, b_logprobs[mb_inds], entropy, newvalue, b_val[mb_inds],
                    adv, b_ret[mb_inds], cfg.clip_coef, cfg.ent_coef, cfg.vf_coef, cfg.clip_vloss,
                )
                return stats.total_loss, stats

            grads, stats = jax.grad(loss_fn, has_aux=True)(params)
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), stats

        def epoch_body(carry, k_epoch):
            inds = jax.random.permutation(k_epoch, local_batch)
            return jax.lax.scan(update_minibatch, carry, inds.reshape(cfg.num_minibatches, mb_size))

        keys = jax.random.split(key, cfg.update_epochs)
        (params, opt_state), stats = jax.lax.scan(epoch_body, (params, opt_state), keys)
        return params, opt_state, jax.tree.map(lambda x: x[-1, -1], stats)

    return update


def estimate_mean_std(cfg: PPOConfig, venv: VectorEnv, model, params, key, num_steps=10_000):
    """Collect observations under the current policy and report per-dim
    mean/std for baking into the Beta agent (--estimate_mean_std equivalent)."""
    state, obs = venv.reset(key)

    def step(carry, _):
        state, obs, key = carry
        key, k = jax.random.split(key)
        action, _, _, _ = model.get_action_and_value(params, obs, k)
        state, next_obs, _, _, _, _ = venv.step(state, action)
        return (state, next_obs, key), obs

    (_, _, _), all_obs = jax.lax.scan(step, (state, obs, key), None, length=num_steps)
    flat = all_obs.reshape(-1, all_obs.shape[-1])
    mean = np.asarray(jnp.mean(flat, 0))
    std = np.asarray(jnp.std(flat, 0)).copy()  # asarray of a jax array is read-only
    # constant features estimate to std 0; emit 1 so the baked divide is safe
    # (the reference's table keeps the zeros and NaNs on Humanoid, see
    # hardcoded_obs_stats.get_obs_stats)
    std[std < 1e-8] = 1.0
    return mean, std
