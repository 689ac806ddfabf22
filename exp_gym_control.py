"""Control experiment: our PPO update + policy against GYMNASIUM's real
MuJoCo envs (CleanRL's exact stack: SyncVectorEnv + Normalize wrappers).

If this control reproduces the same learning curve as ppo_tpu's on-device
training at the same config, the algorithm implementation and hyperparameters
are sound and any return gap vs published CleanRL numbers is environment/
version/schedule reality — isolating physics fidelity from algorithm bugs.

Usage: python exp_gym_control.py Ant-v5 8 256 1000000 [seed]
"""
import sys
import time

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from ppo_tpu.config import PPOConfig
from ppo_tpu.models import GaussianActorCritic
from ppo_tpu.ops.gae import compute_gae
from ppo_tpu.ops.ppo_loss import normalize_advantages, ppo_losses

env_id = sys.argv[1] if len(sys.argv) > 1 else "Ant-v5"
num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
num_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 256
total = int(sys.argv[4]) if len(sys.argv) > 4 else 1_000_000
seed = int(sys.argv[5]) if len(sys.argv) > 5 else 1

cfg = PPOConfig(env_id=env_id, num_envs=num_envs, num_steps=num_steps,
                total_timesteps=total, seed=seed)


def make_one(i):
    def thunk():
        e = gym.make(env_id)
        e = gym.wrappers.RecordEpisodeStatistics(e)
        e = gym.wrappers.ClipAction(e)
        e = gym.wrappers.NormalizeObservation(e)
        e = gym.wrappers.TransformObservation(
            e, lambda o: np.clip(o, -10, 10), e.observation_space)
        e = gym.wrappers.NormalizeReward(e, gamma=cfg.gamma)
        e = gym.wrappers.TransformReward(e, lambda r: float(np.clip(r, -10, 10)))
        return e
    return thunk


envs = gym.vector.SyncVectorEnv([make_one(i) for i in range(num_envs)])
obs_dim = envs.single_observation_space.shape[0]
act_dim = envs.single_action_space.shape[0]

model = GaussianActorCritic(act_dim=act_dim)
import optax
from ppo_tpu.algos import ppo as ppo_algo

optimizer = ppo_algo.make_optimizer(cfg)
params = model.init_params(jax.random.PRNGKey(seed), obs_dim)
opt_state = optimizer.init(params)

act_fn = jax.jit(lambda p, o, k: model.get_action_and_value(p, o, k))
val_fn = jax.jit(model.get_value)


@jax.jit
def update(params, opt_state, b_obs, b_act, b_logp, b_adv, b_ret, b_val, key):
    B = b_obs.shape[0]
    mb = B // cfg.num_minibatches

    def mb_step(carry, inds):
        params, opt_state = carry

        def loss_fn(p):
            _, nlp, ent, nv = model.get_action_and_value(p, b_obs[inds], action=b_act[inds])
            adv = normalize_advantages(b_adv[inds])
            st = ppo_losses(nlp, b_logp[inds], ent, nv, b_val[inds], adv, b_ret[inds],
                            cfg.clip_coef, cfg.ent_coef, cfg.vf_coef, cfg.clip_vloss)
            return st.total_loss, st

        grads, st = jax.grad(loss_fn, has_aux=True)(params)
        upd, opt_state = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, upd), opt_state), st

    def epoch(carry, k):
        inds = jax.random.permutation(k, B).reshape(cfg.num_minibatches, mb)
        return jax.lax.scan(mb_step, carry, inds)

    (params, opt_state), st = jax.lax.scan(
        epoch, (params, opt_state), jax.random.split(key, cfg.update_epochs))
    return params, opt_state, jax.tree.map(lambda x: x[-1, -1], st)


key = jax.random.PRNGKey(seed + 100)
next_obs, _ = envs.reset(seed=seed)
next_obs = next_obs.astype(np.float32)
next_done = np.zeros(num_envs, np.float32)
returns_log = []
start = time.time()
gstep = 0
for it in range(1, cfg.num_iterations + 1):
    obs_buf = np.zeros((num_steps, num_envs, obs_dim), np.float32)
    act_buf = np.zeros((num_steps, num_envs, act_dim), np.float32)
    logp_buf = np.zeros((num_steps, num_envs), np.float32)
    val_buf = np.zeros((num_steps, num_envs), np.float32)
    rew_buf = np.zeros((num_steps, num_envs), np.float32)
    done_buf = np.zeros((num_steps, num_envs), np.float32)
    for t in range(num_steps):
        obs_buf[t] = next_obs
        done_buf[t] = next_done
        key, k = jax.random.split(key)
        a, lp, _, v = act_fn(params, jnp.asarray(next_obs), k)
        a = np.asarray(a)
        act_buf[t], logp_buf[t], val_buf[t] = a, np.asarray(lp), np.asarray(v)
        next_obs, r, term, trunc, infos = envs.step(a)
        next_obs = next_obs.astype(np.float32)
        rew_buf[t] = r
        next_done = (term | trunc).astype(np.float32)
        gstep += num_envs
        if "episode" in infos:
            for rr in np.asarray(infos["episode"]["r"])[np.asarray(infos["_episode"])]:
                returns_log.append((gstep, float(rr)))
    nv = val_fn(params, jnp.asarray(next_obs))
    adv, ret = compute_gae(
        jnp.asarray(rew_buf), jnp.asarray(val_buf), jnp.asarray(done_buf),
        nv, jnp.asarray(next_done), cfg.gamma, cfg.gae_lambda)
    key, ku = jax.random.split(key)
    B = num_steps * num_envs
    params, opt_state, st = update(
        params, opt_state,
        jnp.asarray(obs_buf.reshape(B, -1)), jnp.asarray(act_buf.reshape(B, -1)),
        jnp.asarray(logp_buf.reshape(B)), adv.reshape(B), ret.reshape(B),
        jnp.asarray(val_buf.reshape(B)), ku)
    if it % 10 == 0 or it == cfg.num_iterations:
        recent = [r for _, r in returns_log[-20:]]
        print(f"iter {it}/{cfg.num_iterations} gstep {gstep} "
              f"SPS {int(gstep/(time.time()-start))} "
              f"recent_return {np.mean(recent) if recent else float('nan'):.1f}",
              flush=True)
print("last50:", np.mean([r for _, r in returns_log[-50:]]))
