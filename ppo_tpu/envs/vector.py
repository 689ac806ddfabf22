"""Vectorized env: lockstep vmap stepping, next-step autoreset, wrappers.

Functional re-design of the reference's vector-env + wrapper stack:
  - SeqVectorEnv/ParVectorEnv (gym.h:75-164, 276-366): N lockstep env instances
    under vmap instead of serial loops / thread pools; action clipping to the
    action space (gym.h:133-139); next-step autoreset — the step after
    termination|truncation returns the reset obs with reward 0 and flags false
    (gym.h:141-150).
  - RecordEpisodeStatistics (wrappers/common.h:48-65): per-env return/length,
    emitted as masked arrays in `infos` on episode end, accumulated on RAW
    rewards (the wrapper sits innermost in the reference chain).
  - NormalizeObservation + clip (stateful_observation.h; applied per env with
    independent statistics, updated also on autoreset observations).
  - NormalizeReward + clip (stateful_reward.h; the discounted accumulator is
    NOT reset on autoreset, matching the reference where reset() skips it).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ppo_tpu.envs.mujoco_envs import EnvState, MujocoEnv
from ppo_tpu.ops.running_stats import RewardNormState, RunningMeanStd


@struct.dataclass
class VectorState:
    env: EnvState                       # batched [N, ...]
    autoreset: jax.Array                # [N] bool
    ep_return: jax.Array                # [N]
    ep_length: jax.Array                # [N] int32
    obs_rms: Any                        # RunningMeanStd [N, obs] or None
    rew_norm: Any                       # RewardNormState [N] or None
    consts: Any = None                  # device-resident model constants (unbatched)


class VectorEnv:
    def __init__(
        self,
        env: MujocoEnv,
        num_envs: int,
        clip_actions: bool = True,
        normalize_obs: bool = False,
        clip_obs: float = 10.0,
        normalize_reward: bool = False,
        gamma: float = 0.99,
        clip_reward: float = 10.0,
    ):
        self.env = env
        self.num_envs = num_envs
        self.clip_actions = clip_actions
        self.normalize_obs = normalize_obs
        self.clip_obs = clip_obs
        self.normalize_reward = normalize_reward
        self.gamma = gamma
        self.clip_reward = clip_reward
        self.obs_dim = env.obs_dim
        self.act_dim = env.act_dim
        self.dtype = env.dtype

    def reset(self, key: jax.Array, norm_state: "VectorState | None" = None):
        """`norm_state`: a previous VectorState whose normalizer statistics are
        carried over (the reference reuses TRAINING envs for eval precisely to
        keep these, ppo_continuous_action.cpp:595-599)."""
        keys = jax.random.split(key, self.num_envs)
        consts = self.env.consts
        env_state, obs = jax.vmap(self.env.reset, in_axes=(0, None))(keys, consts)
        obs_rms = None
        if self.normalize_obs:
            if norm_state is not None and norm_state.obs_rms is not None:
                obs_rms = norm_state.obs_rms
            else:
                obs_rms = RunningMeanStd.create((self.num_envs, self.obs_dim), dtype=self.dtype)
            obs_rms = obs_rms.update(obs)
            obs = jnp.clip(obs_rms.normalize(obs), -self.clip_obs, self.clip_obs)
        if not self.normalize_reward:
            rew_norm = None
        elif norm_state is not None and norm_state.rew_norm is not None:
            rew_norm = norm_state.rew_norm
        else:
            rew_norm = RewardNormState.create(self.num_envs, self.gamma, dtype=self.dtype)
        state = VectorState(
            env=env_state,
            autoreset=jnp.zeros(self.num_envs, bool),
            ep_return=jnp.zeros(self.num_envs, self.dtype),
            ep_length=jnp.zeros(self.num_envs, jnp.int32),
            obs_rms=obs_rms,
            rew_norm=rew_norm,
            consts=consts,
        )
        return state, obs

    def step(self, state: VectorState, actions: jax.Array):
        if self.clip_actions:
            actions = jnp.clip(actions, self.env.action_low, self.env.action_high)

        # stepped branch: MujocoEnv.step_batch runs the physics substeps in
        # lane-major layout (physics/lanes.py) — identical semantics to
        # vmap(step), bandwidth-optimal on TPU
        if hasattr(self.env, "step_batch"):
            new_env, obs_s, rew_s, term_s, trunc_s = self.env.step_batch(
                state.env, actions, state.consts
            )
        else:
            new_env, obs_s, rew_s, term_s, trunc_s = jax.vmap(
                self.env.step, in_axes=(0, 0, None)
            )(state.env, actions, state.consts)

        ar = state.autoreset

        def sel(a, b):  # a where autoreset else b
            m = ar.reshape((self.num_envs,) + (1,) * (a.ndim - 1))
            return jnp.where(m, a, b)

        # reset branch (autoreset rows): only computed when some env actually
        # autoresets (lax.cond). The unconditional version recomputed a full
        # env.reset — an entire forward pipeline — for all N envs on EVERY
        # step (~1/6 of all physics work thrown away); with 1000-step episodes
        # most steps have no resetting env at small/medium N, so the branch is
        # skipped. Identical results: reset keys are a pure function of the
        # per-env keys stored at each env's previous reset.
        def with_reset(env_stepped, obs_stepped):
            reset_keys = jax.vmap(lambda k: jax.random.split(k)[1])(state.env.key)
            reset_env, obs_r = jax.vmap(self.env.reset, in_axes=(0, None))(
                reset_keys, state.consts
            )
            merged = jax.tree.map(sel, reset_env, env_stepped)
            if getattr(env_stepped, "nonfinite", None) is not None:
                # the divergence counter is run-cumulative observability
                # state, not episode state: survive the autoreset wipe
                merged = merged.replace(nonfinite=env_stepped.nonfinite)
            return merged, sel(obs_r, obs_stepped)

        def without_reset(env_stepped, obs_stepped):
            return env_stepped, obs_stepped

        env_state, raw_obs = jax.lax.cond(
            jnp.any(ar), with_reset, without_reset, new_env, obs_s
        )
        raw_rew = jnp.where(ar, 0.0, rew_s).astype(self.dtype)
        term = jnp.where(ar, False, term_s)
        trunc = jnp.where(ar, False, trunc_s)
        done = term | trunc

        # episode statistics on raw rewards; autoreset rows start fresh
        ep_return = jnp.where(ar, 0.0, state.ep_return) + raw_rew
        ep_length = jnp.where(ar, 0, state.ep_length) + jnp.where(ar, 0, 1)
        infos = {
            "episode_return": ep_return,
            "episode_length": ep_length,
            "done": done,
        }
        if getattr(env_state, "nonfinite", None) is not None:
            infos["nonfinite"] = env_state.nonfinite   # [N] cumulative guard hits
        # zero the accumulators after emission
        ep_return_next = jnp.where(done, 0.0, ep_return).astype(self.dtype)
        ep_length_next = jnp.where(done, 0, ep_length)

        obs = raw_obs
        obs_rms = state.obs_rms
        if self.normalize_obs:
            obs_rms = obs_rms.update(raw_obs)  # updated on every obs incl. resets
            obs = jnp.clip(obs_rms.normalize(raw_obs), -self.clip_obs, self.clip_obs)

        rew = raw_rew
        rew_norm = state.rew_norm
        if self.normalize_reward:
            # the reference skips the normalizer entirely on autoreset rows
            stepped_norm, rew_n = rew_norm.step(raw_rew, term.astype(self.dtype))
            rew_norm = jax.tree.map(lambda a, b: jnp.where(ar.reshape(ar.shape + (1,) * (a.ndim - 1)), a, b), rew_norm, stepped_norm)
            rew = jnp.where(ar, 0.0, jnp.clip(rew_n, -self.clip_reward, self.clip_reward))

        next_state = VectorState(
            env=env_state,
            autoreset=done,
            ep_return=ep_return_next,
            ep_length=ep_length_next,
            obs_rms=obs_rms,
            rew_norm=rew_norm,
            consts=state.consts,
        )
        return next_state, obs, rew, term, trunc, infos


@struct.dataclass
class DictVectorState:
    env: Any
    autoreset: jax.Array
    ep_return: jax.Array
    ep_length: jax.Array


class DictVectorEnv:
    """Vectorized autoreset + episode stats for dict-observation envs
    (the SeqVectorEnvCarla analogue, gym.h:167-272; no normalization wrappers —
    the CARLA pipeline bakes statistics into the model instead)."""

    def __init__(self, env, num_envs: int, clip_actions: bool = True):
        self.env = env
        self.num_envs = num_envs
        self.clip_actions = clip_actions
        self.dtype = env.dtype

    def reset(self, key):
        keys = jax.random.split(key, self.num_envs)
        env_state, obs = jax.vmap(self.env.reset)(keys)
        state = DictVectorState(
            env=env_state,
            autoreset=jnp.zeros(self.num_envs, bool),
            ep_return=jnp.zeros(self.num_envs, self.dtype),
            ep_length=jnp.zeros(self.num_envs, jnp.int32),
        )
        return state, obs

    def step(self, state: DictVectorState, actions):
        if self.clip_actions:
            actions = jnp.clip(actions, self.env.action_low, self.env.action_high)
        new_env, obs_s, rew_s, term_s, trunc_s = jax.vmap(self.env.step)(state.env, actions)

        ar = state.autoreset

        def sel(a, b):
            m = ar.reshape((self.num_envs,) + (1,) * (a.ndim - 1))
            return jnp.where(m, a, b)

        # see VectorEnv.step: the reset branch only runs when a row autoresets
        def with_reset(env_stepped, obs_stepped):
            reset_keys = jax.vmap(lambda k: jax.random.split(k)[1])(state.env.key)
            reset_env, obs_r = jax.vmap(self.env.reset)(reset_keys)
            return (
                jax.tree.map(sel, reset_env, env_stepped),
                jax.tree.map(sel, obs_r, obs_stepped),
            )

        def without_reset(env_stepped, obs_stepped):
            return env_stepped, obs_stepped

        env_state, obs = jax.lax.cond(
            jnp.any(ar), with_reset, without_reset, new_env, obs_s
        )
        rew = jnp.where(ar, 0.0, rew_s).astype(self.dtype)
        term = jnp.where(ar, False, term_s)
        trunc = jnp.where(ar, False, trunc_s)
        done = term | trunc

        ep_return = jnp.where(ar, 0.0, state.ep_return) + rew
        ep_length = jnp.where(ar, 0, state.ep_length) + jnp.where(ar, 0, 1)
        infos = {"episode_return": ep_return, "episode_length": ep_length, "done": done}
        next_state = DictVectorState(
            env=env_state, autoreset=done,
            ep_return=jnp.where(done, 0.0, ep_return).astype(self.dtype),
            ep_length=jnp.where(done, 0, ep_length),
        )
        return next_state, obs, rew, term, trunc, infos
