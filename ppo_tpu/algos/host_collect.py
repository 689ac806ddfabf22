"""Host-driven rollout collection for external environments, with DD-PPO
straggler preemption.

This is the faithful TPU-era port of the reference's AC-PPO collection
architecture (src/ac_ppo_continuous_action.cpp:604-698 and
src/carla/ac_ppo_carla.cpp): one collector THREAD per env, each running its
own sequential policy-forward -> env-step loop so a slow env does not block
fast ones; the only synchronization is the end-of-rollout barrier. On-device
lockstep vmap collection (algos/ac_ppo.py) replaces this for the built-in
physics envs, where per-env latency variance cannot exist; the host loop is
for EXTERNAL simulators (envs/external.py), whose step latency is whatever
the simulator process makes it — exactly the regime the DD-PPO trick targets.

DD-PPO preemption (off by default, like the reference, README.md:85-87):
  - each env thread polls the TCP counter store every step and breaks early
    when num_done / num_envs_global > dd_ppo_preempt_threshold and
    step > dd_ppo_min_perc * num_steps   (ac_ppo_continuous_action.cpp:680-693)
  - a finished thread increments the counter                      (:691-694)
  - the iteration trains on min_collected_steps rows; the zero-filled tail is
    excluded by masked GAE (ops/gae.py valid_steps) and minibatch indices are
    refilled by repeating valid ones      (:703-722, :805-810)

Episode statistics use next-step autoreset bookkeeping like SeqVectorEnvCarla
(gym.h:141-150): a step after termination|truncation resets and reports the
reset obs with reward 0 and flags false.
"""

from __future__ import annotations

import threading
from typing import Any, Callable

import numpy as np

from ppo_tpu.parallel.preempt import TCPStoreClient, should_preempt


class HostRollout:
    """numpy rollout buffers [T, N, ...] filled by the collector threads."""

    def __init__(self, num_steps, num_envs, obs_shape, n_meas, n_vmeas, act_dim):
        T, N = num_steps, num_envs
        self.bev = np.zeros((T, N) + tuple(obs_shape), np.uint8)
        self.measurements = np.zeros((T, N, n_meas), np.float32)
        self.value_measurements = np.zeros((T, N, n_vmeas), np.float32)
        self.dones = np.zeros((T, N), bool)
        self.actions = np.zeros((T, N, act_dim), np.float32)
        self.logprobs = np.zeros((T, N), np.float32)
        self.values = np.zeros((T, N), np.float32)
        self.rewards = np.zeros((T, N), np.float32)
        self.next_bev = np.zeros((N,) + tuple(obs_shape), np.uint8)
        self.next_measurements = np.zeros((N, n_meas), np.float32)
        self.next_value_measurements = np.zeros((N, n_vmeas), np.float32)
        self.next_done = np.zeros((N,), bool)


class HostCollector:
    """Per-env collector threads over external envs.

    policy_fn(obs_dict, env_index, step) -> (action [act_dim] f32,
    logprob f32, value f32); it is called from worker threads (JAX dispatch is
    thread-safe; each call is a batch-1 forward like the reference's
    per-thread agent calls, ac_ppo_continuous_action.cpp:655).
    """

    def __init__(self, envs, cfg, num_envs_global=None, store: TCPStoreClient | None = None):
        self.envs = envs
        self.cfg = cfg
        self.store = store
        self.num_envs_global = num_envs_global or len(envs)
        self._obs = [None] * len(envs)           # persistent across iterations
        self._autoreset = [False] * len(envs)
        self._ep_ret = [0.0] * len(envs)
        self._ep_len = [0] * len(envs)
        self.episode_returns: list[float] = []   # drained each iteration
        self.episode_lengths: list[int] = []
        self._stats_lock = threading.Lock()

    def reset_all(self, seed: int = 0):
        for i, env in enumerate(self.envs):
            self._obs[i] = env.reset(seed + i)   # seed+i like gym.h:104-112
            self._autoreset[i] = False

    def _preempt(self, step: int) -> bool:
        if self.store is None:
            return False
        cfg = self.cfg
        min_steps = round(cfg.dd_ppo_min_perc * cfg.num_steps)
        return step > min_steps and should_preempt(
            self.store, self.num_envs_global, cfg.dd_ppo_preempt_threshold
        )

    def collect(self, policy_fn: Callable, rollout: HostRollout) -> int:
        """Fill `rollout`; returns min_collected_steps over envs."""
        cfg = self.cfg
        steps_collected = [cfg.num_steps] * len(self.envs)

        def worker(i: int):
            env = self.envs[i]
            obs = self._obs[i]
            step = 0
            for step in range(cfg.num_steps):
                rollout.bev[step, i] = obs.bev_semantics
                rollout.measurements[step, i] = obs.measurements
                rollout.value_measurements[step, i] = obs.value_measurements
                rollout.dones[step, i] = self._autoreset[i]

                action, logprob, value = policy_fn(obs, i, step)
                rollout.actions[step, i] = action
                rollout.logprobs[step, i] = logprob
                rollout.values[step, i] = value

                if self._autoreset[i]:
                    # next-step autoreset (gym.h:141-150): reset obs, reward 0
                    obs = env.reset()
                    reward, term, trunc = 0.0, False, False
                    self._autoreset[i] = False
                    self._ep_ret[i], self._ep_len[i] = 0.0, 0
                else:
                    obs, reward, term, trunc = env.step(action)
                    self._ep_ret[i] += reward
                    self._ep_len[i] += 1
                    if term or trunc:
                        self._autoreset[i] = True
                        with self._stats_lock:
                            self.episode_returns.append(self._ep_ret[i])
                            self.episode_lengths.append(self._ep_len[i])
                rollout.rewards[step, i] = reward

                if self.store is not None and self._preempt(step):
                    step += 1
                    break
            else:
                step = cfg.num_steps
            if self.store is not None:
                self.store.increment()
            steps_collected[i] = step
            self._obs[i] = obs
            rollout.next_bev[i] = obs.bev_semantics
            rollout.next_measurements[i] = obs.measurements
            rollout.next_value_measurements[i] = obs.value_measurements
            rollout.next_done[i] = self._autoreset[i]

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(self.envs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()                              # end-of-rollout barrier (:706)
        return min(steps_collected)

    def drain_stats(self):
        with self._stats_lock:
            rets, lens = self.episode_returns, self.episode_lengths
            self.episode_returns, self.episode_lengths = [], []
        return rets, lens
