"""Generalized Advantage Estimation as a reversed `lax.scan`.

TPU-native re-design of the reference's reverse Python loop, duplicated at
src/ppo_continuous_action.cpp:446-467, src/ac_ppo_continuous_action.cpp:758-779 and
src/carla/ac_ppo_carla.cpp:483-504. The whole scan compiles to one fused XLA loop,
so it runs on-device over [T, N] rollout buffers with no host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(
    rewards: jax.Array,      # [T, N]
    values: jax.Array,       # [T, N]
    dones: jax.Array,        # [T, N]  (done *before* step t's obs, CleanRL convention)
    next_value: jax.Array,   # [N]
    next_done: jax.Array,    # [N]
    gamma: float,
    gae_lambda: float,
    valid_steps=None,
) -> tuple[jax.Array, jax.Array]:
    """Returns (advantages [T, N], returns [T, N]).

    delta_t = r_t + gamma * V_{t+1} * (1 - done_{t+1}) - V_t
    A_t     = delta_t + gamma * lambda * (1 - done_{t+1}) * A_{t+1}
    returns = A + V                       (ppo_continuous_action.cpp:453-466)

    `valid_steps` (DD-PPO preemption, traced scalar or None): rows t >=
    valid_steps were never collected. The reference starts the backward scan
    at min_collected_steps-1 over zero-filled storage and only bootstraps
    next_value at t == num_steps-1, so a truncated rollout bootstraps from a
    ZERO value (ac_ppo_continuous_action.cpp:758-779 incl. the documented
    quirk). Reproduced here by zeroing the inputs and the scan carry for
    invalid rows: at t = valid_steps-1 the delta sees values[t+1] = 0,
    dones[t+1] = 0 and an incoming carry of 0 — exactly the reference's
    start-of-scan state.
    """
    dones = dones.astype(values.dtype)
    next_done = next_done.astype(values.dtype)
    T = rewards.shape[0]

    if valid_steps is not None:
        vmask = (jnp.arange(T) < valid_steps).astype(values.dtype)[:, None]
        rewards = rewards * vmask
        values = values * vmask
        dones = dones * vmask

    # next_{value,done} for each t: shift by one, bootstrap at the end.
    nextvalues = jnp.concatenate([values[1:], next_value[None]], axis=0)
    nextnonterminal = 1.0 - jnp.concatenate([dones[1:], next_done[None]], axis=0)
    deltas = rewards + gamma * nextvalues * nextnonterminal - values

    if valid_steps is not None:
        deltas = deltas * vmask

    def scan_fn(lastgaelam, inp):
        delta, nnt, m = inp
        adv = (delta + gamma * gae_lambda * nnt * lastgaelam) * m
        return adv, adv

    mask_col = (
        vmask if valid_steps is not None else jnp.ones((T, 1), values.dtype)
    ) * jnp.ones_like(rewards)
    _, advantages = jax.lax.scan(
        scan_fn,
        jnp.zeros_like(next_value),
        (deltas, nextnonterminal, mask_col),
        reverse=True,
    )
    return advantages, advantages + values
