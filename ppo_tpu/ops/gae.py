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
) -> tuple[jax.Array, jax.Array]:
    """Returns (advantages [T, N], returns [T, N]).

    delta_t = r_t + gamma * V_{t+1} * (1 - done_{t+1}) - V_t
    A_t     = delta_t + gamma * lambda * (1 - done_{t+1}) * A_{t+1}
    returns = A + V                       (ppo_continuous_action.cpp:453-466)
    """
    dones = dones.astype(values.dtype)
    next_done = next_done.astype(values.dtype)

    # next_{value,done} for each t: shift by one, bootstrap at the end.
    nextvalues = jnp.concatenate([values[1:], next_value[None]], axis=0)
    nextnonterminal = 1.0 - jnp.concatenate([dones[1:], next_done[None]], axis=0)
    deltas = rewards + gamma * nextvalues * nextnonterminal - values

    def scan_fn(lastgaelam, inp):
        delta, nnt = inp
        adv = delta + gamma * gae_lambda * nnt * lastgaelam
        return adv, adv

    _, advantages = jax.lax.scan(
        scan_fn,
        jnp.zeros_like(next_value),
        (deltas, nextnonterminal),
        reverse=True,
    )
    return advantages, advantages + values
