"""GAE scan vs a straight numpy port of the reference loop (ppo_continuous_action.cpp:446-467)."""

import jax.numpy as jnp
import numpy as np

from ppo_tpu.ops import compute_gae


def reference_gae(rewards, values, dones, next_value, next_done, gamma, lam):
    T, N = rewards.shape
    advantages = np.zeros_like(rewards)
    lastgaelam = np.zeros(N)
    for t in range(T - 1, -1, -1):
        if t == T - 1:
            nextnonterminal = 1.0 - next_done
            nextvalues = next_value
        else:
            nextnonterminal = 1.0 - dones[t + 1]
            nextvalues = values[t + 1]
        delta = rewards[t] + gamma * nextvalues * nextnonterminal - values[t]
        advantages[t] = delta + gamma * lam * nextnonterminal * lastgaelam
        lastgaelam = advantages[t]
    return advantages, advantages + values


def test_gae_matches_reference_loop():
    rng = np.random.default_rng(0)
    T, N = 64, 7
    rewards = rng.normal(size=(T, N))
    values = rng.normal(size=(T, N))
    dones = (rng.random((T, N)) < 0.1).astype(np.float64)
    next_value = rng.normal(size=N)
    next_done = (rng.random(N) < 0.1).astype(np.float64)

    ref_adv, ref_ret = reference_gae(rewards, values, dones, next_value, next_done, 0.99, 0.95)
    adv, ret = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(next_value), jnp.asarray(next_done), 0.99, 0.95,
    )
    np.testing.assert_allclose(np.asarray(adv), ref_adv, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ret), ref_ret, rtol=1e-10, atol=1e-12)


def test_gae_no_dones_equals_discounted_td():
    T, N = 5, 1
    rewards = np.ones((T, N))
    values = np.zeros((T, N))
    adv, ret = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.zeros((T, N)),
        jnp.zeros(N), jnp.zeros(N), 1.0, 1.0,
    )
    np.testing.assert_allclose(np.asarray(adv)[:, 0], [5, 4, 3, 2, 1])
