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


def test_gae_preempted_valid_steps_matches_reference_quirk():
    """DD-PPO truncated rollouts (ac_ppo_continuous_action.cpp:758-779): the
    backward scan starts at min_collected_steps-1 over zero-filled storage and
    bootstraps next_value ONLY at t == num_steps-1 — a truncated rollout
    bootstraps from a zero value. compute_gae(valid_steps=...) must reproduce
    that exactly, including zero rows for the uncollected tail."""
    rng = np.random.default_rng(3)
    T, N, valid = 12, 4, 7
    gamma, lam = 0.99, 0.95
    rewards = rng.normal(size=(T, N))
    values = rng.normal(size=(T, N))
    dones = (rng.random((T, N)) < 0.15).astype(np.float64)
    next_value = rng.normal(size=N)
    next_done = (rng.random(N) < 0.1).astype(np.float64)
    # zero-filled storage beyond the collected rows, like the reference's
    # preallocated tensors
    rewards[valid:] = 0.0
    values[valid:] = 0.0
    dones[valid:] = 0.0

    ref_adv = np.zeros((T, N))
    lastgaelam = np.zeros(N)
    for t in reversed(range(valid)):
        if t == T - 1:
            nnt = 1.0 - next_done
            nv = next_value
        else:
            nnt = 1.0 - dones[t + 1]
            nv = values[t + 1]
        delta = rewards[t] + gamma * nv * nnt - values[t]
        lastgaelam = delta + gamma * lam * nnt * lastgaelam
        ref_adv[t] = lastgaelam

    adv, ret = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(next_value), jnp.asarray(next_done), gamma, lam,
        valid_steps=jnp.int32(valid),
    )
    np.testing.assert_allclose(np.asarray(adv), ref_adv, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ret), ref_adv + values, rtol=1e-10, atol=1e-12)

    # valid_steps == T must equal the unpreempted path
    a0, r0 = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(next_value), jnp.asarray(next_done), gamma, lam,
    )
    a1, r1 = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(next_value), jnp.asarray(next_done), gamma, lam,
        valid_steps=jnp.int32(T),
    )
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), atol=1e-12)
