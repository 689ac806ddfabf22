"""Running-stat wrappers vs straight ports of the reference C++ update rules."""

import jax.numpy as jnp
import numpy as np

from ppo_tpu.ops import RewardNormState, RunningMeanStd


def reference_obs_update(mean, var, count, x):
    # stateful_observation.h:64-84 with batch_count=1, batch_var=0
    delta = x - mean
    tot = count + 1.0
    new_mean = mean + delta / tot
    m2 = var * count + delta * delta * count / tot
    return new_mean, m2 / tot, tot


def test_running_mean_std_matches_reference():
    rng = np.random.default_rng(3)
    D = 5
    mean, var, count = np.zeros(D), np.ones(D), 1e-4
    state = RunningMeanStd.create((D,))
    for _ in range(100):
        x = rng.normal(size=D) * 3 + 1
        mean, var, count = reference_obs_update(mean, var, count, x)
        state = state.update(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(state.mean), mean, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(state.var), var, rtol=1e-10)
    np.testing.assert_allclose(float(state.count), count, rtol=1e-10)
    # normalize
    x = rng.normal(size=D)
    np.testing.assert_allclose(
        np.asarray(state.normalize(jnp.asarray(x))),
        (x - mean) / np.sqrt(var + 1e-4),
        rtol=1e-10,
    )


def test_running_mean_std_batched_env_axis():
    # per-env independent stats: [N, D]
    rng = np.random.default_rng(4)
    N, D = 3, 2
    state = RunningMeanStd.create((N, D))
    xs = rng.normal(size=(50, N, D))
    for x in xs:
        state = state.update(jnp.asarray(x))
    for i in range(N):
        mean, var, count = np.zeros(D), np.ones(D), 1e-4
        for x in xs[:, i]:
            mean, var, count = reference_obs_update(mean, var, count, x)
        np.testing.assert_allclose(np.asarray(state.mean)[i], mean, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(state.var)[i], var, rtol=1e-9)


def test_reward_normalizer_matches_reference():
    # stateful_reward.h:57-94 single-env scalar port
    rng = np.random.default_rng(5)
    gamma = 0.99
    mean, var, count, acc = 0.0, 1.0, 1e-8, 0.0
    state = RewardNormState.create(1, gamma, dtype=jnp.float64)
    for _ in range(60):
        r = rng.normal() * 2
        term = rng.random() < 0.05
        acc = acc * gamma * (1.0 - term) + r
        delta = acc - mean
        tot = count + 1.0
        mean = mean + delta / tot
        var = (var * count + delta * delta * count / tot) / tot
        count = tot
        expected = r / np.sqrt(var + 1e-8)
        state, normed = state.step(
            jnp.asarray([r], jnp.float64), jnp.asarray([term], jnp.float64)
        )
        np.testing.assert_allclose(float(normed[0]), expected, rtol=1e-7)
    np.testing.assert_allclose(float(state.stats.var[0]), var, rtol=1e-7)
