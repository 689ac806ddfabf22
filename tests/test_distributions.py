"""Distributions vs scipy / torch.distributions (reference rl_utils.h semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from ppo_tpu.ops import Beta, Dirichlet, Normal


def test_normal_log_prob_entropy_vs_scipy():
    loc = np.array([0.0, 1.5, -2.0])
    scale = np.array([1.0, 0.3, 2.5])
    x = np.array([0.1, 1.0, -3.0])
    d = Normal(jnp.asarray(loc), jnp.asarray(scale))
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(x))), sps.norm.logpdf(x, loc, scale), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(d.entropy()), sps.norm.entropy(loc, scale), rtol=1e-12
    )


def test_normal_sample_moments():
    d = Normal(jnp.full((200_000,), 2.0), jnp.full((200_000,), 3.0))
    s = d.sample(jax.random.key(0))
    assert abs(float(jnp.mean(s)) - 2.0) < 0.03
    assert abs(float(jnp.std(s)) - 3.0) < 0.03


def test_beta_log_prob_entropy_mean_vs_scipy():
    a = np.array([0.5, 1.0, 2.0, 5.0])
    b = np.array([0.5, 3.0, 2.0, 1.2])
    x = np.array([0.3, 0.7, 0.5, 0.9])
    d = Beta(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(x))), sps.beta.logpdf(x, a, b), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(d.entropy()), sps.beta.entropy(a, b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d.mean()), a / (a + b), rtol=1e-12)


def test_beta_sample_moments():
    a, b = 2.0, 5.0
    d = Beta(jnp.full((200_000,), a), jnp.full((200_000,), b))
    s = d.sample(jax.random.key(1))
    assert np.all((np.asarray(s) >= 0) & (np.asarray(s) <= 1))
    assert abs(float(jnp.mean(s)) - a / (a + b)) < 0.005
    var = a * b / ((a + b) ** 2 * (a + b + 1))
    assert abs(float(jnp.var(s)) - var) < 0.002


def test_dirichlet_log_prob_entropy_vs_scipy():
    c = np.array([0.7, 2.0, 3.5])
    x = np.array([0.2, 0.3, 0.5])
    d = Dirichlet(jnp.asarray(c))
    np.testing.assert_allclose(float(d.log_prob(jnp.asarray(x))), sps.dirichlet.logpdf(x, c), rtol=1e-6)
    np.testing.assert_allclose(float(d.entropy()), sps.dirichlet.entropy(c), rtol=1e-6)
    s = d.sample(jax.random.key(2))
    np.testing.assert_allclose(float(jnp.sum(s)), 1.0, rtol=1e-9)


@pytest.mark.parametrize(
    "a,b,expected",
    [
        # mode case: alpha>1, beta>1 -> (a-1)/(a+b-2)
        ([2.0, 3.0], [2.0, 3.0], [1.0 / 2.0, 2.0 / 4.0]),
        # a<=1, b>1 -> 0 ; a>1, b<=1 -> 1
        ([0.5, 2.0], [2.0, 0.5], [0.0, 1.0]),
        # both <=1 -> mean
        ([0.5, 0.8], [0.5, 0.4], [0.5, 0.8 / 1.2]),
    ],
)
def test_beta_roach_deterministic(a, b, expected):
    d = Beta(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(d.roach_deterministic()), expected, rtol=1e-6)


def test_beta_roach_default_dim1_is_half():
    # rl_utils.h:116-117: the base tensor is zeros except x[:, 1] = 0.5. With
    # alpha=beta=1 exactly, none of the >1/<1 masks with strict inequality match
    # the mode branch; a<=1 & b<=1 -> mean = 0.5 anyway. Use a case where no mask
    # rewrites: impossible (masks are exhaustive), so just check the mean branch.
    d = Beta(jnp.ones((1, 3)), jnp.ones((1, 3)))
    np.testing.assert_allclose(np.asarray(d.roach_deterministic()), 0.5 * np.ones((1, 3)))


def test_log_prob_float32_dtype_preserved():
    d = Normal(jnp.zeros(3, jnp.float32), jnp.ones(3, jnp.float32))
    assert d.log_prob(jnp.zeros(3, jnp.float32)).dtype == jnp.float32
    b = Beta(jnp.ones(3, jnp.float32) * 2, jnp.ones(3, jnp.float32) * 3)
    assert b.log_prob(jnp.full((3,), 0.5, jnp.float32)).dtype == jnp.float32
    assert b.sample(jax.random.key(0)).dtype == jnp.float32
