"""Probability distributions for continuous-control policies.

Functional pytree re-design of the reference's ``include/rl_utils.h``
(Normal: rl_utils.h:21-46, Dirichlet: rl_utils.h:48-81, Beta: rl_utils.h:83-132).
Each distribution is an immutable pytree of parameters; sampling takes an explicit
`jax.random` key, so the same code vmaps over env batches and shards over meshes.

All reductions (sum of log-probs / entropies over the action axis) are left to the
caller, matching the reference where `.sum(1)` happens at the call site.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

_LOG_SQRT_2PI = math.log(math.sqrt(2.0 * math.pi))


def _xlogy(x, y):
    """x * log(y), with 0 * log(0) == 0 (torch.special.xlogy semantics)."""
    return jnp.where(x == 0.0, 0.0, x * jnp.log(y))


@struct.dataclass
class Normal:
    """Diagonal Gaussian. Mirrors rl_utils.h:21-46."""

    loc: jax.Array
    scale: jax.Array

    def sample(self, key: jax.Array) -> jax.Array:
        eps = jax.random.normal(key, jnp.shape(self.loc), jnp.result_type(self.loc))
        return self.loc + self.scale * eps

    def log_prob(self, value: jax.Array) -> jax.Array:
        # -((x-mu)^2) / (2 var) - log(sigma) - log(sqrt(2 pi))   (rl_utils.h:39-41)
        var = self.scale * self.scale
        return (
            -((value - self.loc) * (value - self.loc)) / (2.0 * var)
            - jnp.log(self.scale)
            - _LOG_SQRT_2PI
        )

    def entropy(self) -> jax.Array:
        # 0.5 + 0.5 log(2 pi) + log(sigma)   (rl_utils.h:43-45)
        return 0.5 + 0.5 * math.log(2.0 * math.pi) + jnp.log(self.scale)

    def mode(self) -> jax.Array:
        return self.loc


@struct.dataclass
class Dirichlet:
    """Dirichlet over the last axis. Mirrors rl_utils.h:48-81."""

    concentration: jax.Array

    def sample(self, key: jax.Array) -> jax.Array:
        # Two-gamma construction == at::_sample_dirichlet semantics.
        g = jax.random.gamma(
            key, self.concentration, dtype=jnp.result_type(self.concentration)
        )
        return g / jnp.sum(g, axis=-1, keepdims=True)

    def log_prob(self, value: jax.Array) -> jax.Array:
        c = self.concentration
        return (
            jnp.sum(_xlogy(c - 1.0, value), axis=-1)
            + jax.lax.lgamma(jnp.sum(c, axis=-1))
            - jnp.sum(jax.lax.lgamma(c), axis=-1)
        )

    def entropy(self) -> jax.Array:
        # lgamma(c).sum - lgamma(a0) - (k - a0) digamma(a0)
        #   - ((c - 1) digamma(c)).sum            (rl_utils.h:74-80)
        c = self.concentration
        k = c.shape[-1]
        a0 = jnp.sum(c, axis=-1)
        return (
            jnp.sum(jax.lax.lgamma(c), axis=-1)
            - jax.lax.lgamma(a0)
            - (k - a0) * jax.lax.digamma(a0)
            - jnp.sum((c - 1.0) * jax.lax.digamma(c), axis=-1)
        )


@struct.dataclass
class Beta:
    """Beta distribution built on the two-component Dirichlet (rl_utils.h:83-132).

    `sample` uses the two-gamma construction, identical in distribution to the
    reference's `at::_sample_dirichlet(stack([alpha, beta])).select(-1, 0)`.
    """

    alpha: jax.Array
    beta: jax.Array

    def _dirichlet(self) -> Dirichlet:
        return Dirichlet(jnp.stack([self.alpha, self.beta], axis=-1))

    def sample(self, key: jax.Array) -> jax.Array:
        ka, kb = jax.random.split(key)
        dtype = jnp.result_type(self.alpha)
        ga = jax.random.gamma(ka, self.alpha, dtype=dtype)
        gb = jax.random.gamma(kb, self.beta, dtype=dtype)
        return ga / (ga + gb)

    def log_prob(self, value: jax.Array) -> jax.Array:
        # Dirichlet log_prob of stack([x, 1-x])   (rl_utils.h:101-104)
        return self._dirichlet().log_prob(jnp.stack([value, 1.0 - value], axis=-1))

    def entropy(self) -> jax.Array:
        return self._dirichlet().entropy()

    def mean(self) -> jax.Array:
        return self.alpha / (self.alpha + self.beta)

    def roach_deterministic(self) -> jax.Array:
        """Mode-based deterministic action (arXiv:2108.08265; rl_utils.h:114-131).

        - alpha > 1 and beta > 1  -> mode (a-1)/(a+b-2)
        - alpha <= 1,  beta > 1   -> 0
        - alpha > 1,   beta <= 1  -> 1
        - alpha <= 1,  beta <= 1  -> mean
        Base value is 0 except action dim 1 which defaults to 0.5 (the reference's
        `x[:, 1] += 0.5`, rl_utils.h:116-117) — only applied when the action axis
        has more than one dim.
        """
        a, b = self.alpha, self.beta
        x = jnp.zeros_like(a)
        if x.ndim >= 1 and x.shape[-1] > 1:
            x = x.at[..., 1].set(0.5)
        mode = (a - 1.0) / (a + b - 2.0)
        x = jnp.where((a <= 1.0) & (b <= 1.0), self.mean(), x)
        x = jnp.where((a > 1.0) & (b <= 1.0), 1.0, x)
        x = jnp.where((a <= 1.0) & (b > 1.0), 0.0, x)
        x = jnp.where((a > 1.0) & (b > 1.0), mode, x)
        return x
