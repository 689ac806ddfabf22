"""Running mean/variance statistics as functional pytree state.

Replaces the reference's stateful wrappers
(libs/gymcpp/wrappers/stateful_observation.h:64-84 — Welford merge with
batch_count=1, batch_var=0; libs/gymcpp/wrappers/stateful_reward.h:60-94 —
discounted-return accumulator + running var). In the reference each env instance
owns an independent wrapper, so stats arrays here carry a leading [N] env axis and
the per-sample update vmaps across it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningMeanStd:
    """Per-env running mean/var. Shapes: mean/var [..., D] (or scalar), count [...]."""

    mean: jax.Array
    var: jax.Array
    count: jax.Array

    @classmethod
    def create(cls, shape, dtype=jnp.float64, epsilon: float = 1e-4) -> "RunningMeanStd":
        return cls(
            mean=jnp.zeros(shape, dtype),
            var=jnp.ones(shape, dtype),
            count=jnp.full(shape[:-1] if len(shape) else (), epsilon, dtype),
        )

    def update(self, x: jax.Array) -> "RunningMeanStd":
        """Single-sample Welford merge (batch_count=1, batch_var=0).

        Mirrors stateful_observation.h:64-84: the per-step batch is a single
        observation, so batch_mean == x and batch_var == 0.
        """
        count = self.count[..., None] if self.mean.ndim > self.count.ndim else self.count
        delta = x - self.mean
        tot = count + 1.0
        new_mean = self.mean + delta / tot
        m2 = self.var * count + (delta * delta) * count / tot
        new_var = m2 / tot
        return RunningMeanStd(new_mean, new_var, self.count + 1.0)

    def update_masked(self, x: jax.Array, update_mask: jax.Array) -> "RunningMeanStd":
        """update(), but rows where update_mask is False keep their old stats
        (used for per-env wrapper state under vectorized autoreset)."""
        new = self.update(x)
        m = update_mask
        mexp = m[..., None] if self.mean.ndim > m.ndim else m
        return RunningMeanStd(
            mean=jnp.where(mexp, new.mean, self.mean),
            var=jnp.where(mexp, new.var, self.var),
            count=jnp.where(m, new.count, self.count),
        )

    def normalize(self, x: jax.Array, epsilon: float = 1e-4) -> jax.Array:
        return (x - self.mean) / jnp.sqrt(self.var + epsilon)


@struct.dataclass
class RewardNormState:
    """NormalizeReward state (stateful_reward.h): per-env scalar statistics."""

    stats: RunningMeanStd          # scalar-shaped stats per env: mean/var/count [N]
    accumulated: jax.Array         # discounted return accumulator R, [N]
    gamma: float = struct.field(pytree_node=False, default=0.99)

    @classmethod
    def create(cls, num_envs: int, gamma: float, dtype=jnp.float32, epsilon: float = 1e-8) -> "RewardNormState":
        stats = RunningMeanStd(
            mean=jnp.zeros((num_envs,), dtype),
            var=jnp.ones((num_envs,), dtype),
            count=jnp.full((num_envs,), epsilon, dtype),
        )
        return cls(stats=stats, accumulated=jnp.zeros((num_envs,), dtype), gamma=gamma)

    def step(
        self, reward: jax.Array, termination: jax.Array, update: bool = True
    ) -> tuple["RewardNormState", jax.Array]:
        """R = R * gamma * (1 - term) + r; returns r / sqrt(var + 1e-8).

        Mirrors stateful_reward.h:57-70 ordering: the accumulator update and the
        variance update happen *before* the current reward is normalized.
        """
        acc = self.accumulated * self.gamma * (1.0 - termination.astype(reward.dtype)) + reward
        stats = self.stats.update(acc) if update else self.stats
        normalized = reward / jnp.sqrt(stats.var + 1e-8)
        return RewardNormState(stats=stats, accumulated=acc, gamma=self.gamma), normalized

    def reset_env(self, done_mask: jax.Array) -> "RewardNormState":
        """Zero the accumulator for autoreset envs (fresh episode)."""
        acc = jnp.where(done_mask, 0.0, self.accumulated)
        return RewardNormState(stats=self.stats, accumulated=acc, gamma=self.gamma)
