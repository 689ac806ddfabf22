"""CleanRL-style Gaussian MLP actor-critic.

Exact re-design of the sync-PPO agent (src/ppo_continuous_action.cpp:120-171):
64-64 tanh MLPs for critic and actor mean, orthogonal init with gains sqrt(2)
for hidden layers, 1.0 for the value head and 0.01 for the policy head (bias 0),
and a state-independent `actor_logstd` parameter initialized to zeros.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ppo_tpu.ops.distributions import Normal
from ppo_tpu.ops.init import constant, orthogonal


class GaussianActorCritic(nn.Module):
    act_dim: int
    hidden: int = 64

    @nn.compact
    def __call__(self, obs):
        dense = lambda w, gain: nn.Dense(
            w, kernel_init=orthogonal(gain), bias_init=constant(0.0)
        )
        h = obs
        for _ in range(2):
            h = jnp.tanh(dense(self.hidden, 2.0**0.5)(h))
        value = dense(1, 1.0)(h)[..., 0]

        h = obs
        for _ in range(2):
            h = jnp.tanh(dense(self.hidden, 2.0**0.5)(h))
        mean = dense(self.act_dim, 0.01)(h)
        logstd = self.param("actor_logstd", constant(0.0), (self.act_dim,))
        return mean, jnp.broadcast_to(logstd, mean.shape), value

    # ---- functional helpers (used by trainers) --------------------------
    def init_params(self, key, obs_dim, dtype=jnp.float32):
        return self.init(key, jnp.zeros((1, obs_dim), dtype))

    def get_action_and_value(self, params, obs, key=None, action=None):
        """Sample (or evaluate) like AgentImpl::get_action_and_value:
        logprob/entropy summed over the action axis."""
        mean, logstd, value = self.apply(params, obs)
        dist = Normal(mean, jnp.exp(logstd))
        if action is None:
            action = dist.sample(key)
        logprob = jnp.sum(dist.log_prob(action), -1)
        entropy = jnp.sum(dist.entropy(), -1)
        return action, logprob, entropy, value

    def get_value(self, params, obs):
        return self.apply(params, obs)[2]
