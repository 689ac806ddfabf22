"""Beta-policy MLP actor-critic (the AC-PPO agent family).

Exact re-design of src/ac_ppo_continuous_action.cpp:150-268:
- observation normalization baked in as frozen constants (mean_, std_),
- 256-256 Linear+LayerNorm+ReLU encoders for critic and actor (default
  torch Linear init — the reference defines orthogonal_init but does not use it
  in this agent),
- separate alpha/beta heads with softplus(x) + 1,
- actions scaled to [0, 1] for the Beta distribution with a 1e-7 clamp
  (scale_action clamps to [eps, 1 + eps], lines 194-203 — quirk preserved),
- sample types: "sample" | "mean" | "roach".
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ppo_tpu.ops.distributions import Beta

_EPS = 1e-7


def _torch_linear_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = shape[0]
    bound = 1.0 / fan_in**0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(fan_in):
    bound = 1.0 / fan_in**0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _Encoder(nn.Module):
    width: int = 256

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            fan_in = x.shape[-1]
            x = nn.Dense(
                self.width,
                kernel_init=_torch_linear_init,
                bias_init=_torch_bias_init(fan_in),
            )(x)
            x = nn.LayerNorm()(x)
            x = nn.relu(x)
        return x


class BetaActorCritic(nn.Module):
    act_dim: int
    action_low: float
    action_high: float
    obs_mean: tuple          # frozen obs statistics baked into the model
    obs_std: tuple
    width: int = 256

    @nn.compact
    def __call__(self, obs):
        mean = jnp.asarray(self.obs_mean, obs.dtype)
        std = jnp.asarray(self.obs_std, obs.dtype)
        x = (obs - mean) / std

        head = lambda: nn.Dense(
            self.act_dim, kernel_init=_torch_linear_init, bias_init=_torch_bias_init(self.width)
        )
        feats = _Encoder(self.width, name="actor_encoder")(x)
        alpha = nn.softplus(head()(feats)) + 1.0
        beta = nn.softplus(head()(feats)) + 1.0

        ch = _Encoder(self.width, name="critic_encoder")(x)
        value = nn.Dense(
            1, kernel_init=_torch_linear_init, bias_init=_torch_bias_init(self.width)
        )(ch)[..., 0]
        return alpha, beta, value

    # ---- action scaling (ac_ppo_continuous_action.cpp:194-210) ----------
    def scale_action(self, action):
        s = (action - self.action_low) / (self.action_high - self.action_low)
        return jnp.clip(s, _EPS, 1.0 + _EPS)

    def unscale_action(self, action):
        return action * (self.action_high - self.action_low) + self.action_low

    # ---- functional helpers --------------------------------------------
    def init_params(self, key, obs_dim, dtype=jnp.float32):
        return self.init(key, jnp.zeros((1, obs_dim), dtype))

    def get_action_and_value(self, params, obs, key=None, action=None, sample_type="sample"):
        alpha, beta, value = self.apply(params, obs)
        dist = Beta(alpha, beta)
        if action is None:
            if sample_type == "sample":
                action = dist.sample(key)
            elif sample_type == "mean":
                action = dist.mean()
            elif sample_type == "roach":
                action = dist.roach_deterministic()
            else:
                raise ValueError(f"unsupported sample type {sample_type}")
        else:
            action = self.scale_action(action)
        logprob = jnp.sum(dist.log_prob(action), -1)
        action = self.unscale_action(action)
        entropy = jnp.sum(dist.entropy(), -1)
        return action, logprob, entropy, value

    def get_value(self, params, obs):
        return self.apply(params, obs)[2]
