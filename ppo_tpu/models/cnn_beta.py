"""Roach-style CNN Beta actor-critic (the CARLA/CaRL agent family).

Re-design of include/carla/carla_model.h:21-334 for TPU (NHWC layout so XLA
maps convs onto the MXU):
- image encoders `roach` / `roach_ln` / `roach_ln2` (conv stacks with optional
  full-feature LayerNorm, xavier-uniform weights, bias 0.1 — carla_model.h:555-560),
- uint8 BEV input normalized by /255, optional 2-channel positional encoding,
- measurement MLP (state_linear), fusion MLP (linear),
- value head consuming extra value_measurements (carla_model.h:244-249),
- policy head + alpha/beta heads with softplus + beta_min_a_b_value,
- action scale/unscale to [0,1] with the 1e-7 clamp, sample types
  sample|mean|roach, and accel->throttle/brake control conversion.

The encoder is shape-generic: LayerNorm shapes and the flattened width are
derived from the input resolution, so the same module serves the 192x192 CaRL
config and the 84x84x3 synthetic stress config (BASELINE.json).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ppo_tpu.ops.distributions import Beta
from ppo_tpu.ops.init import constant, xavier_uniform

_EPS = 1e-7

# (out_channels, kernel, stride) stacks per encoder (carla_model.h:44-106)
_ENCODERS = {
    "roach": [(8, 5, 2), (16, 5, 2), (32, 5, 2), (64, 3, 2), (128, 3, 2), (256, 3, 1)],
    "roach_ln": [(8, 5, 2), (16, 5, 2), (32, 5, 2), (64, 3, 2), (128, 3, 2), (256, 3, 1)],
    "roach_ln2": [(8, 5, 2), (16, 5, 2), (24, 5, 2), (32, 5, 2), (64, 3, 2), (128, 3, 1), (256, 3, 1)],
}


def _mlp(widths: Sequence[int], use_ln: bool, name: str, dtype=None):
    # matmuls in `dtype` (bf16 hits the MXU at twice the f32 rate);
    # LayerNorm statistics stay f32 — flax casts the LN input up, XLA fuses
    # the casts into the surrounding ops
    layers = []
    for w in widths:
        layers.append(nn.Dense(w, dtype=dtype))
        if use_ln:
            layers.append(nn.LayerNorm(dtype=jnp.float32))
        layers.append(nn.relu)
    return nn.Sequential(layers, name=name)


class RoachCNNActorCritic(nn.Module):
    act_dim: int
    action_low: float = -1.0
    action_high: float = 1.0
    image_encoder: str = "roach_ln"
    use_layer_norm: bool = True
    use_layer_norm_policy_head: bool = True
    use_positional_encoding: bool = False
    beta_min_a_b_value: float = 1.0
    # mixed precision: "bfloat16" runs the conv/MLP trunk on the MXU's bf16
    # path (params stay float32; LayerNorm statistics and the value/alpha/
    # beta output heads stay float32 for numerics). Opt-in via
    # CNNConfig.compute_dtype; default float32 = bit-identical to before.
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, bev, measurements, value_measurements):
        """bev: uint8/float [B, H, W, C]; measurements [B, M]; value_meas [B, V]."""
        dtype = measurements.dtype
        cd = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        x = bev.astype(dtype) / 255.0
        if self.use_positional_encoding:
            B, H, W, _ = x.shape
            gx = jnp.linspace(-1.0, 1.0, H, dtype=dtype)
            gy = jnp.linspace(-1.0, 1.0, W, dtype=dtype)
            gxx, gyy = jnp.meshgrid(gx, gy, indexing="ij")
            grids = jnp.broadcast_to(jnp.stack([gxx, gyy], -1), (B, H, W, 2))
            x = jnp.concatenate([x, grids], -1)

        use_conv_ln = self.image_encoder in ("roach_ln", "roach_ln2")
        for c, k, s in _ENCODERS[self.image_encoder]:
            x = nn.Conv(
                c, (k, k), strides=(s, s), padding="VALID",
                kernel_init=xavier_uniform(), bias_init=constant(0.1), dtype=cd,
            )(x)
            if use_conv_ln:
                x = nn.LayerNorm(reduction_axes=(-3, -2, -1), feature_axes=(-3, -2, -1),
                                 dtype=jnp.float32)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)

        latent_state = _mlp([256, 256], self.use_layer_norm, "state_linear", dtype=cd)(measurements)
        features = _mlp([512, 256], self.use_layer_norm, "linear", dtype=cd)(
            jnp.concatenate([x, latent_state.astype(x.dtype)], -1)
        )

        value_feats = jnp.concatenate([features, value_measurements.astype(features.dtype)], -1)
        v = _mlp([256, 256], self.use_layer_norm, "value_head_mlp", dtype=cd)(value_feats)
        value = nn.Dense(1, name="value_out", dtype=jnp.float32)(v)[..., 0]

        latent_pi = _mlp(
            [256, 256], self.use_layer_norm and self.use_layer_norm_policy_head, "policy_head",
            dtype=cd,
        )(features)
        # output heads in f32: softplus floors + Beta log_prob/entropy are
        # sensitive to head precision
        alpha = nn.softplus(nn.Dense(self.act_dim, name="dist_mu", dtype=jnp.float32)(latent_pi)) + self.beta_min_a_b_value
        beta = nn.softplus(nn.Dense(self.act_dim, name="dist_sigma", dtype=jnp.float32)(latent_pi)) + self.beta_min_a_b_value
        return alpha, beta, value

    # ---- action scaling --------------------------------------------------
    def scale_action(self, action):
        s = (action - self.action_low) / (self.action_high - self.action_low)
        return jnp.clip(s, _EPS, 1.0 + _EPS)

    def unscale_action(self, action):
        return action * (self.action_high - self.action_low) + self.action_low

    # ---- functional helpers ---------------------------------------------
    def init_params(self, key, obs_shape, n_measurements, n_value_measurements, dtype=jnp.float32):
        return self.init(
            key,
            jnp.zeros((1,) + tuple(obs_shape), jnp.uint8),
            jnp.zeros((1, n_measurements), dtype),
            jnp.zeros((1, n_value_measurements), dtype),
        )

    def get_action_and_value(
        self, params, bev, measurements, value_measurements,
        key=None, action=None, sample_type="sample",
    ):
        alpha, beta, value = self.apply(params, bev, measurements, value_measurements)
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
        return action, logprob, entropy, value, alpha, beta


def convert_action_to_control(action):
    """[steer, accel] -> [steer, throttle, brake] (carla_model.h:320-334)."""
    steer, accel = action[..., 0], action[..., 1]
    throttle = jnp.where(accel > 0, accel, 0.0)
    brake = jnp.where(accel > 0, 0.0, -accel)
    return jnp.stack([steer, throttle, brake], -1)
