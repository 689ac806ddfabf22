"""Clipped-surrogate PPO objective with diagnostics.

One jitted pure function replacing the update-loop body the reference duplicates at
src/ppo_continuous_action.cpp:489-542, src/ac_ppo_continuous_action.cpp:803-890 and
src/carla/ac_ppo_carla.cpp:531-621. Advantage normalization supports the
distributed (cross-device, Bessel-corrected) variant of ac_ppo_continuous_action.cpp:833-848
via an optional mesh axis name.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PPOStats(NamedTuple):
    policy_loss: jax.Array
    value_loss: jax.Array
    entropy: jax.Array
    old_approx_kl: jax.Array
    approx_kl: jax.Array
    clipfrac: jax.Array
    total_loss: jax.Array


def normalize_advantages(
    advantages: jax.Array,
    axis_name: str | None = None,
    eps: float = 1e-8,
) -> jax.Array:
    """(A - mean) / (std + eps) with torch-style unbiased std.

    With `axis_name`, mean/std are computed across all participating devices with
    Bessel correction over the global count (ac_ppo_continuous_action.cpp:833-848).
    """
    n = advantages.size
    mean = jnp.mean(advantages)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        n = n * jax.lax.psum(1, axis_name)
    sq = jnp.sum((advantages - mean) ** 2)
    if axis_name is not None:
        sq = jax.lax.psum(sq, axis_name)
    std = jnp.sqrt(sq / (n - 1))
    return (advantages - mean) / (std + eps)


def ppo_losses(
    newlogprob: jax.Array,   # [B] summed over action dims
    oldlogprob: jax.Array,   # [B]
    entropy: jax.Array,      # [B] summed over action dims
    newvalue: jax.Array,     # [B]
    old_value: jax.Array,    # [B]
    advantages: jax.Array,   # [B] (already normalized if desired)
    returns: jax.Array,      # [B]
    clip_coef: float,
    ent_coef: float,
    vf_coef: float,
    clip_vloss: bool = True,
) -> PPOStats:
    logratio = newlogprob - oldlogprob
    ratio = jnp.exp(logratio)

    # Diagnostics (http://joschu.net/blog/kl-approx.html), computed without grad
    # in the reference (ppo_continuous_action.cpp:500-506); stop_gradient keeps the
    # compiled graph identical to NoGradGuard semantics.
    sg = jax.lax.stop_gradient
    old_approx_kl = jnp.mean(-sg(logratio))
    approx_kl = jnp.mean(sg(ratio - 1.0) - sg(logratio))
    clipfrac = jnp.mean((jnp.abs(sg(ratio) - 1.0) > clip_coef).astype(ratio.dtype))

    # Policy loss (ppo_continuous_action.cpp:515-517)
    pg_loss1 = -advantages * ratio
    pg_loss2 = -advantages * jnp.clip(ratio, 1.0 - clip_coef, 1.0 + clip_coef)
    pg_loss = jnp.mean(jnp.maximum(pg_loss1, pg_loss2))

    # Value loss (ppo_continuous_action.cpp:520-533)
    if clip_vloss:
        v_loss_unclipped = (newvalue - returns) ** 2
        v_clipped = old_value + jnp.clip(newvalue - old_value, -clip_coef, clip_coef)
        v_loss_clipped = (v_clipped - returns) ** 2
        v_loss = 0.5 * jnp.mean(jnp.maximum(v_loss_unclipped, v_loss_clipped))
    else:
        v_loss = 0.5 * jnp.mean((newvalue - returns) ** 2)

    entropy_loss = jnp.mean(entropy)
    total = pg_loss - ent_coef * entropy_loss + vf_coef * v_loss
    return PPOStats(pg_loss, v_loss, entropy_loss, old_approx_kl, approx_kl, clipfrac, total)
