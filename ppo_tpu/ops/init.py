"""Weight initializers matching the reference's layer_init conventions.

- Orthogonal weight + constant bias (CleanRL agent, src/ppo_continuous_action.cpp:122-131:
  gain sqrt(2) for hidden, 1.0 for value head, 0.01 for policy head, bias 0).
- Xavier-uniform conv weight + bias 0.1 (CARLA CNN, include/carla/carla_model.h:555-560).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax.linen import initializers as fli

orthogonal = fli.orthogonal
xavier_uniform = fli.xavier_uniform


def constant(value: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init
