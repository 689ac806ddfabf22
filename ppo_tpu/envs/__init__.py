"""Functional environments: pure-JAX MuJoCo locomotion tasks + wrappers.

Replaces the reference's gymcpp layer (libs/gymcpp/): environments are pure
functions over small state pytrees, vectorized by vmap, with next-step autoreset
and episode statistics implemented as masked array ops (gym.h:75-164 semantics).
"""

from ppo_tpu.envs.mujoco_envs import Ant, HalfCheetah, Hopper, Humanoid, make_env
from ppo_tpu.envs.vector import VectorEnv

__all__ = ["Ant", "HalfCheetah", "Hopper", "Humanoid", "make_env", "VectorEnv"]
