"""Pure-JAX vectorized rigid-body physics engine (MJX-style, written from scratch).

TPU-native replacement for the reference's C++ MuJoCo binding
(libs/gymcpp/mujoco/mujoco_env.h): the compiled model is a host-side constant
structure, the per-env state is a small pytree, and `make_step_fn(model)` builds a
jittable step that `vmap`s over thousands of lockstep env instances on one chip.

Pipeline (mirroring the MuJoCo computation model, validated stage-by-stage
against the installed `mujoco` binary in tests/test_physics_*.py):
  kinematics -> com-based inertias -> CRB mass matrix -> RNE bias ->
  passive springs/dampers -> actuation -> collision -> soft-constraint solve ->
  Euler (implicit damping) or RK4 integration.
"""

from ppo_tpu.physics.model import Model, Option, load_model
from ppo_tpu.physics.types import (
    FREE,
    BALL,
    SLIDE,
    HINGE,
    PLANE,
    SPHERE,
    CAPSULE,
)
