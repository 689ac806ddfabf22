"""Whole-substep Pallas mega-kernel (physics/mega.py) equivalence tests.

The kernel body calls the same lane-major functions as the plain-XLA path
(physics/lanes.py) — under types.KERNEL_MODE they emit Mosaic-friendly forms
(unrolled static gathers, list-built scatters, inlined Newton solve). These
tests run the kernel in Pallas interpret mode on CPU in f64 and pin the two
paths against each other: RK4 models come out bit-exact (identical op
sequences); the Euler model's in-kernel implicit-damping solve reassociates
at ~1e-10 with the Newton warmstart (qacc) the loosest at ~1e-5 (the
active-set boundary amplifies roundoff; qpos/qvel are what integrate).

Reference behavior: MujocoEnv::mujocoStep (libs/gymcpp/mujoco/
mujoco_env.h:97-108) — mj_step x frame_skip, here as one lockstep batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppo_tpu.envs import make_env
from ppo_tpu.physics import lanes, mega

B = 128  # minimum mega lane block


@pytest.fixture(autouse=True)
def _interpret_mode():
    mega.FORCE_INTERPRET[0] = True
    yield
    mega.FORCE_INTERPRET[0] = False


def _rollout_pair(env_id, n_sub, seed=0):
    env = make_env(env_id, dtype=jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    state, _ = jax.jit(jax.vmap(env.reset, in_axes=(0, None)))(keys, None)
    ctrl = jax.random.uniform(
        jax.random.PRNGKey(seed + 1), (B, env.act_dim), jnp.float64, -1, 1
    )
    args = (state.qpos, state.qvel, ctrl, state.qacc_warmstart)
    fL = jax.jit(lambda qp, qv, c, w: lanes.substeps_batched(
        env.model, env.ctx, qp, qv, c, w, 4, n_sub))
    fM = jax.jit(lambda qp, qv, c, w: mega.substeps_batched(
        env.model, env.ctx, qp, qv, c, w, 4, n_sub))
    return jax.block_until_ready(fL(*args)), jax.block_until_ready(fM(*args))


@pytest.mark.slow
def test_mega_euler_matches_lanes_halfcheetah():
    (qpL, qvL, wsL), (qpM, qvM, wsM) = _rollout_pair("HalfCheetah-v5", 3)
    np.testing.assert_allclose(qpL, qpM, atol=1e-8)
    np.testing.assert_allclose(qvL, qvM, atol=1e-6)
    np.testing.assert_allclose(wsL, wsM, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("env_id", ["Hopper-v5", "Ant-v5"])
def test_mega_rk4_matches_lanes(env_id):
    (qpL, qvL, wsL), (qpM, qvM, wsM) = _rollout_pair(env_id, 2)
    np.testing.assert_allclose(qpL, qpM, atol=1e-12)
    np.testing.assert_allclose(qvL, qvM, atol=1e-12)
    np.testing.assert_allclose(wsL, wsM, atol=1e-10)


def test_mega_support_matrix():
    """Humanoid's 569x23 constraint system exceeds the VMEM block budget:
    supported() must gate it back to the lane path; the other three models
    must be eligible."""
    for env_id, want in [
        ("HalfCheetah-v5", True), ("Hopper-v5", True),
        ("Ant-v5", True), ("Humanoid-v4", False),
    ]:
        env = make_env(env_id)
        assert mega.supported(env.model, env.ctx, env.solver_type, B) == want, env_id


@pytest.mark.slow
def test_mega_step_batch_dispatch():
    """step_batch with the mega path produces the same obs/reward as the
    lanes path (f64, interpret)."""
    env_m = make_env("HalfCheetah-v5", dtype=jnp.float64, batch_impl="mega")
    env_l = make_env("HalfCheetah-v5", dtype=jnp.float64, batch_impl="lanes")
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    state, _ = jax.jit(jax.vmap(env_l.reset, in_axes=(0, None)))(keys, None)
    action = jax.random.uniform(
        jax.random.PRNGKey(8), (B, env_l.act_dim), jnp.float64, -1, 1
    )
    outL = jax.jit(env_l.step_batch)(state, action)
    outM = jax.jit(env_m.step_batch)(state, action)
    np.testing.assert_allclose(outL[1], outM[1], atol=1e-6)  # obs
    np.testing.assert_allclose(outL[2], outM[2], atol=1e-6)  # reward
