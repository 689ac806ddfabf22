"""Env obs/reward/termination parity vs gymnasium (same physics states/actions)."""

import gymnasium
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ppo_tpu.envs import make_env
from ppo_tpu.envs.mujoco_envs import EnvState

# Ant/Humanoid parity compiles are minutes each (RK4 + big constraint
# systems in f64): slow tier. HalfCheetah+Hopper keep obs/reward/termination
# semantics covered in the fast tier.
CASES = [
    ("HalfCheetah-v5", "HalfCheetah-v5", 5e-7, 5),
    ("Hopper-v5", "Hopper-v5", 5e-7, 5),
    pytest.param("Ant-v5", "Ant-v5", 5e-5, 5, marks=pytest.mark.slow),
    pytest.param("Humanoid-v4", "Humanoid-v4", 5e-4, 5, marks=pytest.mark.slow),
]


@pytest.mark.parametrize("env_id,gym_id,tol,steps", CASES)
def test_step_parity_vs_gymnasium(env_id, gym_id, tol, steps):
    env = make_env(env_id, dtype=jnp.float64, solver_iterations=300)
    genv = gymnasium.make(gym_id).unwrapped
    genv.reset(seed=0)

    rng = np.random.default_rng(0)
    step = jax.jit(env.step)

    # resync the physics state from gymnasium before every step so divergence
    # cannot accumulate: this isolates obs/reward/termination semantics (the
    # underlying physics parity is covered by tests/test_physics_*.py)
    for t in range(steps):
        qpos = genv.init_qpos + rng.uniform(-0.05, 0.05, env.nq)
        qvel = rng.normal(0, 0.05, env.nv)
        genv.set_state(qpos, qvel)
        fwd = env._forward_only(jnp.asarray(qpos), jnp.asarray(qvel))
        state = EnvState(
            qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
            t=jnp.zeros((), jnp.int32), key=jax.random.key(0),
            x_before=env._x_metric(env.model, jnp.asarray(qpos), fwd),
            qacc_warmstart=fwd.qacc,
        )
        action = rng.uniform(env.action_low, env.action_high, env.nu)
        gobs, grew, gterm, gtrunc, _ = genv.step(action)
        state, obs, rew, term, trunc = step(state, jnp.asarray(action))
        np.testing.assert_allclose(np.asarray(obs), gobs, atol=tol, err_msg=f"step {t} obs")
        np.testing.assert_allclose(float(rew), grew, atol=tol * 10, err_msg=f"step {t} reward")
        assert bool(term) == bool(gterm), f"step {t} terminated"


def test_truncation_at_1000():
    env = make_env("HalfCheetah-v5", dtype=jnp.float64)
    state, _ = env.reset(jax.random.key(0))
    state = state.replace(t=jnp.asarray(999, jnp.int32))
    step = jax.jit(env.step)
    state, _, _, term, trunc = step(state, jnp.zeros(env.nu))
    assert bool(trunc) and not bool(term)


def test_reset_noise_ranges():
    env = make_env("Hopper-v5", dtype=jnp.float64)
    states, _ = jax.vmap(env.reset)(jax.random.split(jax.random.key(0), 256))
    dq = np.asarray(states.qpos) - env.model.qpos0
    assert np.all(np.abs(dq) <= 5e-3 + 1e-12)
    assert np.abs(dq).max() > 2e-3  # actually spread out
    assert np.all(np.abs(np.asarray(states.qvel)) <= 5e-3 + 1e-12)
