"""Full mj_step trajectory parity: Euler (cheetah) and RK4 (hopper/ant/humanoid).

Contact-rich rigid-body dynamics is chaotic, so long-horizon bitwise equality is
impossible across different solvers (MuJoCo Newton vs our PGS). We check:
  - tight parity over short horizons (the per-step defect is tiny),
  - bounded drift over longer horizons with contacts.
"""

import mujoco
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ppo_tpu.physics import collision, forward, smooth
from ppo_tpu.physics.model import gym_asset_path, load_model


pytestmark = pytest.mark.slow


def load_pair(xml):
    path = gym_asset_path(xml)
    m = smooth.set_const(load_model(path))
    mj = mujoco.MjModel.from_xml_path(path)
    return m, mj


def run_both(xml, n_steps, seed=0, iterations=15):
    m, mj = load_pair(xml)
    rng = np.random.default_rng(seed)
    d = mujoco.MjData(mj)
    d.qpos[:] = mj.qpos0 + rng.uniform(-0.01, 0.01, mj.nq)
    d.qvel[:] = rng.normal(0, 0.05, mj.nv)
    ctrls = rng.uniform(-0.3, 0.3, (n_steps, mj.nu))

    step_fn = jax.jit(forward.make_step_fn(m, iterations=iterations))
    qpos = jnp.asarray(d.qpos.copy())
    qvel = jnp.asarray(d.qvel.copy())

    traj_mj, traj_us = [], []
    for t in range(n_steps):
        d.ctrl[:] = ctrls[t]
        mujoco.mj_step(mj, d)
        qpos, qvel = step_fn(qpos, qvel, jnp.asarray(ctrls[t]))
        traj_mj.append((d.qpos.copy(), d.qvel.copy()))
        traj_us.append((np.asarray(qpos), np.asarray(qvel)))
    return traj_mj, traj_us


@pytest.mark.parametrize("xml,steps,tol", [
    ("half_cheetah.xml", 50, 1e-5),
    ("hopper.xml", 50, 1e-5),
    ("ant.xml", 50, 1e-4),
    ("humanoid.xml", 50, 1e-4),
])
def test_short_horizon_trajectory(xml, steps, tol):
    traj_mj, traj_us = run_both(xml, steps)
    qp_mj, qv_mj = traj_mj[-1]
    qp_us, qv_us = traj_us[-1]
    np.testing.assert_allclose(qp_us, qp_mj, atol=tol)
    np.testing.assert_allclose(qv_us, qv_mj, atol=tol * 100)


@pytest.mark.parametrize("xml,steps,tol", [
    ("half_cheetah.xml", 50, 1e-5),
    ("ant.xml", 50, 1e-4),
])
def test_warmstart_low_iterations_trajectory(xml, steps, tol):
    """With qacc_warmstart threading (mjData semantics), 4 Newton iterations
    match MuJoCo trajectories as tightly as 15 cold iterations do — the
    throughput configuration the vectorized envs run with."""
    m, mj = load_pair(xml)
    rng = np.random.default_rng(0)
    d = mujoco.MjData(mj)
    d.qpos[:] = mj.qpos0 + rng.uniform(-0.01, 0.01, mj.nq)
    d.qvel[:] = rng.normal(0, 0.05, mj.nv)
    ctrls = rng.uniform(-0.3, 0.3, (steps, mj.nu))

    ctx = forward.make_context(m)

    @jax.jit
    def step_ws(qpos, qvel, ctrl, ws):
        qp, qv, fwd = forward.step(m, ctx, qpos, qvel, ctrl, 4, "newton", ws)
        return qp, qv, fwd.qacc

    qpos = jnp.asarray(d.qpos.copy())
    qvel = jnp.asarray(d.qvel.copy())
    ws = jnp.zeros(mj.nv)
    for t in range(steps):
        d.ctrl[:] = ctrls[t]
        mujoco.mj_step(mj, d)
        qpos, qvel, ws = step_ws(qpos, qvel, jnp.asarray(ctrls[t]), ws)
        np.testing.assert_allclose(np.asarray(qpos), d.qpos, atol=tol, err_msg=f"step {t}")


@pytest.mark.parametrize("xml", ["half_cheetah.xml", "hopper.xml"])
def test_medium_horizon_bounded_drift(xml):
    traj_mj, traj_us = run_both(xml, 400)
    qp_mj, _ = traj_mj[-1]
    qp_us, _ = traj_us[-1]
    # positions stay close in norm even after 400 contact-rich steps
    assert np.linalg.norm(qp_us - qp_mj) < 0.05, np.linalg.norm(qp_us - qp_mj)
