"""Condim 4/6 (torsional / rolling friction) parity vs mujoco.

The reference's four locomotion models only use condim 1/3, but MuJoCo's
contact model (and our MJCF subset) supports torsional (condim 4) and rolling
(condim 6) friction: extra pyramid row pairs engaging the *rotational* point
jacobian. Scenarios: a spinning/rolling ball and a capsule on the plane, plus
a sphere-sphere pair, checked row-for-row (aref/R/pos), on qacc, cfrc_ext,
and over trajectories.
"""

import mujoco
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ppo_tpu.physics import forward, smooth
from ppo_tpu.physics.model import load_model

BALL_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1" friction="1.2 0.08 0.003"/>
    <body name="ball" pos="0 0 {z}">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.1" condim="{condim}"
            friction="0.9 0.05 0.002" density="800"/>
    </body>
  </worldbody>
</mujoco>
"""

CAPSULE_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1" friction="1 0.01 0.001"/>
    <body name="cap" pos="0 0 {z}">
      <freejoint/>
      <geom name="cap" type="capsule" fromto="-0.15 0 0 0.15 0 0" size="0.06"
            condim="{condim}" friction="0.8 0.02 0.005"/>
    </body>
  </worldbody>
</mujoco>
"""

TWO_SPHERES_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1" condim="3"/>
    <body name="a" pos="0 0 0.1">
      <freejoint/>
      <geom type="sphere" size="0.1" condim="6" friction="0.7 0.04 0.003"/>
    </body>
    <body name="b" pos="0.19 0 0.12">
      <freejoint/>
      <geom type="sphere" size="0.1" condim="6" friction="1.1 0.06 0.001"/>
    </body>
  </worldbody>
</mujoco>
"""


def load_pair_str(xml):
    m = smooth.set_const(load_model(xml))
    mj = mujoco.MjModel.from_xml_string(xml)
    return m, mj


def forward_state(mj, qvel):
    d = mujoco.MjData(mj)
    d.qvel[: len(qvel)] = qvel
    mujoco.mj_forward(mj, d)
    return d


def assert_efc_rows_match(fwd, d):
    act = np.asarray(fwd.efc.active)
    assert int(act.sum()) == d.nefc
    ours = np.stack(
        [np.asarray(fwd.efc.aref)[act], np.asarray(fwd.efc.R)[act],
         np.asarray(fwd.efc.pos)[act]], 1)
    theirs = np.stack([d.efc_aref, d.efc_R, d.efc_pos], 1)
    np.testing.assert_allclose(
        ours[np.lexsort(ours.T)], theirs[np.lexsort(theirs.T)], atol=1e-7, rtol=1e-7)


@pytest.mark.parametrize("condim,nefc", [(3, 4), (4, 6), (6, 10)])
def test_ball_efc_rows_and_qacc(condim, nefc):
    xml = BALL_XML.format(z=0.095, condim=condim)
    m, mj = load_pair_str(xml)
    d = forward_state(mj, [0.3, -0.2, 0.0, 4.0, 1.0, -3.0])
    assert d.nefc == nefc
    fwd = forward.forward(
        m, jnp.asarray(d.qpos), jnp.asarray(d.qvel), jnp.zeros((0,)),
        iterations=30, solver_type="newton")
    assert_efc_rows_match(fwd, d)
    np.testing.assert_allclose(np.asarray(fwd.qacc), d.qacc, atol=5e-5, rtol=1e-5)


@pytest.mark.parametrize("condim", [4, 6])
def test_capsule_efc_rows_and_qacc(condim):
    xml = CAPSULE_XML.format(z=0.055, condim=condim)
    m, mj = load_pair_str(xml)
    d = forward_state(mj, [0.1, 0.4, 0.0, 2.0, -1.0, 5.0])
    assert d.nefc == (2 * (condim - 1)) * d.ncon
    fwd = forward.forward(
        m, jnp.asarray(d.qpos), jnp.asarray(d.qvel), jnp.zeros((0,)),
        iterations=30, solver_type="newton")
    assert_efc_rows_match(fwd, d)
    np.testing.assert_allclose(np.asarray(fwd.qacc), d.qacc, atol=5e-4, rtol=1e-4)


@pytest.mark.slow  # ~12 s; condim-6 fidelity (no locomotion model uses it)
def test_two_spheres_condim6():
    m, mj = load_pair_str(TWO_SPHERES_XML)
    d = forward_state(mj, [0.5, 0, 0, 1, 2, 3, -0.5, 0, 0, -1, 0, 1])
    assert d.ncon >= 1
    fwd = forward.forward(
        m, jnp.asarray(d.qpos), jnp.asarray(d.qvel), jnp.zeros((0,)),
        iterations=30, solver_type="newton")
    assert_efc_rows_match(fwd, d)
    np.testing.assert_allclose(np.asarray(fwd.qacc), d.qacc, atol=5e-4, rtol=1e-4)


def test_ball_cfrc_ext_condim6():
    xml = BALL_XML.format(z=0.095, condim=6)
    m, mj = load_pair_str(xml)
    d = forward_state(mj, [0.3, -0.2, 0.0, 4.0, 1.0, -3.0])
    mujoco.mj_rnePostConstraint(mj, d)
    fwd = forward.forward(
        m, jnp.asarray(d.qpos), jnp.asarray(d.qvel), jnp.zeros((0,)),
        iterations=200, solver_type="newton")
    cfrc = forward.rne_post_constraint(m, fwd.com, fwd.vel, fwd)
    np.testing.assert_allclose(np.asarray(cfrc), d.cfrc_ext, atol=2e-4)


@pytest.mark.parametrize("condim", [4, 6])
def test_spinning_ball_trajectory(condim):
    """A ball spinning about its vertical axis decays only through torsional
    friction — a behavior invisible at condim 3. 200-step trajectory parity."""
    xml = BALL_XML.format(z=0.0999, condim=condim)
    m, mj = load_pair_str(xml)
    d = mujoco.MjData(mj)
    d.qvel[:] = [0.5, 0.0, 0.0, 0.0, 3.0, 8.0]
    step_fn = jax.jit(forward.make_step_fn(m, iterations=20))
    qpos = jnp.asarray(d.qpos.copy())
    qvel = jnp.asarray(d.qvel.copy())
    for _ in range(200):
        mujoco.mj_step(mj, d)
        qpos, qvel = step_fn(qpos, qvel, jnp.zeros((0,)))
    np.testing.assert_allclose(np.asarray(qpos), d.qpos, atol=1e-4)
    np.testing.assert_allclose(np.asarray(qvel), d.qvel, atol=1e-3)
    # the spin must actually have decayed (torsional friction acting)
    assert abs(d.qvel[5]) < 8.0 - 0.5
