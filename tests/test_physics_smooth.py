"""Smooth dynamics vs mujoco: FK, com quantities, CRB, RNE, passive, qacc_smooth."""

import mujoco
import numpy as np
import pytest
import jax.numpy as jnp

from ppo_tpu.physics import smooth
from ppo_tpu.physics.model import gym_asset_path, load_model

XMLS = ["half_cheetah.xml", "hopper.xml", "ant.xml", "humanoid.xml"]


def make_random_state(mj, seed):
    rng = np.random.default_rng(seed)
    d = mujoco.MjData(mj)
    d.qpos[:] = mj.qpos0 + rng.uniform(-0.3, 0.3, mj.nq)
    # normalize free-joint quaternions
    for j in range(mj.njnt):
        if mj.jnt_type[j] == 0:
            adr = mj.jnt_qposadr[j] + 3
            q = d.qpos[adr : adr + 4] + rng.uniform(-0.3, 0.3, 4)
            d.qpos[adr : adr + 4] = q / np.linalg.norm(q)
    d.qvel[:] = rng.normal(0, 1.0, mj.nv)
    d.ctrl[:] = rng.uniform(-1, 1, mj.nu)
    return d


@pytest.mark.parametrize("xml", XMLS)
@pytest.mark.parametrize("seed", [0, 1])
def test_smooth_pipeline_vs_mujoco(xml, seed):
    path = gym_asset_path(xml)
    m = load_model(path)
    mj = mujoco.MjModel.from_xml_path(path)
    d = make_random_state(mj, seed)
    mujoco.mj_forward(mj, d)

    qpos = jnp.asarray(d.qpos)
    qvel = jnp.asarray(d.qvel)

    kin = smooth.kinematics(m, qpos)
    np.testing.assert_allclose(np.asarray(kin.xpos), d.xpos, atol=1e-10)
    for b in range(m.nbody):
        np.testing.assert_allclose(
            np.asarray(kin.xmat[b]).ravel(), d.xmat[b], atol=1e-10
        )
    np.testing.assert_allclose(np.asarray(kin.xipos), d.xipos, atol=1e-10)
    np.testing.assert_allclose(np.asarray(kin.geom_xpos), d.geom_xpos, atol=1e-10)
    for g in range(m.ngeom):
        np.testing.assert_allclose(
            np.asarray(kin.geom_xmat[g]).ravel(), d.geom_xmat[g], atol=1e-10
        )
    np.testing.assert_allclose(np.asarray(kin.xanchor), d.xanchor, atol=1e-10)
    np.testing.assert_allclose(np.asarray(kin.xaxis), d.xaxis, atol=1e-10)

    com = smooth.com_quantities(m, kin)
    np.testing.assert_allclose(np.asarray(com.subtree_com), d.subtree_com, atol=1e-10)
    np.testing.assert_allclose(np.asarray(com.cdof), d.cdof, atol=1e-10)

    mask = smooth.ancestor_mask(m)
    M = smooth.crb_mass_matrix(m, com, mask)
    Mfull = np.zeros((mj.nv, mj.nv))
    mujoco.mj_fullM(mj, d, Mfull)
    np.testing.assert_allclose(np.asarray(M), Mfull, atol=1e-8)

    vel = smooth.com_velocities(m, com, qvel)
    np.testing.assert_allclose(np.asarray(vel.cvel), d.cvel, atol=1e-9)
    np.testing.assert_allclose(np.asarray(vel.cdof_dot), d.cdof_dot, atol=1e-9)

    qfrc_bias = smooth.rne_bias(m, com, vel, qvel, mask)
    np.testing.assert_allclose(np.asarray(qfrc_bias), d.qfrc_bias, atol=1e-8)

    qfrc_passive = smooth.passive_forces(m, qpos, qvel)
    np.testing.assert_allclose(np.asarray(qfrc_passive), d.qfrc_passive, atol=1e-9)

    qfrc_actuator = smooth.actuator_forces(m, jnp.asarray(d.ctrl))
    np.testing.assert_allclose(np.asarray(qfrc_actuator), d.qfrc_actuator, atol=1e-10)

    qfrc_smooth = qfrc_passive + qfrc_actuator - qfrc_bias
    np.testing.assert_allclose(np.asarray(qfrc_smooth), d.qfrc_smooth, atol=1e-8)
    qacc_smooth = jnp.linalg.solve(M, qfrc_smooth)
    np.testing.assert_allclose(np.asarray(qacc_smooth), d.qacc_smooth, atol=1e-6)
