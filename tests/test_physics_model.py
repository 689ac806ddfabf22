"""MJCF compiler vs the installed MuJoCo binary: field-by-field model parity."""

import mujoco
import numpy as np
import pytest

from ppo_tpu.physics.model import gym_asset_path, load_model, _np_quat2mat

XMLS = ["half_cheetah.xml", "hopper.xml", "ant.xml", "humanoid.xml"]


@pytest.fixture(scope="module", params=XMLS)
def models(request):
    path = gym_asset_path(request.param)
    return load_model(path), mujoco.MjModel.from_xml_path(path)


def test_sizes(models):
    m, mj = models
    assert (m.nq, m.nv, m.nu, m.nbody, m.njnt, m.ngeom) == (
        mj.nq, mj.nv, mj.nu, mj.nbody, mj.njnt, mj.ngeom)


def test_options(models):
    m, mj = models
    assert m.opt.timestep == mj.opt.timestep
    np.testing.assert_allclose(m.opt.gravity, mj.opt.gravity)
    assert m.opt.integrator == (0 if mj.opt.integrator == 0 else 1)


def test_tree_structure(models):
    m, mj = models
    np.testing.assert_array_equal(m.body_parentid, mj.body_parentid)
    np.testing.assert_array_equal(m.body_rootid, mj.body_rootid)
    np.testing.assert_array_equal(m.body_weldid, mj.body_weldid)
    np.testing.assert_array_equal(m.body_jntadr, mj.body_jntadr)
    np.testing.assert_array_equal(m.body_jntnum, mj.body_jntnum)
    np.testing.assert_array_equal(m.body_dofnum, mj.body_dofnum)
    np.testing.assert_array_equal(m.jnt_qposadr, mj.jnt_qposadr)
    np.testing.assert_array_equal(m.jnt_dofadr, mj.jnt_dofadr)
    np.testing.assert_array_equal(m.dof_bodyid, mj.dof_bodyid)
    np.testing.assert_array_equal(m.dof_jntid, mj.dof_jntid)


def test_body_frames(models):
    m, mj = models
    np.testing.assert_allclose(m.body_pos, mj.body_pos, atol=1e-12)
    np.testing.assert_allclose(m.body_quat, mj.body_quat, atol=1e-12)


def test_inertial(models):
    m, mj = models
    np.testing.assert_allclose(m.body_mass, mj.body_mass, rtol=1e-9)
    np.testing.assert_allclose(m.body_ipos, mj.body_ipos, atol=1e-9)
    # principal moments (descending) match
    np.testing.assert_allclose(m.body_inertia, mj.body_inertia, rtol=1e-7, atol=1e-12)
    # full inertia tensor in body frame matches regardless of eigenframe sign conventions
    for b in range(m.nbody):
        R1 = _np_quat2mat(m.body_iquat[b])
        R2 = _np_quat2mat(mj.body_iquat[b])
        I1 = R1 @ np.diag(m.body_inertia[b]) @ R1.T
        I2 = R2 @ np.diag(mj.body_inertia[b]) @ R2.T
        np.testing.assert_allclose(I1, I2, atol=1e-8)


def test_joints(models):
    m, mj = models
    np.testing.assert_array_equal(m.jnt_type, mj.jnt_type)
    np.testing.assert_allclose(m.jnt_pos, mj.jnt_pos, atol=1e-12)
    np.testing.assert_allclose(m.jnt_axis, mj.jnt_axis, atol=1e-12)
    np.testing.assert_allclose(m.jnt_range, mj.jnt_range, atol=1e-12)
    np.testing.assert_array_equal(m.jnt_limited, mj.jnt_limited.astype(bool))
    np.testing.assert_allclose(m.jnt_stiffness, mj.jnt_stiffness)
    np.testing.assert_allclose(m.jnt_solref, mj.jnt_solref)
    np.testing.assert_allclose(m.jnt_solimp, mj.jnt_solimp)
    np.testing.assert_allclose(m.dof_damping, mj.dof_damping)
    np.testing.assert_allclose(m.dof_armature, mj.dof_armature)
    np.testing.assert_allclose(m.qpos0, mj.qpos0, atol=1e-12)
    np.testing.assert_allclose(m.qpos_spring, mj.qpos_spring, atol=1e-12)


def test_geoms(models):
    m, mj = models
    np.testing.assert_array_equal(m.geom_type, mj.geom_type)
    np.testing.assert_array_equal(m.geom_bodyid, mj.geom_bodyid)
    np.testing.assert_allclose(m.geom_pos, mj.geom_pos, atol=1e-12)
    # quat sign is arbitrary; compare rotation matrices
    for g in range(m.ngeom):
        np.testing.assert_allclose(
            _np_quat2mat(m.geom_quat[g]), _np_quat2mat(mj.geom_quat[g]), atol=1e-9
        )
    np.testing.assert_allclose(m.geom_size, mj.geom_size, atol=1e-12)
    np.testing.assert_allclose(m.geom_friction, mj.geom_friction, atol=1e-12)
    np.testing.assert_allclose(m.geom_margin, mj.geom_margin, atol=1e-12)
    np.testing.assert_array_equal(m.geom_contype, mj.geom_contype)
    np.testing.assert_array_equal(m.geom_conaffinity, mj.geom_conaffinity)
    np.testing.assert_array_equal(m.geom_condim, mj.geom_condim)
    np.testing.assert_allclose(m.geom_solref, mj.geom_solref)
    np.testing.assert_allclose(m.geom_solimp, mj.geom_solimp)


def test_actuators(models):
    m, mj = models
    np.testing.assert_array_equal(m.actuator_trnid, mj.actuator_trnid[:, 0])
    np.testing.assert_allclose(m.actuator_gear, mj.actuator_gear[:, 0])
    np.testing.assert_allclose(m.actuator_ctrlrange, mj.actuator_ctrlrange)


def test_assets_match_reference():
    import filecmp
    import os

    ref = "/root/reference/libs/gymcpp/mujoco/assets"
    if not os.path.isdir(ref):
        pytest.skip("reference assets not mounted")
    for name in XMLS:
        assert filecmp.cmp(gym_asset_path(name), os.path.join(ref, name), shallow=False)
