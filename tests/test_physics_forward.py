"""Constrained forward dynamics vs mujoco: efc rows, qacc, and cfrc_ext."""

import mujoco
import numpy as np
import pytest
import jax.numpy as jnp

from ppo_tpu.physics import collision, constraint, forward, smooth
from ppo_tpu.physics.model import gym_asset_path, load_model

XMLS = ["half_cheetah.xml", "hopper.xml", "ant.xml", "humanoid.xml"]


def load_pair(xml):
    path = gym_asset_path(xml)
    m = smooth.set_const(load_model(path))
    mj = mujoco.MjModel.from_xml_path(path)
    return m, mj


def contact_state(mj, seed, drop):
    rng = np.random.default_rng(seed)
    d = mujoco.MjData(mj)
    d.qpos[:] = mj.qpos0 + rng.uniform(-0.1, 0.1, mj.nq)
    for j in range(mj.njnt):
        if mj.jnt_type[j] == 0:
            adr = mj.jnt_qposadr[j]
            d.qpos[adr + 2] -= drop
            q = d.qpos[adr + 3 : adr + 7] + rng.uniform(-0.1, 0.1, 4)
            d.qpos[adr + 3 : adr + 7] = q / np.linalg.norm(q)
    if mj.jnt_type[0] != 0:
        d.qpos[1] -= drop
    d.qvel[:] = rng.normal(0, 0.5, mj.nv)
    d.ctrl[:] = rng.uniform(-1, 1, mj.nu)
    mujoco.mj_forward(mj, d)
    return d


@pytest.mark.parametrize("xml", [
    "half_cheetah.xml", "hopper.xml",
    # ant/humanoid variants are the fast tier's two heaviest compiles
    # (~17-21 s each warm); their qacc fidelity stays covered in the slow
    # tier, and the fast tier keeps cheetah+hopper plus every cfrc test
    pytest.param("ant.xml", marks=pytest.mark.slow),
    pytest.param("humanoid.xml", marks=pytest.mark.slow),
])
@pytest.mark.parametrize("seed,drop", [(0, 0.15), (1, 0.0), (2, 0.3)])
@pytest.mark.parametrize("solver_type,iters", [("newton", 30), ("pgs", 500)])
def test_qacc_matches_mujoco(xml, seed, drop, solver_type, iters):
    m, mj = load_pair(xml)
    d = contact_state(mj, seed, drop)
    fwd = forward.forward(
        m, jnp.asarray(d.qpos), jnp.asarray(d.qvel), jnp.asarray(d.ctrl),
        iterations=iters, solver_type=solver_type,
    )
    np.testing.assert_allclose(np.asarray(fwd.qacc_smooth), d.qacc_smooth, atol=1e-6)
    # active row count parity
    assert int(np.sum(np.asarray(fwd.efc.active))) == d.nefc, (
        f"nefc ours={int(np.sum(np.asarray(fwd.efc.active)))} mujoco={d.nefc}"
    )
    np.testing.assert_allclose(np.asarray(fwd.qacc), d.qacc, atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize("xml", ["half_cheetah.xml", "ant.xml"])
def test_efc_rows_match_mujoco(xml):
    """aref / R / impedance / pos parity for active rows (sorted by aref)."""
    m, mj = load_pair(xml)
    d = contact_state(mj, 0, 0.15)
    fwd = forward.forward(
        m, jnp.asarray(d.qpos), jnp.asarray(d.qvel), jnp.asarray(d.ctrl),
        iterations=100, solver_type="pgs",
    )
    act = np.asarray(fwd.efc.active)
    ours = np.stack(
        [np.asarray(fwd.efc.aref)[act], np.asarray(fwd.efc.R)[act], np.asarray(fwd.efc.pos)[act]], 1
    )
    theirs = np.stack([d.efc_aref, d.efc_R, d.efc_pos], 1)
    ours = ours[np.lexsort(ours.T)]
    theirs = theirs[np.lexsort(theirs.T)]
    np.testing.assert_allclose(ours, theirs, atol=1e-7, rtol=1e-7)


@pytest.mark.parametrize("xml", ["ant.xml", "humanoid.xml"])
def test_cfrc_ext_matches_mujoco(xml):
    m, mj = load_pair(xml)
    d = contact_state(mj, 0, 0.15)
    mujoco.mj_rnePostConstraint(mj, d)
    fwd = forward.forward(
        m, jnp.asarray(d.qpos), jnp.asarray(d.qvel), jnp.asarray(d.ctrl),
        iterations=500,
    )
    cfrc = forward.rne_post_constraint(m, fwd.com, fwd.vel, fwd)
    np.testing.assert_allclose(np.asarray(cfrc), d.cfrc_ext, atol=2e-3)
