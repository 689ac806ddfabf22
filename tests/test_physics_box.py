"""Box geom support: collision parity, dynamics parity, trajectories.

Box colliders (plane-box corner slots, sphere-box incl. deep-center branch,
capsule-box endpoint+interior probes, box-box SAT + face clipping) are checked
contact-for-contact against mujoco where the algorithms coincide, and
dynamically (qacc / short trajectories) everywhere, including a 3-box stack.
"""

import mujoco
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ppo_tpu.physics import collision, forward, smooth

pytestmark = pytest.mark.slow  # box colliders are outside the four locomotion models
from ppo_tpu.physics.model import load_model


def load_pair(xml):
    m = smooth.set_const(load_model(xml))
    mj = mujoco.MjModel.from_xml_string(xml)
    return m, mj


def mj_contacts(mj, qpos=None, qvel=None):
    d = mujoco.MjData(mj)
    if qpos is not None:
        d.qpos[: len(qpos)] = qpos
    if qvel is not None:
        d.qvel[: len(qvel)] = qvel
    mujoco.mj_forward(mj, d)
    return d


def our_contacts(m, d):
    kin = smooth.kinematics(m, jnp.asarray(d.qpos))
    return collision.collide(m, kin.geom_xpos, kin.geom_xmat)


def assert_contact_sets_match(m, d, atol=1e-9):
    con = our_contacts(m, d)
    act = np.asarray(con.active)
    assert int(act.sum()) == d.ncon, f"ncon ours={act.sum()} mj={d.ncon}"
    ours = sorted(
        (round(float(np.asarray(con.dist)[i]), 8),
         tuple(np.round(np.asarray(con.pos)[i], 6)),
         tuple(np.round(np.asarray(con.frame)[i, 0], 6)))
        for i in np.where(act)[0]
    )
    theirs = sorted(
        (round(d.contact[i].dist, 8), tuple(np.round(d.contact[i].pos, 6)),
         tuple(np.round(d.contact[i].frame[:3], 6)))
        for i in range(d.ncon)
    )
    for o, t in zip(ours, theirs):
        assert abs(o[0] - t[0]) < 1e-6, (o, t)
        np.testing.assert_allclose(o[1], t[1], atol=1e-5)
        np.testing.assert_allclose(o[2], t[2], atol=1e-5)


PLANE_BOX = """
<mujoco><worldbody>
  <geom type="plane" size="5 5 0.1"/>
  <body pos="0 0 {z}"><freejoint/><geom type="box" size="0.1 0.2 0.1"/></body>
</worldbody></mujoco>"""

SPHERE_BOX = """
<mujoco><worldbody>
  <body pos="0 0 0"><geom type="box" size="0.2 0.2 0.2"/></body>
  <body pos="{p}"><freejoint/><geom type="sphere" size="0.15"/></body>
</worldbody></mujoco>"""

CAPSULE_BOX = """
<mujoco><worldbody>
  <body pos="0 0 0"><geom type="box" size="0.2 0.2 0.2"/></body>
  <body pos="{p}"><freejoint/><geom type="capsule" fromto="{ft}" size="{r}"/></body>
</worldbody></mujoco>"""

BOX_BOX = """
<mujoco><worldbody>
  <body pos="0 0 0"><geom type="box" size="0.2 0.2 0.1"/></body>
  <body><freejoint/><geom type="box" size="{s}"/></body>
</worldbody></mujoco>"""


def _full_inertia(inertia, iquat):
    w, x, y, z = iquat
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    return R @ np.diag(inertia) @ R.T


def test_box_inertia_matches_mujoco():
    """mujoco keeps the natural axis order for already-diagonal inertias while
    we sort principal moments descending — compare the full tensors, which is
    the dynamics-relevant quantity (iquat differs to compensate)."""
    xml = PLANE_BOX.format(z=0.3)
    m, mj = load_pair(xml)
    np.testing.assert_allclose(m.body_mass, mj.body_mass, rtol=1e-12)
    for b in range(mj.nbody):
        np.testing.assert_allclose(
            _full_inertia(m.body_inertia[b], m.body_iquat[b]),
            _full_inertia(mj.body_inertia[b], mj.body_iquat[b]),
            atol=1e-12,
        )


def test_plane_box_flat_and_corner():
    xml = PLANE_BOX.format(z=0.099)
    m, mj = load_pair(xml)
    assert_contact_sets_match(m, mj_contacts(mj))        # 4 corners
    # corner-down orientation
    q = np.zeros(7)
    q[:3] = [0, 0, 0.2]
    qa = np.array([np.cos(0.2), np.sin(0.2), 0, 0])
    qb = np.array([np.cos(0.25), 0, np.sin(0.25), 0])
    w1, x1, y1, z1 = qa
    w2, x2, y2, z2 = qb
    q[3:7] = [w1*w2 - x1*x2 - y1*y2 - z1*z2, w1*x2 + x1*w2 + y1*z2 - z1*y2,
              w1*y2 - x1*z2 + y1*w2 + z1*x2, w1*z2 + x1*y2 - y1*x2 + z1*w2]
    assert_contact_sets_match(m, mj_contacts(mj, qpos=q))  # 1 corner


@pytest.mark.parametrize("p", ["0 0 0.34", "0.3 0 0.3", "0.28 0.26 0.3", "0.05 0.02 0.1"])
def test_sphere_box_contacts(p):
    xml = SPHERE_BOX.format(p=p)
    m, mj = load_pair(xml)
    assert_contact_sets_match(m, mj_contacts(mj))


@pytest.mark.parametrize("p,ft,r", [
    ("0 0 0.34", "-0.15 0 0 0.15 0 0", 0.15),     # parallel face: 2 contacts
    ("0 0 0.5", "0 0 -0.16 0 0 0.16", 0.15),      # end-on: 1
    ("0.25 0 0.25", "0 -0.2 0 0 0.2 0", 0.1),     # across edge: 2
])
def test_capsule_box_contacts(p, ft, r):
    xml = CAPSULE_BOX.format(p=p, ft=ft, r=r)
    m, mj = load_pair(xml)
    assert_contact_sets_match(m, mj_contacts(mj))


def test_box_box_contacts():
    m, mj = load_pair(BOX_BOX.format(s="0.1 0.1 0.1"))
    # aligned face-face
    assert_contact_sets_match(m, mj_contacts(mj, qpos=[0.05, 0.03, 0.199, 1, 0, 0, 0]))
    # rotated 45 about z (clip polygon = rotated square)
    q = [0, 0, 0.199, np.cos(np.pi / 8), 0, 0, np.sin(np.pi / 8)]
    assert_contact_sets_match(m, mj_contacts(mj, qpos=q))
    # edge-down 45 about x (2 contacts along the edge)
    q = [0, 0, 0.24, np.cos(np.pi / 8), np.sin(np.pi / 8), 0, 0]
    assert_contact_sets_match(m, mj_contacts(mj, qpos=q))
    # partial overlap (clip polygon mixes vertices / intersections / corners)
    m2, mj2 = load_pair(BOX_BOX.format(s="0.15 0.15 0.1"))
    assert_contact_sets_match(m2, mj_contacts(mj2, qpos=[0.25, 0.1, 0.199, 1, 0, 0, 0]))


@pytest.mark.parametrize("qvel", [
    [0, 0, 0, 0, 0, 0],
    [0.4, -0.2, 0, 1.0, 2.0, -1.0],
])
def test_plane_box_qacc(qvel):
    xml = PLANE_BOX.format(z=0.098)
    m, mj = load_pair(xml)
    d = mj_contacts(mj, qvel=qvel)
    fwd = forward.forward(m, jnp.asarray(d.qpos), jnp.asarray(d.qvel),
                          jnp.zeros((0,)), iterations=30)
    np.testing.assert_allclose(np.asarray(fwd.qacc), d.qacc, atol=5e-5, rtol=1e-5)


def test_box_drop_trajectory():
    """Box dropped, tumbling, onto the plane: 300-step parity."""
    xml = PLANE_BOX.format(z=0.4)
    m, mj = load_pair(xml)
    d = mujoco.MjData(mj)
    d.qvel[:] = [0.5, -0.3, 0, 2.0, 3.0, 1.0]
    step_fn = jax.jit(forward.make_step_fn(m, iterations=20))
    qpos = jnp.asarray(d.qpos.copy())
    qvel = jnp.asarray(d.qvel.copy())
    for _ in range(300):
        mujoco.mj_step(mj, d)
        qpos, qvel = step_fn(qpos, qvel, jnp.zeros((0,)))
    np.testing.assert_allclose(np.asarray(qpos)[:3], d.qpos[:3], atol=2e-3)
    np.testing.assert_allclose(np.asarray(qpos)[3:], d.qpos[3:], atol=5e-3)


def test_box_stack_settles():
    """3-box stack under gravity: stays standing, matches mujoco closely."""
    xml = """
<mujoco><option timestep="0.002"/><worldbody>
  <geom type="plane" size="5 5 0.1"/>
  <body pos="0 0 0.1"><freejoint/><geom type="box" size="0.15 0.15 0.1"/></body>
  <body pos="0.03 0.02 0.3"><freejoint/><geom type="box" size="0.1 0.1 0.1"/></body>
  <body pos="0.01 0.05 0.47"><freejoint/><geom type="box" size="0.07 0.07 0.07"/></body>
</worldbody></mujoco>"""
    m, mj = load_pair(xml)
    d = mujoco.MjData(mj)
    step_fn = jax.jit(forward.make_step_fn(m, iterations=30))
    qpos = jnp.asarray(d.qpos.copy())
    qvel = jnp.asarray(d.qvel.copy())
    for _ in range(400):
        mujoco.mj_step(mj, d)
        qpos, qvel = step_fn(qpos, qvel, jnp.zeros((0,)))
    qp = np.asarray(qpos)
    # stack is standing at the right heights in both engines
    np.testing.assert_allclose(qp[[2, 9, 16]], d.qpos[[2, 9, 16]], atol=5e-3)
    np.testing.assert_allclose(qp[:3], d.qpos[:3], atol=5e-3)
    # settled (no residual velocity blowup)
    assert float(jnp.max(jnp.abs(qvel))) < 0.05
