"""Collision narrowphase vs mujoco: active contact sets match (pair, dist, pos, frame)."""

import mujoco
import numpy as np
import pytest
import jax.numpy as jnp

from ppo_tpu.physics import collision, smooth
from ppo_tpu.physics.model import gym_asset_path, load_model

XMLS = ["half_cheetah.xml", "hopper.xml", "ant.xml", "humanoid.xml"]


def drop_state(mj, seed, drop):
    """Random pose pushed toward the floor so contacts exist."""
    rng = np.random.default_rng(seed)
    d = mujoco.MjData(mj)
    d.qpos[:] = mj.qpos0 + rng.uniform(-0.15, 0.15, mj.nq)
    for j in range(mj.njnt):
        if mj.jnt_type[j] == 0:
            adr = mj.jnt_qposadr[j]
            d.qpos[adr + 2] -= drop
            q = d.qpos[adr + 3 : adr + 7] + rng.uniform(-0.2, 0.2, 4)
            d.qpos[adr + 3 : adr + 7] = q / np.linalg.norm(q)
    if mj.jnt_type[0] != 0:  # planar models: drop the z slider
        d.qpos[1] -= drop
    mujoco.mj_forward(mj, d)
    return d


@pytest.mark.parametrize("xml", XMLS)
@pytest.mark.parametrize("seed,drop", [(0, 0.2), (1, 0.35), (2, 0.05)])
def test_contacts_match_mujoco(xml, seed, drop):
    path = gym_asset_path(xml)
    m = load_model(path)
    mj = mujoco.MjModel.from_xml_path(path)
    d = drop_state(mj, seed, drop)

    kin = smooth.kinematics(m, jnp.asarray(d.qpos))
    cts = collision.collide(m, kin.geom_xpos, kin.geom_xmat)

    ours = []
    for i in range(len(cts.geom1)):
        if bool(cts.active[i]):
            ours.append(
                (int(cts.geom1[i]), int(cts.geom2[i]), float(cts.dist[i]),
                 np.asarray(cts.pos[i]), np.asarray(cts.frame[i])))
    theirs = []
    for c in d.contact:
        theirs.append((int(c.geom1), int(c.geom2), float(c.dist),
                       np.array(c.pos), np.array(c.frame).reshape(3, 3)))

    key = lambda t: (t[0], t[1], round(t[2], 6), round(t[3][0], 5), round(t[3][1], 5))
    ours.sort(key=key)
    theirs.sort(key=key)
    assert len(ours) == len(theirs), (
        f"{xml}: ncon ours={len(ours)} mujoco={len(theirs)}\n"
        f"ours={[(o[0], o[1], o[2]) for o in ours]}\n"
        f"mj={[(t[0], t[1], t[2]) for t in theirs]}"
    )
    for o, t in zip(ours, theirs):
        assert o[0] == t[0] and o[1] == t[1]
        np.testing.assert_allclose(o[2], t[2], atol=1e-9)
        np.testing.assert_allclose(o[3], t[3], atol=1e-8)
        np.testing.assert_allclose(o[4], t[4], atol=1e-8)
