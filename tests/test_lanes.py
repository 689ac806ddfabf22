"""Equivalence of the lane-major physics path against the vmapped reference.

physics/lanes.py reimplements the whole substep with the env batch in the
last axis; these tests pin every stage (and the full multi-substep step) to
the batch-first implementation the golden physics suites validate against
the installed MuJoCo binary.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppo_tpu.envs import make_env
from ppo_tpu.physics import collision, constraint, forward, lanes, smooth

B = 3
ENVS = ["HalfCheetah-v5", "Hopper-v5", "Ant-v5", "Humanoid-v4"]


pytestmark = pytest.mark.slow


def _batch_states(env, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    state, obs = jax.vmap(env.reset, in_axes=(0, None))(keys, env.consts)
    # step a few times with random actions so contacts/limits activate
    k = jax.random.PRNGKey(seed + 1)
    for _ in range(3):
        k, ka = jax.random.split(k)
        act = jax.random.uniform(
            ka, (B, env.act_dim), env.dtype, env.action_low, env.action_high
        )
        state = jax.vmap(env.step, in_axes=(0, 0, None))(state, act, env.consts)[0]
    return state


@pytest.fixture(scope="module")
def cheetah():
    # contact_topk=0: these tests pin the lanes FORMULATION against the vmapped
    # reference path; top-k selection (lanes-only) has its own equivalence
    # suite (tests/test_topk.py)
    return make_env("HalfCheetah-v5", dtype=jnp.float64, contact_topk=0)


def test_stage_equivalence_cheetah(cheetah):
    env = cheetah
    m, ctx = env.model, env.ctx
    state = _batch_states(env)
    qpos, qvel = state.qpos, state.qvel  # [B, nq]
    qp, qv = qpos.T, qvel.T

    kin_ref = jax.vmap(lambda q: smooth.kinematics(m, q))(qpos)
    kin_l = lanes.kinematics_l(m, qp)
    np.testing.assert_allclose(kin_l.xpos, jnp.moveaxis(kin_ref.xpos, 0, -1), atol=1e-12)
    np.testing.assert_allclose(kin_l.xmat, jnp.moveaxis(kin_ref.xmat, 0, -1), atol=1e-12)
    np.testing.assert_allclose(kin_l.xipos, jnp.moveaxis(kin_ref.xipos, 0, -1), atol=1e-12)
    np.testing.assert_allclose(
        kin_l.geom_xpos, jnp.moveaxis(kin_ref.geom_xpos, 0, -1), atol=1e-12
    )
    np.testing.assert_allclose(
        kin_l.geom_xmat, jnp.moveaxis(kin_ref.geom_xmat, 0, -1), atol=1e-12
    )

    com_ref = jax.vmap(lambda q: smooth.com_quantities(m, smooth.kinematics(m, q)))(qpos)
    com_l = lanes.com_quantities_l(m, kin_l)
    np.testing.assert_allclose(
        com_l.subtree_com, jnp.moveaxis(com_ref.subtree_com, 0, -1), atol=1e-12
    )
    np.testing.assert_allclose(com_l.cinert, jnp.moveaxis(com_ref.cinert, 0, -1), atol=1e-11)
    np.testing.assert_allclose(com_l.cdof, jnp.moveaxis(com_ref.cdof, 0, -1), atol=1e-12)

    M_ref = jax.vmap(
        lambda q: smooth.crb_mass_matrix(
            m, smooth.com_quantities(m, smooth.kinematics(m, q)), ctx.mask
        )
    )(qpos)
    M_l = lanes.crb_mass_matrix_l(m, com_l)
    np.testing.assert_allclose(M_l, jnp.moveaxis(M_ref, 0, -1), atol=1e-11)

    def ref_vel_bias(q, v):
        kin = smooth.kinematics(m, q)
        com = smooth.com_quantities(m, kin)
        vel = smooth.com_velocities(m, com, v)
        return vel.cvel, vel.cdof_dot, smooth.rne_bias(m, com, vel, v, ctx.mask)

    cvel_ref, cdd_ref, bias_ref = jax.vmap(ref_vel_bias)(qpos, qvel)
    vel_l = lanes.com_velocities_l(m, com_l, qv)
    bias_l = lanes.rne_bias_l(m, com_l, vel_l, qv)
    np.testing.assert_allclose(vel_l.cvel, jnp.moveaxis(cvel_ref, 0, -1), atol=1e-11)
    np.testing.assert_allclose(vel_l.cdof_dot, jnp.moveaxis(cdd_ref, 0, -1), atol=1e-11)
    np.testing.assert_allclose(bias_l, jnp.moveaxis(bias_ref, 0, -1), atol=1e-10)

    pas_ref = jax.vmap(lambda q, v: smooth.passive_forces(m, q, v))(qpos, qvel)
    np.testing.assert_allclose(
        lanes.passive_forces_l(m, qp, qv), jnp.moveaxis(pas_ref, 0, -1), atol=1e-12
    )
    ctrl = jnp.linspace(-1.0, 1.0, B * env.act_dim).reshape(B, env.act_dim).astype(env.dtype)
    act_ref = jax.vmap(lambda c: smooth.actuator_forces(m, c))(ctrl)
    np.testing.assert_allclose(
        lanes.actuator_forces_l(m, ctrl.T), jnp.moveaxis(act_ref, 0, -1), atol=1e-12
    )

    con_ref = jax.vmap(
        lambda q: collision.collide(
            m, smooth.kinematics(m, q).geom_xpos, smooth.kinematics(m, q).geom_xmat,
            ctx.slots, ctx.kind_masks,
        )
    )(qpos)
    con_l = lanes.collide_l(m, kin_l.geom_xpos, kin_l.geom_xmat, ctx.slots, ctx.kind_masks)
    np.testing.assert_allclose(con_l.dist, con_ref.dist.T, atol=1e-12)
    np.testing.assert_allclose(con_l.pos, jnp.moveaxis(con_ref.pos, 0, -1), atol=1e-12)
    np.testing.assert_allclose(con_l.frame, jnp.moveaxis(con_ref.frame, 0, -1), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(con_l.active), np.asarray(con_ref.active).T)

    efc_ref = jax.vmap(
        lambda q, v: constraint.make_efc(
            m, ctx.meta,
            smooth.com_quantities(m, smooth.kinematics(m, q)), q, v,
            collision.collide(
                m, smooth.kinematics(m, q).geom_xpos, smooth.kinematics(m, q).geom_xmat,
                ctx.slots, ctx.kind_masks,
            ),
        )
    )(qpos, qvel)
    efc_l = lanes.make_efc_l(m, ctx.meta, com_l, qp, qv, con_l)
    np.testing.assert_allclose(efc_l.J, jnp.moveaxis(efc_ref.J, 0, -1), atol=1e-11)
    np.testing.assert_allclose(efc_l.R, efc_ref.R.T, atol=1e-11)
    np.testing.assert_allclose(efc_l.aref, efc_ref.aref.T, atol=1e-10)


@pytest.mark.parametrize("env_id", ENVS)
def test_step_equivalence(env_id):
    env = make_env(env_id, dtype=jnp.float64, contact_topk=0)
    m, ctx = env.model, env.ctx
    assert lanes.lanes_supported(m, ctx, env.solver_type)
    # deterministic seed: hash() is salted per interpreter (PYTHONHASHSEED),
    # which made this trajectory — and thus the tolerance margin — vary run
    # to run (observed: a 1.13e-6 violation of atol 1e-6 on one unlucky salt)
    state = _batch_states(env, seed=sum(map(ord, env_id)) % 1000)
    ctrl = jnp.clip(
        jax.random.normal(jax.random.PRNGKey(7), (B, env.act_dim), env.dtype),
        env.action_low, env.action_high,
    )
    ws = state.qacc_warmstart

    def ref_substeps(qp, qv, ct, w):
        def body(carry, _):
            q, v, wss = carry
            q2, v2, fwd = forward.step(m, ctx, q, v, ct, env.iterations, "newton", wss)
            return (q2, v2, fwd.qacc), None

        (q, v, wss), _ = jax.lax.scan(body, (qp, qv, w), None, length=env.frame_skip)
        return q, v, wss

    qp_ref, qv_ref, ws_ref = jax.vmap(ref_substeps)(state.qpos, state.qvel, ctrl, ws)
    qp_l, qv_l, ws_l = lanes.substeps_batched(
        m, ctx, state.qpos, state.qvel, ctrl, ws, env.iterations, env.frame_skip
    )
    # Humanoid (23 DoF, 569 constraint rows, 20 Newton solves across the
    # frame-skip chain) amplifies formulation-level fp reassociation the
    # most: measured 2.9e-8 qpos drift between the two (mathematically
    # identical) row pipelines after the round-5 refactor — 5x headroom
    # keeps the pin tight without flaking on fusion-order changes
    s = 5.0 if env_id == "Humanoid-v4" else 1.0
    np.testing.assert_allclose(qp_l, qp_ref, atol=1e-8 * s)
    np.testing.assert_allclose(qv_l, qv_ref, atol=1e-6 * s)
    np.testing.assert_allclose(ws_l, ws_ref, atol=1e-4 * s)
