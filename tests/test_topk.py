"""Dynamic top-k contact-slot selection (lanes.select_topk_contacts).

The reference runs MuJoCo, whose constraint system is dynamically sized to
the ACTIVE contacts each step (variable nc); our statically-shaped slot table
pads every candidate pair instead. Top-k selection recovers the dynamic
behavior under XLA's static-shape rules: each env gathers its k
deepest-penetrating slots into a compact constraint block before row
assembly, shrinking every [ne, nv, B] tensor downstream.

Selection is EXACT when every active slot is selected: inactive rows carry
J=0 / aref=0 / R=1 and contribute nothing to the Newton objective. These
tests pin (1) row-level exactness — selected rows bit-equal the full path's,
unselected-but-absent rows were all-zero; (2) trajectory-level agreement
within fp-reassociation noise; (3) graceful truncation when k is too small.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppo_tpu.envs import make_env
from ppo_tpu.physics import lanes

B = 4
pytestmark = pytest.mark.slow


def _states(env, steps=4, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    state, _ = jax.vmap(env.reset, in_axes=(0, None))(keys, env.consts)
    qp = state.qpos.astype(jnp.float64)
    qv = state.qvel.astype(jnp.float64)
    ws = jnp.zeros_like(qv)
    m, ctx = env.model, env.ctx
    step = jax.jit(
        lambda qp, qv, ws, ct: lanes.substeps_batched(
            m, ctx, qp, qv, ct, ws, 4, env.frame_skip, tile2d=False
        )
    )
    key = jax.random.PRNGKey(seed + 1)
    for _ in range(steps):
        key, kk = jax.random.split(key)
        ct = jax.random.uniform(kk, (B, m.nu), minval=-1.0, maxval=1.0,
                                dtype=jnp.float64)
        qp, qv, ws = step(qp, qv, ws, ct)
    return qp, qv, ws, ct


@pytest.mark.parametrize("env_id,k", [("HalfCheetah-v5", 8), ("Ant-v5", 12)])
def test_selected_rows_bit_equal_full(env_id, k):
    env = make_env(env_id, dtype=jnp.float64, solver_iterations=4, contact_topk=0)
    m, ctx = env.model, env.ctx
    qp, qv, ws, _ = _states(env)
    qpl, qvl = qp.T, qv.T
    kin = lanes.kinematics_l(m, qpl)
    com = lanes.com_quantities_l(m, kin)
    con = lanes.collide_l(m, kin.geom_xpos, kin.geom_xmat, ctx.slots, ctx.kind_masks)
    efc_full = lanes.make_efc_l(m, ctx.meta, com, qpl, qvl, con)
    con_k, sel = lanes.select_topk_contacts(ctx.meta, con, k, jnp.float64)
    efc_sel = lanes.make_efc_l(m, ctx.meta, com, qpl, qvl, con_k, sel)

    L, NR, S = ctx.meta.n_limit, ctx.meta.n_rows, ctx.meta.n_slots
    score = jnp.where(con.active, con.dist, jnp.inf)
    idx = np.asarray(jnp.sort(jnp.argsort(score, axis=0)[:k], axis=0))  # [k, B]
    act = np.asarray(con.active)
    # every active slot must be selected on these trajectories (k has
    # headroom over measured simultaneous-contact counts)
    selmask = np.zeros((S, B), bool)
    for b in range(B):
        selmask[idx[:, b], b] = True
    assert not (act & ~selmask).any(), "active slot dropped — raise k"

    JF, JS = np.asarray(efc_full.J), np.asarray(efc_sel.J)
    RF, RS = np.asarray(efc_full.R), np.asarray(efc_sel.R)
    aF, aS = np.asarray(efc_full.aref), np.asarray(efc_sel.aref)
    # limit rows untouched
    np.testing.assert_array_equal(JF[:L], JS[:L])
    # selected contact rows bit-equal their full-path counterparts
    for b in range(B):
        for ki in range(k):
            s = idx[ki, b]
            for rr in range(NR):
                np.testing.assert_array_equal(
                    JF[L + s * NR + rr, :, b], JS[L + ki * NR + rr, :, b]
                )
                assert RF[L + s * NR + rr, b] == RS[L + ki * NR + rr, b]
                assert aF[L + s * NR + rr, b] == aS[L + ki * NR + rr, b]
    # rows the selection dropped were exactly zero in the full path
    for b in range(B):
        for s in range(S):
            if not selmask[s, b]:
                for rr in range(NR):
                    assert np.all(JF[L + s * NR + rr, :, b] == 0.0)
                    assert aF[L + s * NR + rr, b] == 0.0


@pytest.mark.parametrize("env_id", ["HalfCheetah-v5", "Hopper-v5", "Ant-v5",
                                    "Humanoid-v4"])
def test_topk_trajectory_matches_full(env_id):
    """Default-k trajectories track the full-table path. Tolerance covers fp
    reassociation through the finite-iteration Newton solve (zeros are no
    longer interleaved between active rows, so row reductions regroup;
    measured ~1e-10/solve seed amplified through 20 stiff solves/step)."""
    env = make_env(env_id, dtype=jnp.float64, solver_iterations=4, contact_topk=0)
    k = env.contact_topk_default
    assert k, "per-model default missing"
    m, ctx = env.model, env.ctx
    ctx_k = ctx._replace(topk=k)
    qp, qv, ws, _ = _states(env, steps=2)
    stepA = jax.jit(lambda qp, qv, ws, ct: lanes.substeps_batched(
        m, ctx, qp, qv, ct, ws, 4, env.frame_skip, tile2d=False))
    stepB = jax.jit(lambda qp, qv, ws, ct: lanes.substeps_batched(
        m, ctx_k, qp, qv, ct, ws, 4, env.frame_skip, tile2d=False))
    qpB, qvB, wsB = qp, qv, ws
    key = jax.random.PRNGKey(7)
    for _ in range(10):
        key, kk = jax.random.split(key)
        ct = jax.random.uniform(kk, (B, m.nu), minval=-1.0, maxval=1.0,
                                dtype=jnp.float64)
        qp, qv, ws = stepA(qp, qv, ws, ct)
        qpB, qvB, wsB = stepB(qpB, qvB, wsB, ct)
        assert bool(jnp.isfinite(qpB).all())
    np.testing.assert_allclose(np.asarray(qp), np.asarray(qpB), atol=5e-5)
    np.testing.assert_allclose(np.asarray(qv), np.asarray(qvB), atol=5e-4)


def test_step_batch_aux_matches_vmap_step_ant():
    """The lanes-native final substep (final_substep_aux: cfrc_ext/cinert/
    cvel/xpos observables) must reproduce the vmapped reference path through
    the FULL env step — obs (incl. clipped cfrc_ext), reward (incl. contact
    cost), terminations. Ant exercises every piece of the aux path; Humanoid
    shares the code and its extra reads (cinert/cvel/xipos) are pinned by
    test_lanes stage equivalence."""
    env = make_env("Ant-v5", dtype=jnp.float64, solver_iterations=4)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    state, _ = jax.vmap(env.reset, in_axes=(0, None))(keys, env.consts)
    sb = jax.jit(lambda s, a: env.step_batch(s, a, env.consts))
    sv = jax.jit(jax.vmap(lambda s, a: env.step(s, a, env.consts), in_axes=(0, 0)))
    key = jax.random.PRNGKey(1)
    sA = sB_ = state
    for _ in range(6):
        key, kk = jax.random.split(key)
        a = jax.random.uniform(kk, (B, env.act_dim), minval=-1.0, maxval=1.0,
                               dtype=jnp.float64)
        sA, oA, rA, tA, _ = sb(sA, a)
        sB_, oB, rB, tB, _ = sv(sB_, a)
        np.testing.assert_allclose(np.asarray(oA), np.asarray(oB), atol=1e-9)
        np.testing.assert_allclose(np.asarray(rA), np.asarray(rB), atol=1e-10)
        np.testing.assert_array_equal(np.asarray(tA), np.asarray(tB))


def test_truncation_degrades_gracefully():
    """k=1 on a multi-contact state must still produce finite physics (the
    shallowest contacts are ignored, not corrupted)."""
    env = make_env("Ant-v5", dtype=jnp.float64, solver_iterations=4, contact_topk=0)
    m, ctx = env.model, env.ctx
    ctx_1 = ctx._replace(topk=1)
    qp, qv, ws, _ = _states(env, steps=4)
    step = jax.jit(lambda qp, qv, ws, ct: lanes.substeps_batched(
        m, ctx_1, qp, qv, ct, ws, 4, env.frame_skip, tile2d=False))
    key = jax.random.PRNGKey(3)
    for _ in range(5):
        key, kk = jax.random.split(key)
        ct = jax.random.uniform(kk, (B, m.nu), minval=-1.0, maxval=1.0,
                                dtype=jnp.float64)
        qp, qv, ws = step(qp, qv, ws, ct)
    assert bool(jnp.isfinite(qp).all()) and bool(jnp.isfinite(qv).all())
