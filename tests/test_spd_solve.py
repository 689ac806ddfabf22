"""spd_solve (Jacobi-CG) accuracy vs direct solves — ADVICE round 1.

spd_solve replaces Cholesky in every hot-path solve, including the Newton
Hessian H = M + J' diag(d) J under stiff contact. These tests pin its
accuracy on (a) REAL Hessians harvested from contact-rich physics states of
Ant and Humanoid (the representative case the advisor asked for), (b) a
synthetic stiff-few-rows case (large impedance d on a small active set, the
worst structured case), and document the known limit: on adversarial dense
systems with cond >= 1e6, 2n-iteration CG does not converge in f32 — the
Newton solver's exact line search with cost-decrease safeguard
(physics/solver.py) bounds the damage of an inexact direction, and the
trajectory suites (test_physics_step.py) pin the end-to-end effect.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppo_tpu.envs import make_env
from ppo_tpu.physics import collision, constraint, smooth
from ppo_tpu.physics.math import spd_solve

pytestmark = pytest.mark.slow


def _real_hessians(env_id, n_states=3, seed=0):
    """H = M + J' diag(d) J at states reached by random actions."""
    env = make_env(env_id, dtype=jnp.float64)
    m, ctx = env.model, env.ctx
    step = jax.jit(env.step)

    @jax.jit
    def hessian(qpos, qvel):
        kin = smooth.kinematics(m, qpos)
        com = smooth.com_quantities(m, kin)
        M = smooth.crb_mass_matrix(m, com, ctx.mask)
        con = collision.collide(m, kin.geom_xpos, kin.geom_xmat, ctx.slots, ctx.kind_masks)
        efc = constraint.make_efc(m, ctx.meta, com, qpos, qvel, con)
        d = jnp.where(efc.active, 1.0 / efc.R, 0.0)
        return M + efc.J.T @ (d[:, None] * efc.J)

    key = jax.random.PRNGKey(seed)
    state, _ = env.reset(key)
    out = []
    rng = np.random.default_rng(seed)
    for t in range(n_states * 3):
        act = rng.uniform(env.action_low, env.action_high, env.act_dim)
        state = step(state, jnp.asarray(act))[0]
        if t % 3 == 2:
            out.append(np.asarray(hessian(state.qpos, state.qvel)))
    return out


@pytest.mark.parametrize("env_id", ["Ant-v5", "Humanoid-v4"])
def test_real_contact_hessians(env_id):
    rng = np.random.default_rng(1)
    for H in _real_hessians(env_id):
        n = H.shape[0]
        b = rng.standard_normal(n)
        x_ref = np.linalg.solve(H, b)
        x64 = np.asarray(spd_solve(jnp.asarray(H), jnp.asarray(b)))
        rel64 = np.linalg.norm(x64 - x_ref) / np.linalg.norm(x_ref)
        assert rel64 < 1e-8, (env_id, np.linalg.cond(H), rel64)
        x32 = np.asarray(spd_solve(jnp.asarray(H, jnp.float32), jnp.asarray(b, jnp.float32)))
        rel32 = np.linalg.norm(x32 - x_ref) / np.linalg.norm(x_ref)
        assert rel32 < 1e-3, (env_id, np.linalg.cond(H), rel32)


def test_stiff_few_active_rows():
    """Worst structured case: a few very stiff constraint rows (d ~ 1e5) on a
    light mass matrix — Jacobi preconditioning absorbs the row scale."""
    rng = np.random.default_rng(2)
    nv, k = 23, 3
    M = np.eye(nv) * 0.3 + 0.05 * np.diag(rng.random(nv))
    J = rng.standard_normal((k, nv))
    d = np.full(k, 1e5)
    H = M + J.T @ (d[:, None] * J)
    b = rng.standard_normal(nv)
    x_ref = np.linalg.solve(H, b)
    x = np.asarray(spd_solve(jnp.asarray(H), jnp.asarray(b)))
    rel = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    # raw cond(H) ~ 1e5-1e6 here; Jacobi preconditioning recovers a usable
    # f64 direction (the REAL-Hessian tests above pin the tight bound the
    # physics actually needs; this documents graceful degradation)
    assert rel < 1e-4, (np.linalg.cond(H), rel)


def test_batched_matches_loop():
    """Multiple right-hand sides solve to the same result as per-column."""
    rng = np.random.default_rng(3)
    n, k = 9, 5
    A = rng.standard_normal((n, n))
    H = A @ A.T + n * np.eye(n)
    B = rng.standard_normal((n, k))
    X = np.asarray(spd_solve(jnp.asarray(H), jnp.asarray(B)))
    for j in range(k):
        xj = np.asarray(spd_solve(jnp.asarray(H), jnp.asarray(B[:, j])))
        np.testing.assert_allclose(X[:, j], xj, atol=1e-12)
        np.testing.assert_allclose(X[:, j], np.linalg.solve(H, B[:, j]), atol=1e-9)
