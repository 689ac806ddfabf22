"""Newton solver unit tests: exact line search, warmstart, QP optimality.

The constraint QP (solver.py) is min_{f>=0} 1/2 f'(A+R)f + f'b; the primal
Newton solver must land on the same optimum as projected Gauss-Seidel run to
convergence, and the warmstart path (x0 = previous qacc) must not change the
answer — only speed up convergence (mj_warmstart semantics).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppo_tpu.physics import solver


def random_problem(seed, nv=12, ne=20):
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(nv, nv)) * 0.3
    M = L @ L.T + np.eye(nv) * 2.0
    J = rng.normal(size=(ne, nv))
    D = rng.uniform(0.5, 5.0, ne)
    aref = rng.normal(size=ne)
    qacc_smooth = rng.normal(size=nv)
    return (jnp.asarray(M), jnp.asarray(J), jnp.asarray(D), jnp.asarray(aref),
            jnp.asarray(qacc_smooth))


def primal_cost(M, J, D, aref, xs, x):
    jar = J @ x - aref
    act = jar < 0
    dx = x - xs
    return float(0.5 * dx @ (M @ dx) + 0.5 * jnp.sum(jnp.where(act, D * jar**2, 0.0)))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_newton_matches_pgs_optimum(seed):
    M, J, D, aref, xs = random_problem(seed)
    f_n, qacc = solver.solve_newton(M, J, D, aref, xs, iterations=20)
    # dual reference: PGS on A = J M^-1 J' + R to convergence
    Minv = jnp.linalg.inv(M)
    A = J @ Minv @ J.T + jnp.diag(1.0 / D)
    b = J @ xs - aref
    f_pgs = solver.solve_pgs(A, b, iterations=3000)
    np.testing.assert_allclose(np.asarray(f_n), np.asarray(f_pgs), atol=1e-6)
    # KKT: qacc = xs + M^-1 J' f
    np.testing.assert_allclose(
        np.asarray(qacc), np.asarray(xs + Minv @ (J.T @ f_n)), atol=1e-6
    )


def test_warmstart_is_transparent_and_faster():
    M, J, D, aref, xs = random_problem(3)
    f_ref, x_ref = solver.solve_newton(M, J, D, aref, xs, iterations=30)
    # warmstarting from the solution: 1 iteration suffices
    f_ws, x_ws = solver.solve_newton(M, J, D, aref, xs, iterations=1, x0=x_ref)
    np.testing.assert_allclose(np.asarray(f_ws), np.asarray(f_ref), atol=1e-8)
    # warmstarting from garbage must not hurt (cost-compare picks xs)
    bad = x_ref + 100.0
    f_bad, x_bad = solver.solve_newton(M, J, D, aref, xs, iterations=20, x0=bad)
    np.testing.assert_allclose(np.asarray(f_bad), np.asarray(f_ref), atol=1e-6)


@pytest.mark.slow  # ~15 s; convergence-rate property, accuracy suites stay fast
def test_exact_line_search_converges_in_few_iterations():
    """The exact 1-D minimize makes per-iteration progress at least as good as
    the old fixed step grid: 8 iterations reach the 30-iteration optimum even
    on dense random problems with heavy active-set churn (physics contact
    problems converge faster; see test_physics_step warmstart parity)."""
    for seed in range(5):
        M, J, D, aref, xs = random_problem(seed, nv=18, ne=32)
        f8, x8 = solver.solve_newton(M, J, D, aref, xs, iterations=8)
        f30, x30 = solver.solve_newton(M, J, D, aref, xs, iterations=30)
        c8 = primal_cost(M, J, D, aref, xs, jnp.asarray(x8))
        c30 = primal_cost(M, J, D, aref, xs, jnp.asarray(x30))
        assert c8 - c30 < 1e-6 * max(1.0, abs(c30)), (seed, c8, c30)


def test_batched_vmap_solve():
    """Lane-parallel batched solve (the TPU layout): vmap over problems."""
    probs = [random_problem(s) for s in range(4)]
    stack = [jnp.stack(x) for x in zip(*probs)]
    f_b, x_b = jax.vmap(lambda M, J, D, a, xs: solver.solve_newton(M, J, D, a, xs, 20))(*stack)
    for i, (M, J, D, aref, xs) in enumerate(probs):
        f_i, x_i = solver.solve_newton(M, J, D, aref, xs, 20)
        np.testing.assert_allclose(np.asarray(f_b[i]), np.asarray(f_i), atol=1e-6)
