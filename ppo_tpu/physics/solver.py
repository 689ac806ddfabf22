"""Constraint-force solvers for the dual box-constrained QP.

The soft-constraint problem reduces to
    min_{f >= 0}  1/2 f^T (A + R) f + f^T b,
    A = J M^-1 J^T,  b = J qacc_smooth - aref,
whose unique optimum equals MuJoCo's converged Newton/PGS/CG solution. We run
projected Gauss-Seidel (the solver humanoid.xml configures, and a fixed-point
XLA-friendly iteration): a `lax.scan` over sweeps with a `fori_loop` over rows,
so the compiled graph is O(1) in the number of constraint rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_pgs(A: jnp.ndarray, b: jnp.ndarray, iterations: int) -> jnp.ndarray:
    """Projected Gauss-Seidel for min_{f>=0} 1/2 f'Af + f'b (A SPD)."""
    ne = A.shape[0]
    if ne == 0:
        return jnp.zeros((0,), A.dtype)
    diag = jnp.maximum(jnp.diag(A), 1e-12)

    def row_update(i, f):
        fi = f[i] - (A[i] @ f + b[i]) / diag[i]
        return f.at[i].set(jnp.maximum(fi, 0.0))

    def sweep(f, _):
        return jax.lax.fori_loop(0, ne, row_update, f), None

    f0 = jnp.zeros(ne, A.dtype)
    f, _ = jax.lax.scan(sweep, f0, None, length=iterations)
    return f


def solve_newton(M, J, D, aref, qacc_smooth, iterations=10, x0=None,
                 ls_iterations=8):
    """Primal Newton solver (MuJoCo's default): minimize over x = qacc
        0.5 (x - xs)' M (x - xs) + 0.5 sum_i [jar_i < 0] D_i jar_i^2,
        jar = J x - aref,
    whose optimum satisfies the dual QP's KKT conditions exactly
    (f = -D * jar on the active set). Unlike Gauss-Seidel, every operation is
    a dense batched matvec/cholesky — the TPU-friendly hot path.

    `x0` is an optional warmstart (MuJoCo's qacc_warmstart): the start point is
    whichever of {x0, qacc_smooth} has lower cost (mj_warmstart semantics),
    which typically halves the iterations needed in steady state.

    The line search is exact along each Newton direction: the 1-D restriction
    of the cost is piecewise quadratic in alpha with positive curvature, so a
    few scalar Newton steps on phi'(alpha) land on the exact minimizer — the
    same scheme MuJoCo's Newton solver uses — at the price of two extra
    vector ops per solver iteration (no extra matvecs or factorizations).

    Structurally-inactive rows arrive with J = 0, aref = 0 so jar = 0 and they
    never activate. Returns (f, qacc).
    """
    xs = qacc_smooth

    def cost(x):
        jar = J @ x - aref
        act = jar < 0
        dx = x - xs
        return 0.5 * dx @ (M @ dx) + 0.5 * jnp.sum(jnp.where(act, D * jar * jar, 0.0))

    if x0 is None:
        x_init = xs
    else:
        x_init = jnp.where(cost(x0) < cost(xs), x0, xs)

    def body(x, _):
        jar = J @ x - aref
        d = jnp.where(jar < 0, D, 0.0)
        H = M + J.T @ (d[:, None] * J)
        g = M @ (x - xs) + J.T @ (d * jar)
        dx = -jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(H), g)

        # exact line search on phi(a) = cost(x + a dx): piecewise quadratic,
        # phi'(a) = g0 + a*dmd + sum_act D (jar + a dj) dj with the active set
        # a function of a — scalar Newton converges to the exact minimizer.
        mdx = M @ dx
        dmd = dx @ mdx
        g0 = dx @ (M @ (x - xs))
        dj = J @ dx

        def ls_step(a, _):
            r = jar + a * dj
            act = r < 0
            dphi = g0 + a * dmd + jnp.sum(jnp.where(act, D * r * dj, 0.0))
            ddphi = dmd + jnp.sum(jnp.where(act, D * dj * dj, 0.0))
            return a - dphi / jnp.maximum(ddphi, 1e-12), None

        a, _ = jax.lax.scan(ls_step, jnp.ones((), x.dtype), None, length=ls_iterations)
        # safeguard: never increase the cost (alpha=0 fallback)
        a = jnp.where(cost(x + a * dx) < cost(x), a, 0.0)
        return x + a * dx, None

    x, _ = jax.lax.scan(body, x_init, None, length=iterations)
    jar = J @ x - aref
    f = jnp.where(jar < 0, -D * jar, 0.0)
    return f, x
