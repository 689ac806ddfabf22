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


def solve_newton(M, J, D, aref, qacc_smooth, iterations=10):
    """Primal Newton solver (MuJoCo's default): minimize over x = qacc
        0.5 (x - xs)' M (x - xs) + 0.5 sum_i [jar_i < 0] D_i jar_i^2,
        jar = J x - aref,
    whose optimum satisfies the dual QP's KKT conditions exactly
    (f = -D * jar on the active set). Unlike Gauss-Seidel, every operation is
    a dense batched matvec/cholesky — the TPU-friendly hot path.

    Structurally-inactive rows arrive with J = 0, aref = 0 so jar = 0 and they
    never activate. Returns (f, qacc).
    """
    dtype = qacc_smooth.dtype
    xs = qacc_smooth

    def cost(x):
        jar = J @ x - aref
        act = jar < 0
        dx = x - xs
        return 0.5 * dx @ (M @ dx) + 0.5 * jnp.sum(jnp.where(act, D * jar * jar, 0.0))

    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.0625, 0.0], dtype)

    def body(x, _):
        jar = J @ x - aref
        d = jnp.where(jar < 0, D, 0.0)
        H = M + J.T @ (d[:, None] * J)
        g = M @ (x - xs) + J.T @ (d * jar)
        dx = -jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(H), g)
        # safeguarded step: pick the best of a few step sizes (piecewise-
        # quadratic cost; alpha=0 guarantees monotonicity)
        costs = jax.vmap(lambda a: cost(x + a * dx))(alphas)
        x = x + alphas[jnp.argmin(costs)] * dx
        return x, None

    x, _ = jax.lax.scan(body, xs, None, length=iterations)
    jar = J @ x - aref
    f = jnp.where(jar < 0, -D * jar, 0.0)
    return f, x
