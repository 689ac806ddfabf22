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
