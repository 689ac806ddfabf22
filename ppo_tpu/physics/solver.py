"""Constraint-force solvers for the dual box-constrained QP.

The soft-constraint problem reduces to
    min_{f >= 0}  1/2 f^T (A + R) f + f^T b,
    A = J M^-1 J^T,  b = J qacc_smooth - aref,
whose unique optimum equals MuJoCo's converged Newton/PGS/CG solution. We run
projected Gauss-Seidel (the solver humanoid.xml configures, and a fixed-point
XLA-friendly iteration): a `lax.scan` over sweeps with a `fori_loop` over rows,
so the compiled graph is O(1) in the number of constraint rows.

Batched solving (the vectorized-env hot path) has a dedicated lane-major
implementation: XLA lays a vmapped [B, ne, nv] jacobian out with the tiny
trailing dims on the (sublane, lane) tile, padding nv -> 128 lanes (~14x
wasted HBM traffic on every touch; measured to dominate the whole step). The
batched path instead runs with the env axis in lanes ([..., B]) inside ONE
Pallas kernel per block of envs: J/M/D stay VMEM-resident across all Newton
iterations, the nv x nv Cholesky is unrolled (every primitive op is a full
[B_block] vector op), and HBM sees each operand exactly once. The kernel is
installed as a custom-vmap rule on `solve_newton`, so single-env code and
tests are unchanged and CPU runs keep the reference implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ppo_tpu.physics import math as pm


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
        # CG instead of cholesky (physics.math.spd_solve): exact Newton
        # direction up to roundoff, no batched triangular solves
        dx = -pm.spd_solve(H, g)

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


# ---------------------------------------------------------------------------
# Lane-major batched Newton (the vectorized-env hot path)
# ---------------------------------------------------------------------------


def _newton_lanes(Mt, Jt, Dt, at, qst, x0t, iterations, ls_iterations,
                  cg_iterations=None, materialize_h=None):
    """solve_newton math with the env batch in the LAST axis.

    Mt [nv,nv,B], Jt [ne,nv,B], Dt/at [ne,B], qst/x0t [nv,B]. Every primitive
    op is an elementwise/reduce op over [B] or [ne,B] — full lane utilization
    on TPU, no tiny trailing dims to pad, and small enough graphs for Mosaic
    (unrolled per-element Cholesky blows the kernel compiler up at ~80+
    sliced subexpressions, so the Newton direction is computed MATRIX-FREE
    instead: Jacobi-preconditioned CG on H dx = -g where H@p costs two J
    matvecs and one M matvec — no H is ever materialized). nv CG iterations
    reproduce the exact Newton direction up to f32 roundoff; the exact line
    search then matches the reference solver's step. Usable both inside a
    Pallas kernel and as a plain-JAX fallback.
    """
    nv = Mt.shape[0]
    cg_iters = cg_iterations or nv

    # matvecs as broadcast-multiply-reduce (no dot_general: Mosaic-safe and
    # every temp stays a [.., *B] lane-major tile; batch may be flat [.., B]
    # or tile-2D [.., B//128, 128] — all ops below are batch-rank-agnostic)
    nb = Mt.ndim - 2

    def matvec_M(x):
        return jnp.sum(Mt * x[None], 1)

    def matvec_J(x):
        return jnp.sum(Jt * x[None], 1)

    def matvec_JT(e):
        return jnp.sum(Jt * e[:, None], 0)

    # diag(M) without array-literal identity: iota comparison mask
    r_ = jax.lax.broadcasted_iota(jnp.int32, (nv, nv), 0)
    c_ = jax.lax.broadcasted_iota(jnp.int32, (nv, nv), 1)
    eye = (r_ == c_).astype(Mt.dtype)
    diagM = jnp.sum(Mt * eye[(Ellipsis,) + (None,) * nb], 1)   # [nv, *B]

    xs = qst

    def pen(j):
        return 0.5 * jnp.sum(jnp.where(j < 0, Dt * j * j, 0.0), 0)

    # the constraint residual jar = J x - aref is CARRIED through the Newton
    # loop (updated incrementally as jar + a*dj after the line search) instead
    # of being recomputed — each avoided recompute is a full HBM pass over the
    # [ne, nv, *B] Jacobian, the measured cost center for tall systems
    jar_xs = matvec_J(xs) - at
    jar_x0 = matvec_J(x0t) - at
    dx0 = x0t - xs
    cost_x0 = 0.5 * jnp.sum(dx0 * matvec_M(dx0), 0) + pen(jar_x0)
    take_x0 = cost_x0 < pen(jar_xs)
    x = jnp.where(take_x0, x0t, xs)
    jar0 = jnp.where(take_x0, jar_x0, jar_xs)

    # Materialized-Hessian mode (XLA path only; the in-kernel trace stays
    # matrix-free to keep VMEM small): the CG loop otherwise re-reads the
    # [ne, nv, *B] Jacobian ~2x per iteration x nv iterations x Newton
    # iterations — for Humanoid (ne=552, nv=23) that is ~50 HBM passes over a
    # 13 MB/256-env tensor per solve, which measured as the whole bottleneck
    # (54 ms per 256-env RK4 step). H = M + J^T diag(d) J is only [nv,nv,*B]
    # (0.5 MB at 256 envs): build it ONCE per Newton iteration with a
    # batched-matmul einsum (MXU) and let CG read the small tensor instead.
    # Same math: Hmv(p) == matvec_M(p) + matvec_JT(d * matvec_J(p)) exactly
    # (associativity of the contraction; f32 reduction order differs only).
    from ppo_tpu.physics.types import KERNEL_MODE

    if materialize_h is None:
        # default: XLA tracing only (never inside a Pallas kernel body —
        # _newton_pallas passes False; mega.py is covered by KERNEL_MODE).
        # Per-shape chip measurements (bench_solver_variants.py): CG on the
        # materialized H beats matrix-free everywhere on the XLA path —
        # Humanoid (ne=552) 3.1x, Ant (ne=100) 1.2x, HalfCheetah (ne=64)
        # 1.3x — but the winning H-BUILD differs: tall systems want the
        # batched-matmul einsum (one pass over J, MXU contraction), short
        # systems want the fused broadcast-reduce (the einsum's transposes
        # dominate at small ne; the bcast build re-reads J ~nv times, fine
        # when nv is small, ruinous at Humanoid's nv=23: 8.0 vs 2.1 ms).
        materialize_h = not KERNEL_MODE[0]

    ne_here = Jt.shape[0]

    def body(_, carry):
        x, jar = carry
        d = jnp.where(jar < 0, Dt, 0.0)                 # [ne, B]
        mxs = matvec_M(x - xs)                          # reused: g, g0, costs
        g = mxs + matvec_JT(d * jar)

        if materialize_h:
            # H[i,j,*B] = M[i,j,*B] + sum_e J[e,i,*B] d[e,*B] J[e,j,*B]
            dJ = d[:, None] * Jt
            if ne_here >= 256:
                H = Mt + jnp.einsum("ei...,ej...->ij...", Jt, dJ)
            else:
                H = Mt + jnp.sum(Jt[:, :, None] * dJ[:, None, :], 0)

            def Hmv(p):
                return jnp.sum(H * p[None], 1)

            Pinv = 1.0 / jnp.sum(H * eye[(Ellipsis,) + (None,) * nb], 1)
        else:
            def Hmv(p):
                return matvec_M(p) + matvec_JT(d * matvec_J(p))

            Pinv = 1.0 / (diagM + jnp.sum(d[:, None] * Jt * Jt, 0))

        # Jacobi-preconditioned CG for H dx = -g
        r = -g
        z = Pinv * r
        p = z
        dx = jnp.zeros_like(g)
        rz = jnp.sum(r * z, 0)

        def cg_body(_, carry):
            dx, r, p, rz = carry
            hp = Hmv(p)
            denom = jnp.maximum(jnp.sum(p * hp, 0), 1e-30)
            alpha = rz / denom
            dx = dx + alpha * p
            r = r - alpha * hp
            z = Pinv * r
            rz_new = jnp.sum(r * z, 0)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            return dx, r, z + beta * p, rz_new

        dx, r, p, rz = jax.lax.fori_loop(0, cg_iters, cg_body, (dx, r, p, rz))

        mdx = matvec_M(dx)
        dmd = jnp.sum(dx * mdx, 0)
        g0 = jnp.sum(dx * mxs, 0)
        dj = matvec_J(dx)

        a = jnp.ones(x.shape[1:], x.dtype)
        for _ls in range(ls_iterations):
            rr = jar + a * dj
            act = rr < 0
            dphi = g0 + a * dmd + jnp.sum(jnp.where(act, Dt * rr * dj, 0.0), 0)
            ddphi = dmd + jnp.sum(jnp.where(act, Dt * dj * dj, 0.0), 0)
            a = a - dphi / jnp.maximum(ddphi, 1e-12)
        # acceptance check WITHOUT fresh J/M matvecs: the quadratic term of
        # cost(x + a dx) expands to quad(x) + a g0 + a^2/2 dmd, and the
        # constraint residual there is jar + a dj — all already in registers
        quad_x = 0.5 * jnp.sum((x - xs) * mxs, 0)
        cost_x = quad_x + pen(jar)
        cost_new = quad_x + a * g0 + 0.5 * a * a * dmd + pen(jar + a * dj)
        a = jnp.where(cost_new < cost_x, a, 0.0)
        return x + a * dx, jar + a * dj

    x, jar = jax.lax.fori_loop(0, iterations, body, (x, jar0))
    f = jnp.where(jar < 0, -Dt * jar, 0.0)
    return f, x


def _pick_block(ne, nv, B, dtype_bytes=4, budget=512 * 1024):
    """Largest lane block (multiple of 128) whose [ne, nv, block] jacobian
    tile fits `budget`. The Mosaic VMEM *stack* holds several such temps at
    once (J block double-buffered + Jt*Jt + matvec products), so the budget
    is ~1/10 of the 16 MB scoped-vmem limit. Returns None when even 128
    lanes will not fit (very large ne*nv, e.g. humanoid's 569x23) — callers
    fall back to the XLA path."""
    for bb in (1024, 512, 256, 128):
        if bb <= B and B % bb == 0 and ne * nv * bb * dtype_bytes <= budget:
            return bb
    if ne * nv * 128 * dtype_bytes <= 2 * budget:
        return 128
    return None


def _newton_pallas(Mt, Jt, Dt, at, qst, x0t, iterations, ls_iterations, interpret=False):
    """One Pallas kernel per block of envs: operands are loaded into VMEM once
    and stay resident across every Newton iteration (vs one full HBM sweep per
    op in the XLA path)."""
    from jax.experimental import pallas as pl

    nv, B = qst.shape
    ne = Jt.shape[0]
    bb = _pick_block(ne, nv, B)
    dtype = qst.dtype

    def kernel(M_ref, J_ref, D_ref, a_ref, qs_ref, x0_ref, f_ref, x_ref):
        f, x = _newton_lanes(
            M_ref[...], J_ref[...], D_ref[...], a_ref[...], qs_ref[...],
            x0_ref[...], iterations, ls_iterations,
            materialize_h=False,  # Mosaic kernel body: no dot_general/einsum
        )
        f_ref[...] = f
        x_ref[...] = x

    f, x = pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((nv, nv, bb), lambda i: (0, 0, i)),
            pl.BlockSpec((ne, nv, bb), lambda i: (0, 0, i)),
            pl.BlockSpec((ne, bb), lambda i: (0, i)),
            pl.BlockSpec((ne, bb), lambda i: (0, i)),
            pl.BlockSpec((nv, bb), lambda i: (0, i)),
            pl.BlockSpec((nv, bb), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((ne, bb), lambda i: (0, i)),
            pl.BlockSpec((nv, bb), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ne, B), dtype),
            jax.ShapeDtypeStruct((nv, B), dtype),
        ],
        interpret=interpret,
    )(Mt, Jt, Dt, at, qst, x0t)
    return f, x


def solve_newton_lanes(Mt, Jt, Dt, at, qst, x0t, iterations, ls_iterations=8):
    """Newton solve for operands ALREADY in lane-major layout (Mt [nv,nv,B],
    Jt [ne,nv,B], Dt/at [ne,B], qst/x0t [nv,B]): dispatch to the Pallas
    VMEM-resident kernel when the block budget allows, else run the plain-JAX
    lane implementation (same math). Used by physics.lanes.forward_l, which
    keeps the whole substep in lane layout so no transpose is needed here."""
    from ppo_tpu.physics.types import KERNEL_MODE

    ne, nv = Jt.shape[0], Jt.shape[1]
    B = qst.shape[-1]
    use_pallas = (
        not KERNEL_MODE[0]  # already inside a Pallas kernel: no nesting
        and jax.default_backend() != "cpu"
        and qst.dtype == jnp.float32  # Mosaic has no f64
        and Jt.ndim == 3  # flat batch only (tile-2D batch runs the XLA path)
        and ne > 0
        and B % 128 == 0
        and _pick_block(ne, nv, B) is not None
    )
    if use_pallas:
        return _newton_pallas(Mt, Jt, Dt, at, qst, x0t, iterations, ls_iterations)
    return _newton_lanes(Mt, Jt, Dt, at, qst, x0t, iterations, ls_iterations)


def solve_newton_batched(M, J, D, aref, qs, x0=None, iterations=10,
                         ls_iterations=8, force_pallas=None, interpret=False):
    """Batch-first API ([B, ...] operands): transpose to lanes and run the
    Pallas kernel (TPU) or the reference vmapped solver (CPU/tests)."""
    B = qs.shape[0]
    ne = J.shape[1]
    if x0 is None:
        x0 = qs
    use_pallas = force_pallas
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() != "cpu"
            and qs.dtype == jnp.float32  # Mosaic has no f64
            and ne > 0
            and _pick_block(ne, J.shape[2], max(B, 128)) is not None
        )
    if not use_pallas:
        return jax.vmap(
            lambda m_, j_, d_, a_, q_, w_: solve_newton(
                m_, j_, d_, a_, q_, iterations=iterations, x0=w_,
                ls_iterations=ls_iterations)
        )(M, J, D, aref, qs, x0)

    pad = (-B) % 128
    if pad:
        padded = [jnp.concatenate([v, jnp.repeat(v[:1], pad, 0)], 0)
                  for v in (M, J, D, aref, qs, x0)]
    else:
        padded = [M, J, D, aref, qs, x0]
    Mt = jnp.transpose(padded[0], (1, 2, 0))
    Jt = jnp.transpose(padded[1], (1, 2, 0))
    Dt = padded[2].T
    at = padded[3].T
    qst = padded[4].T
    x0t = padded[5].T
    f, x = _newton_pallas(Mt, Jt, Dt, at, qst, x0t, iterations, ls_iterations,
                          interpret=interpret)
    return f.T[:B], x.T[:B]


@functools.lru_cache(maxsize=None)
def _newton_cv(iterations, ls_iterations):
    """custom_vmap'd Newton: single-env calls use the reference solver; a
    vmapped call (the vectorized-env path) dispatches to the batched
    lane-major implementation."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def nt(M, J, D, aref, qs, x0):
        return solve_newton(M, J, D, aref, qs, iterations=iterations,
                            x0=x0, ls_iterations=ls_iterations)

    @nt.def_vmap
    def nt_vmap(axis_size, in_batched, M, J, D, aref, qs, x0):
        ops = []
        for v, b in zip((M, J, D, aref, qs, x0), in_batched):
            ops.append(v if b else jnp.broadcast_to(v[None], (axis_size,) + v.shape))
        f, x = solve_newton_batched(*ops, iterations=iterations,
                                    ls_iterations=ls_iterations)
        return (f, x), (True, True)

    return nt
