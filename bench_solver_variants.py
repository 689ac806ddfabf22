"""Newton-solver variant microbench at Humanoid shapes (ne=552, nv=23).

Isolates the constraint solve from the rest of the substep to pick the
fastest formulation on the chip:
  cg_matfree   round-3 production: matrix-free Jacobi-CG (re-reads J)
  cg_matH      materialized H = M + J^T D J, CG reads H only
  chol_direct  materialized H, batched Cholesky direct solve (no CG loop)

Also A/Bs the H-build formulation (einsum ellipsis vs batch-leading matmul).
Run on the real chip; prints one JSON line per variant.
"""

import functools
import json
import statistics
import time

import jax
import jax.numpy as jnp


def _fetch(x):
    return float(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def _time(fn, *args, reps=5):
    out = fn(*args)
    _fetch(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _fetch(out)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


import os

def make_problem(ne=int(os.environ.get("NE", 552)),
                 nv=int(os.environ.get("NV", 23)),
                 B=int(os.environ.get("BATCH", 1024)), key=0):
    k = jax.random.split(jax.random.PRNGKey(key), 6)
    # SPD mass matrix: A A^T + nv I, lane layout [nv, nv, B]
    A = jax.random.normal(k[0], (B, nv, nv), jnp.float32)
    M = (A @ jnp.swapaxes(A, 1, 2) + nv * jnp.eye(nv)).transpose(1, 2, 0)
    J = 0.3 * jax.random.normal(k[1], (ne, nv, B), jnp.float32)
    D = jax.nn.softplus(jax.random.normal(k[2], (ne, B), jnp.float32)) * 10
    aref = jax.random.normal(k[3], (ne, B), jnp.float32)
    qs = jax.random.normal(k[4], (nv, B), jnp.float32)
    x0 = qs + 0.01 * jax.random.normal(k[5], (nv, B), jnp.float32)
    return M, J, D, aref, qs, x0


def newton(M, J, D, aref, qs, x0, iterations=4, mode="cg_matH", hbuild="einsum"):
    nv = M.shape[0]

    def mv_M(x):
        return jnp.sum(M * x[None], 1)

    def mv_J(x):
        return jnp.sum(J * x[None], 1)

    def mv_JT(e):
        return jnp.sum(J * e[:, None], 0)

    eye = jnp.eye(nv, dtype=M.dtype)
    xs = qs
    x = x0

    def build_H(d):
        if hbuild == "einsum":
            return M + jnp.einsum("ei...,ej...->ij...", J, d[:, None] * J)
        if hbuild == "bcast":
            # stay in VPU-land: fused broadcast-multiply + reduce over e,
            # no dot_general (tiny per-env matmuls underuse the MXU)
            dJ = d[:, None] * J                          # [ne, nv, B]
            return M + jnp.sum(J[:, :, None] * dJ[:, None, :], 0)
        # batch-leading matmul: transpose J to [B, nv, ne] once
        Jb = jnp.transpose(J, (2, 1, 0))                 # [B, nv, ne]
        dJb = jnp.transpose(d[:, None] * J, (2, 0, 1))   # [B, ne, nv]
        return M + jnp.transpose(Jb @ dJb, (1, 2, 0))

    def body(_, x):
        jar = mv_J(x) - aref
        d = jnp.where(jar < 0, D, 0.0)
        mxs = mv_M(x - xs)
        g = mxs + mv_JT(d * jar)

        if mode == "cg_matfree":
            def Hmv(p):
                return mv_M(p) + mv_JT(d * mv_J(p))

            Pinv = 1.0 / (jnp.sum(M * eye[..., None], 1) + jnp.sum(d[:, None] * J * J, 0))
            r = -g
            z = Pinv * r
            p = z
            dx = jnp.zeros_like(g)
            rz = jnp.sum(r * z, 0)

            def cg(_, c):
                dx, r, p, rz = c
                hp = Hmv(p)
                alpha = rz / jnp.maximum(jnp.sum(p * hp, 0), 1e-30)
                dx = dx + alpha * p
                r = r - alpha * hp
                z = Pinv * r
                rz2 = jnp.sum(r * z, 0)
                return dx, r, z + rz2 / jnp.maximum(rz, 1e-30) * p, rz2

            dx, *_ = jax.lax.fori_loop(0, nv, cg, (dx, r, p, rz))
        elif mode == "cg_matH":
            H = build_H(d)

            def Hmv(p):
                return jnp.sum(H * p[None], 1)

            Pinv = 1.0 / jnp.sum(H * eye[..., None], 1)
            r = -g
            z = Pinv * r
            p = z
            dx = jnp.zeros_like(g)
            rz = jnp.sum(r * z, 0)

            def cg(_, c):
                dx, r, p, rz = c
                hp = Hmv(p)
                alpha = rz / jnp.maximum(jnp.sum(p * hp, 0), 1e-30)
                dx = dx + alpha * p
                r = r - alpha * hp
                z = Pinv * r
                rz2 = jnp.sum(r * z, 0)
                return dx, r, z + rz2 / jnp.maximum(rz, 1e-30) * p, rz2

            dx, *_ = jax.lax.fori_loop(0, nv, cg, (dx, r, p, rz))
        else:  # chol_direct
            H = build_H(d)
            Hb = jnp.transpose(H, (2, 0, 1))             # [B, nv, nv]
            L = jnp.linalg.cholesky(Hb)
            gb = jnp.transpose(-g, (1, 0))[..., None]    # [B, nv, 1]
            y = jax.scipy.linalg.solve_triangular(L, gb, lower=True)
            dxb = jax.scipy.linalg.solve_triangular(
                jnp.swapaxes(L, 1, 2), y, lower=False)
            dx = jnp.transpose(dxb[..., 0], (1, 0))

        mdx = mv_M(dx)
        dmd = jnp.sum(dx * mdx, 0)
        g0 = jnp.sum(dx * mxs, 0)
        dj = mv_J(dx)
        a = jnp.ones(x.shape[1:], x.dtype)
        for _ls in range(8):
            rr = jar + a * dj
            act = rr < 0
            dphi = g0 + a * dmd + jnp.sum(jnp.where(act, D * rr * dj, 0.0), 0)
            ddphi = dmd + jnp.sum(jnp.where(act, D * dj * dj, 0.0), 0)
            a = a - dphi / jnp.maximum(ddphi, 1e-12)

        def pen(j):
            return 0.5 * jnp.sum(jnp.where(j < 0, D * j * j, 0.0), 0)

        quad_x = 0.5 * jnp.sum((x - xs) * mxs, 0)
        cost_x = quad_x + pen(jar)
        cost_new = quad_x + a * g0 + 0.5 * a * a * dmd + pen(jar + a * dj)
        a = jnp.where(cost_new < cost_x, a, 0.0)
        return x + a * dx

    x = jax.lax.fori_loop(0, iterations, body, x)
    jar = mv_J(x) - aref
    return jnp.where(jar < 0, -D * jar, 0.0), x


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    prob = make_problem()
    ref = None
    SCAN = 20  # amortize the ~26 ms tunnel-call RTT over many solves
    variants = [("cg_matfree", "einsum"), ("cg_matH", "einsum"),
                ("cg_matH", "matmul"), ("cg_matH", "bcast")]
    if os.environ.get("CHOL"):
        variants += [("chol_direct", "einsum"), ("chol_direct", "matmul")]
    for mode, hbuild in variants:
        one = functools.partial(newton, mode=mode, hbuild=hbuild)

        @jax.jit
        def fn(M, J, D, aref, qs, x0, _one=one):
            def body(x, _):
                f, x2 = _one(M, J, D, aref, qs, x)
                return x2 + 1e-6, f  # chain reps so they cannot overlap
            x, fs = jax.lax.scan(body, x0, None, length=SCAN)
            return fs.sum(), x

        try:
            dt = _time(fn, *prob) / SCAN
            f, x = newton_out = jax.jit(one)(*prob)
            x = jax.device_get(x)
            if ref is None:
                ref = x
            err = float(jnp.max(jnp.abs(jnp.asarray(x) - ref)) /
                        (1e-9 + float(jnp.max(jnp.abs(ref)))))
            print(json.dumps({"mode": mode, "hbuild": hbuild,
                              "ms": round(dt * 1e3, 2), "rel_err_vs_first": round(err, 6)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"mode": mode, "hbuild": hbuild, "error": repr(e)[:150]}),
                  flush=True)


if __name__ == "__main__":
    main()
