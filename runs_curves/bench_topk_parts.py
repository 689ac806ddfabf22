"""Microbench the pieces of top-k contact selection on the chip: which op
makes selection a net loss (argsort? batched take_along_axis? static-table
gathers? the selected row assembly itself?). Each timed fn runs under a
20-iteration scan to amortize the ~26 ms tunnel RTT."""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from ppo_tpu.envs import make_env
from ppo_tpu.physics import lanes, solver


def timeit(name, fn, *args, reps=3):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ms = statistics.median(ts) / 20 * 1e3
    print(f"{name}: {ms:.3f} ms/iter", flush=True)
    return ms


def scan20(f):
    def g(*args):
        def body(c, _):
            return f(*c), None

        c, _ = jax.lax.scan(body, args, None, length=20)
        return c

    return g


for eid, k, B in [("Ant-v5", 12, 2048), ("Humanoid-v4", 16, 1024)]:
    print(f"== {eid} k={k} B={B} ==", flush=True)
    env = make_env(eid, solver_iterations=4, contact_topk=0)
    m, ctx = env.model, env.ctx
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    state, obs = jax.jit(jax.vmap(env.reset, in_axes=(0, None)))(keys, env.consts)
    qp = state.qpos.T.reshape(m.nq, B // 128, 128)
    qv = state.qvel.T.reshape(m.nv, B // 128, 128)

    kin = jax.jit(lambda qp: lanes.kinematics_l(m, qp))(qp)
    con = jax.jit(
        lambda gp, gm: lanes.collide_l(m, gp, gm, ctx.slots, ctx.kind_masks)
    )(kin.geom_xpos, kin.geom_xmat)
    com = jax.jit(lambda: lanes.com_quantities_l(m, kin))()
    score0 = jnp.where(con.active, con.dist, jnp.inf)

    # 1) argsort + sort
    def f_sort(score):
        idx = jnp.sort(jnp.argsort(score, axis=0)[:k], axis=0)
        return (score + 1e-30 * jnp.sum(idx.astype(score.dtype)),)

    timeit("argsort+sort", scan20(f_sort), score0)

    # 2) + batched take_along_axis of collision outputs
    def f_tala(score):
        idx = jnp.sort(jnp.argsort(score, axis=0)[:k], axis=0)
        d = jnp.take_along_axis(con.dist, idx, 0)
        p = jnp.take_along_axis(con.pos, idx[:, None], 0)
        f = jnp.take_along_axis(con.frame, idx[:, None, None], 0)
        return (score + 1e-30 * (jnp.sum(d) + jnp.sum(p) + jnp.sum(f)),)

    timeit("argsort+collision-gathers", scan20(f_tala), score0)

    # 3) + static-table gathers (the full select_topk_contacts)
    def f_full(score):
        con2, sel = lanes.select_topk_contacts(ctx.meta, con, k, jnp.float32)
        return (score + 1e-30 * (jnp.sum(con2.dist) + jnp.sum(sel.maskdiff) + jnp.sum(sel.C)),)

    timeit("full select_topk_contacts", scan20(f_full), score0)

    # 4) row assembly: full vs selected
    def f_rows_full(qv):
        efc = lanes.make_efc_l(m, ctx.meta, com, qp, qv, con)
        return (qv + 1e-30 * jnp.sum(efc.J),)

    timeit("make_efc_l FULL", scan20(f_rows_full), qv)

    def f_rows_sel(qv):
        con2, sel = lanes.select_topk_contacts(ctx.meta, con, k, jnp.float32)
        efc = lanes.make_efc_l(m, ctx.meta, com, qp, qv, con2, sel)
        return (qv + 1e-30 * jnp.sum(efc.J),)

    timeit("select + make_efc_l SEL", scan20(f_rows_sel), qv)

    # 5) solver at full vs selected ne (same content scale)
    efcF = jax.jit(lambda qv: lanes.make_efc_l(m, ctx.meta, com, qp, qv, con))(qv)
    Mm = jax.jit(lambda: lanes.crb_mass_matrix_l(m, com))()
    qs = jnp.zeros_like(qv)

    def f_solveF(qv):
        f, x = solver.solve_newton_lanes(Mm, efcF.J, 1.0 / efcF.R, efcF.aref, qs, qs, 4)
        return (qv + 1e-30 * jnp.sum(x),)

    timeit(f"solve ne={efcF.J.shape[0]}", scan20(f_solveF), qv)

    conS, selS = jax.jit(
        lambda: lanes.select_topk_contacts(ctx.meta, con, k, jnp.float32)
    )()
    efcS = jax.jit(lambda qv: lanes.make_efc_l(m, ctx.meta, com, qp, qv, conS, selS))(qv)

    def f_solveS(qv):
        f, x = solver.solve_newton_lanes(Mm, efcS.J, 1.0 / efcS.R, efcS.aref, qs, qs, 4)
        return (qv + 1e-30 * jnp.sum(x),)

    timeit(f"solve ne={efcS.J.shape[0]}", scan20(f_solveS), qv)
