"""Per-stage timing of the lanes substep on the chip (the op-level profile
VERDICT r4 asked for): kinematics / com / CRB / RNE+forces / mass-solve /
collide / select / rows / newton / integrate, each under a 20-iteration scan
whose carry feeds the stage inputs (no loop-invariant hoisting). Also prints
the full step for reference. Env + batch from argv."""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from ppo_tpu.envs import make_env
from ppo_tpu.physics import lanes, solver

eid = sys.argv[1] if len(sys.argv) > 1 else "Ant-v5"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
topk = int(sys.argv[3]) if len(sys.argv) > 3 else -1

env = make_env(eid, solver_iterations=4, contact_topk=None if topk < 0 else topk)
m, ctx = env.model, env.ctx
print(f"== {eid} B={B} topk={ctx.topk} ==", flush=True)
keys = jax.random.split(jax.random.PRNGKey(0), B)
state, obs = jax.jit(jax.vmap(env.reset, in_axes=(0, None)))(keys, env.consts)
qp0 = state.qpos.T.reshape(m.nq, B // 128, 128)
qv0 = state.qvel.T.reshape(m.nv, B // 128, 128)


def _fetch(out):
    # block_until_ready is NOT a trustworthy sync on the tunneled runtime —
    # only a data-dependent scalar fetch is (see bench.py)
    return float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))


def timeit(name, fn, *args, reps=3):
    jf = jax.jit(fn)
    _fetch(jf(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(jf(*args))
        ts.append(time.perf_counter() - t0)
    ms = statistics.median(ts) / 200 * 1e3
    print(f"{name:26s} {ms:8.3f} ms/iter", flush=True)
    return ms


def scan20(stage):
    """stage: (qp, qv) -> scalar-ish output; carry perturbed to defeat LICM."""

    def g(qp, qv):
        def body(c, _):
            qp, qv = c
            s = stage(qp, qv)
            return (qp + 1e-30 * s, qv + 1e-30 * s), None

        c, _ = jax.lax.scan(body, (qp, qv), None, length=200)
        return c

    return g


def red(x):
    return jnp.sum(x) * 1e-30


# stages
def s_kin(qp, qv):
    kin = lanes.kinematics_l(m, qp)
    return red(kin.geom_xpos)


def s_kin_com(qp, qv):
    kin = lanes.kinematics_l(m, qp)
    com = lanes.com_quantities_l(m, kin)
    return red(com.cdof)


def s_kin_com_crb(qp, qv):
    kin = lanes.kinematics_l(m, qp)
    com = lanes.com_quantities_l(m, kin)
    M = lanes.crb_mass_matrix_l(m, com)
    return red(M)


def s_smooth_all(qp, qv):
    kin = lanes.kinematics_l(m, qp)
    com = lanes.com_quantities_l(m, kin)
    M = lanes.crb_mass_matrix_l(m, com)
    vel = lanes.com_velocities_l(m, com, qv)
    qfrc_bias = lanes.rne_bias_l(m, com, vel, qv)
    qfrc_smooth = lanes.passive_forces_l(m, qp, qv) - qfrc_bias
    qacc_smooth = lanes.spd_solve_l(M, qfrc_smooth)
    return red(qacc_smooth)


def s_collide(qp, qv):
    kin = lanes.kinematics_l(m, qp)
    con = lanes.collide_l(m, kin.geom_xpos, kin.geom_xmat, ctx.slots, ctx.kind_masks)
    return red(con.dist) + red(con.pos)


def s_select(qp, qv):
    kin = lanes.kinematics_l(m, qp)
    con = lanes.collide_l(m, kin.geom_xpos, kin.geom_xmat, ctx.slots, ctx.kind_masks)
    if ctx.topk:
        con, sel = lanes.select_topk_contacts(ctx.meta, con, ctx.topk, qp.dtype)
        return red(con.dist) + red(sel.maskdiff) + red(sel.C)
    return red(con.dist)


def s_rows(qp, qv):
    kin = lanes.kinematics_l(m, qp)
    com = lanes.com_quantities_l(m, kin)
    con = lanes.collide_l(m, kin.geom_xpos, kin.geom_xmat, ctx.slots, ctx.kind_masks)
    sel = None
    if ctx.topk:
        con, sel = lanes.select_topk_contacts(ctx.meta, con, ctx.topk, qp.dtype)
    efc = lanes.make_efc_l(m, ctx.meta, com, qp, qv, con, sel)
    return red(efc.J) + red(efc.aref)


def s_full_forward(qp, qv):
    fwd = lanes.forward_l(m, ctx, qp, qv, jnp.zeros((m.nu,) + qp.shape[1:], qp.dtype), 4, qv)
    return red(fwd.qacc)


def s_full_step(qp, qv):
    qp2, qv2, ws = lanes.step_l(m, ctx, qp, qv, jnp.zeros((m.nu,) + qp.shape[1:], qp.dtype), 4, qv)
    return red(qp2) + red(qv2)


def s_empty(qp, qv):
    return jnp.sum(qp) * 1e-30


t_0 = timeit("empty scan (RTT floor)", scan20(s_empty), qp0, qv0)
t_kin = timeit("kinematics", scan20(s_kin), qp0, qv0)
t_com = timeit("+com", scan20(s_kin_com), qp0, qv0)
t_crb = timeit("+crb(M)", scan20(s_kin_com_crb), qp0, qv0)
t_sm = timeit("+rne+passive+mass-solve", scan20(s_smooth_all), qp0, qv0)
t_col = timeit("kin+collide", scan20(s_collide), qp0, qv0)
t_selp = timeit("kin+collide+select", scan20(s_select), qp0, qv0)
t_rows = timeit("kin+com+col+sel+rows", scan20(s_rows), qp0, qv0)
t_fwd = timeit("FULL forward (w/ newton)", scan20(s_full_forward), qp0, qv0)
t_step = timeit("FULL step (integrator)", scan20(s_full_step), qp0, qv0)
print("---- minus RTT floor ----", flush=True)
for nm, t in [("kinematics", t_kin), ("+com", t_com), ("+crb", t_crb),
              ("+rne/passive/mass", t_sm), ("kin+collide", t_col),
              ("kin+collide+select", t_selp), ("rows total", t_rows),
              ("FULL forward", t_fwd), ("FULL step", t_step)]:
    print(f"{nm:26s} {t - t_0:8.3f} ms", flush=True)
print(f"derived: com {t_com - t_kin:.3f} crb {t_crb - t_com:.3f} "
      f"rne/passive/mass {t_sm - t_crb:.3f} collide {t_col - t_kin:.3f} "
      f"select {t_selp - t_col:.3f} rows-only {t_rows - t_selp - (t_com - t_kin):.3f} "
      f"newton {t_fwd - t_rows - (t_sm - t_crb) - (t_crb - t_com):.3f}",
      flush=True)
