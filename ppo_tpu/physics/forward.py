"""Forward dynamics + integrators: the jit/vmap-able `mj_step` equivalent.

Pipeline (matches MuJoCo's mj_forward -> integrator order):
  kinematics -> com quantities -> CRB(M) -> velocities -> RNE bias -> passive
  -> actuation -> collision -> constraint rows -> qacc_smooth -> dual PGS
  -> qacc -> Euler (implicit joint damping) or RK4.

`make_step_fn(model)` closes over a static StepContext (the model arrays become
XLA constants) and returns a pure step for a single env; batch with `vmap`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ppo_tpu.physics import collision, constraint, smooth, solver
from ppo_tpu.physics import math as pm
from ppo_tpu.physics.model import Model
from ppo_tpu.physics.types import EULER, FREE


class StepContext(NamedTuple):
    """Per-model precomputation shared by every step (array fields may be
    swapped for traced device arrays via ppo_tpu.physics.consts.inject)."""

    slots: collision.ContactSlots
    mask: np.ndarray
    meta: constraint.EfcMeta
    has_damping: bool = True
    kind_masks: dict | None = None
    # per-env top-k contact-slot selection on the lanes path (0/None = off);
    # see lanes.select_topk_contacts — the dynamic-contact analogue of
    # MuJoCo's variable nc
    topk: int | None = None
    # static numpy copy of the slot table: consts injection swaps `slots` for
    # traced arrays, but lanes code builds static scatter masks from the slot
    # body ids at trace time (lanes.cfrc_ext_l)
    slots_np: collision.ContactSlots | None = None


def make_context(m: Model, topk: int | None = None) -> StepContext:
    slots = collision.contact_slots(m)
    mask = smooth.ancestor_mask(m)
    meta = constraint.make_efc_meta(m, slots, mask)
    return StepContext(slots=slots, mask=mask, meta=meta,
                       has_damping=bool(np.any(m.dof_damping)), topk=topk,
                       slots_np=slots)


class ForwardOut(NamedTuple):
    qacc: jnp.ndarray
    qacc_smooth: jnp.ndarray
    qfrc_smooth: jnp.ndarray
    qfrc_constraint: jnp.ndarray
    efc_force: jnp.ndarray
    efc: constraint.Efc
    contacts: collision.Contacts
    kin: smooth.Kin
    com: smooth.ComQuants
    vel: smooth.Vel
    M: jnp.ndarray


def forward(m: Model, qpos, qvel, ctrl, ctx: StepContext | None = None, iterations=None, solver_type: str = "newton", warmstart=None) -> ForwardOut:
    with jax.default_matmul_precision("highest"):
        return _forward(m, qpos, qvel, ctrl, ctx, iterations, solver_type, warmstart)


def _forward(m: Model, qpos, qvel, ctrl, ctx: StepContext | None = None, iterations=None, solver_type: str = "newton", warmstart=None) -> ForwardOut:
    # NOTE: callers must be under jax.default_matmul_precision("highest") (the
    # public forward() wrapper does this). TPU's default bf16 matmul precision
    # corrupts the CRB mass matrix / Newton Hessian enough that a warmstarted
    # solve can diverge to NaN (observed: Humanoid, 64 envs, warmstart ~4e2);
    # f32-exact matmuls reproduce the CPU/MuJoCo result bit-for-bit-close.
    # These matrices are [nv, nv] (nv<=23), so MXU cost is negligible.
    if ctx is None:
        ctx = make_context(m)
    iterations = iterations or m.opt.solver_iterations
    kin = smooth.kinematics(m, qpos)
    com = smooth.com_quantities(m, kin)
    M = smooth.crb_mass_matrix(m, com, ctx.mask)
    vel = smooth.com_velocities(m, com, qvel)
    qfrc_bias = smooth.rne_bias(m, com, vel, qvel, ctx.mask)
    qfrc_passive = smooth.passive_forces(m, qpos, qvel)
    qfrc_actuator = smooth.actuator_forces(m, ctrl)
    qfrc_smooth = qfrc_passive + qfrc_actuator - qfrc_bias

    # CG instead of cholesky: see physics.math.spd_solve (batched small
    # cholesky is the dominant cost of the whole step on this TPU runtime)
    qacc_smooth = pm.spd_solve(M, qfrc_smooth)

    contacts = collision.collide(m, kin.geom_xpos, kin.geom_xmat, ctx.slots, ctx.kind_masks)
    efc = constraint.make_efc(m, ctx.meta, com, qpos, qvel, contacts)

    ne = efc.J.shape[0]
    if ne and solver_type == "newton":
        D = 1.0 / efc.R
        # custom-vmap'd solver: identical math single-env; under vmap it
        # dispatches to the lane-major Pallas kernel (solver.py docstring)
        nt = solver._newton_cv(iterations, 8)
        x0 = qacc_smooth if warmstart is None else warmstart
        f, qacc = nt(M, efc.J, D, efc.aref, qacc_smooth, x0)
        qfrc_constraint = efc.J.T @ f
    elif ne:
        MiJT = pm.spd_solve(M, efc.J.T)                        # [nv, ne]
        A = efc.J @ MiJT + jnp.diag(efc.R)
        b = efc.J @ qacc_smooth - efc.aref
        f = solver.solve_pgs(A, b, iterations)
        qfrc_constraint = efc.J.T @ f
        qacc = qacc_smooth + MiJT @ f
    else:
        f = jnp.zeros((0,), qvel.dtype)
        qfrc_constraint = jnp.zeros_like(qfrc_smooth)
        qacc = qacc_smooth

    return ForwardOut(
        qacc=qacc, qacc_smooth=qacc_smooth, qfrc_smooth=qfrc_smooth,
        qfrc_constraint=qfrc_constraint, efc_force=f, efc=efc,
        contacts=contacts, kin=kin, com=com, vel=vel, M=M,
    )


def integrate_pos(m: Model, qpos, qvel, dt):
    """mj_integratePos: linear for slide/hinge, quaternion exp for free."""
    out = qpos
    for j in range(m.njnt):
        qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
        if m.jnt_type[j] == FREE:
            out = out.at[qadr : qadr + 3].add(dt * qvel[dadr : dadr + 3])
            q = pm.quat_integrate(qpos[qadr + 3 : qadr + 7], qvel[dadr + 3 : dadr + 6], dt)
            out = out.at[qadr + 3 : qadr + 7].set(q)
        else:
            out = out.at[qadr].add(dt * qvel[dadr])
    return out


def _euler_step(m: Model, ctx, qpos, qvel, ctrl, iterations, solver_type, warmstart=None):
    h = m.opt.timestep
    fwd = forward(m, qpos, qvel, ctrl, ctx, iterations, solver_type, warmstart)
    if ctx.has_damping:
        # implicit joint damping: dv = h * (M + h diag(B))^-1 (f_smooth + f_constraint)
        MhB = fwd.M + jnp.diag(h * jnp.asarray(m.dof_damping, qvel.dtype))
        qfrc = fwd.qfrc_smooth + fwd.qfrc_constraint
        dv = h * pm.spd_solve(MhB, qfrc)
    else:
        dv = h * fwd.qacc
    qvel_new = qvel + dv
    qpos_new = integrate_pos(m, qpos, qvel_new, h)
    return qpos_new, qvel_new, fwd


_RK4_A = ((0.5,), (0.0, 0.5), (0.0, 0.0, 1.0))
_RK4_B = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)


def _rk4_step(m: Model, ctx, qpos, qvel, ctrl, iterations, solver_type, warmstart=None):
    h = m.opt.timestep
    fwd0 = forward(m, qpos, qvel, ctrl, ctx, iterations, solver_type, warmstart)
    Fv = [qvel]
    Fa = [fwd0.qacc]
    fwd_i = fwd0
    for i in range(3):
        dv = sum(a * v for a, v in zip(_RK4_A[i], Fv) if a)
        da = sum(a * acc for a, acc in zip(_RK4_A[i], Fa) if a)
        qpos_i = integrate_pos(m, qpos, dv, h)
        qvel_i = qvel + h * da
        # each RK stage warmstarts from the previous stage's solution (the
        # persisted-qacc_warmstart analogue of mjData across forward calls)
        fwd_i = forward(m, qpos_i, qvel_i, ctrl, ctx, iterations, solver_type, Fa[-1])
        Fv.append(qvel_i)
        Fa.append(fwd_i.qacc)
    dv = sum(b * v for b, v in zip(_RK4_B, Fv))
    da = sum(b * a for b, a in zip(_RK4_B, Fa))
    qpos_new = integrate_pos(m, qpos, dv, h)
    qvel_new = qvel + h * da
    # mjData observables (xpos, cvel, contacts, ...) are left at the LAST RK
    # stage's trial state after mj_step — gymnasium's stale reads (cfrc_ext,
    # get_body_com, cinert) see exactly that, so we return the stage-3 forward.
    return qpos_new, qvel_new, fwd_i


def step(m: Model, ctx: StepContext, qpos, qvel, ctrl, iterations=None, solver_type="newton", warmstart=None):
    """One mj_step: returns (qpos', qvel', ForwardOut of the mjData-visible
    state). `warmstart` is the previous step's qacc (qacc_warmstart); the
    returned fwd.qacc is the warmstart for the next step."""
    iterations = iterations or m.opt.solver_iterations
    # f32-exact matmuls everywhere in the step (see _forward note): this also
    # covers the implicit-damping cho_solve in _euler_step
    with jax.default_matmul_precision("highest"):
        if m.opt.integrator == EULER:
            return _euler_step(m, ctx, qpos, qvel, ctrl, iterations, solver_type, warmstart)
        return _rk4_step(m, ctx, qpos, qvel, ctrl, iterations, solver_type, warmstart)


def make_step_fn(m: Model, iterations=None, solver_type="newton"):
    """Build a closed-over single-env step(qpos, qvel, ctrl) ready for jit/vmap."""
    ctx = make_context(m)

    def _step(qpos, qvel, ctrl):
        qpos2, qvel2, _ = step(m, ctx, qpos, qvel, ctrl, iterations, solver_type)
        return qpos2, qvel2

    return _step


def contact_forces(fwd: ForwardOut):
    """World-frame contact (force, torque) per slot ([S, 3], [S, 3]) recovered
    from pyramid rows: each row's generalized direction is exactly its con_C
    combination over the 6 contact-frame axes, so the frame-space wrench is
    con_C^T f_rows (equals mj_contactForce's decoding for every condim)."""
    meta = fwd.efc.meta
    S = meta.n_slots
    dtype = fwd.qacc.dtype
    if S == 0:
        return jnp.zeros((0, 3), dtype), jnp.zeros((0, 3), dtype)
    f_rows = fwd.efc_force[meta.n_limit :].reshape(S, meta.n_rows)
    frame = fwd.contacts.frame
    wrench = jnp.einsum("sr,srk->sk", f_rows, jnp.asarray(meta.con_C, dtype))  # [S, 6]
    force = jnp.einsum("sk,skj->sj", wrench[:, :3], frame)
    torque = jnp.einsum("sk,skj->sj", wrench[:, 3:], frame)
    return force, torque


def rne_post_constraint(m: Model, com, vel, fwd: ForwardOut, mask=None):
    """cfrc_ext: per-body com-based external (contact) force [nbody, 6],
    torque-first, about each body's c-frame origin (mj_rnePostConstraint subset:
    no xfrc_applied / equality constraints in these models)."""
    dtype = fwd.qacc.dtype
    slots = fwd.contacts.slots
    S = len(slots.geom1)
    cfrc_ext = jnp.zeros((m.nbody, 6), dtype)
    if S == 0:
        return cfrc_ext
    force, contact_torque = contact_forces(fwd)         # [S, 3] each
    rootid = getattr(m, "body_root_c", None)
    if rootid is None:
        rootid = np.maximum(m.body_rootid, 0)
    origins = com.subtree_com[rootid]                   # [nbody, 3]
    pos = fwd.contacts.pos
    for bodies, sign in ((slots.body1, -1.0), (slots.body2, 1.0)):
        nw = jnp.asarray(bodies != 0, dtype)[:, None]
        fb = sign * force * nw
        tb = sign * contact_torque * nw
        torque = jnp.cross(pos - origins[bodies], fb) + tb
        cfrc_ext = cfrc_ext.at[bodies].add(jnp.concatenate([torque, fb], -1))
    return cfrc_ext
