"""Smooth (unconstrained) dynamics: kinematics, com-based inertias, CRB mass
matrix, RNE bias forces, passive springs/dampers, actuation.

From-scratch JAX implementation of the MuJoCo computation pipeline (documented
in the MuJoCo "Computation" chapter), structured for XLA: all per-body loops are
Python-unrolled over the static kinematic tree (nbody <= 14 for these models),
every array op is batched over envs by `vmap` at the call site. Spatial
6-vectors are [angular; linear] at a per-tree c-frame (origin at the kinematic
root's subtree com, world axes) — the same frame MuJoCo uses, so every
intermediate (xpos, subtree_com, cdof, cvel, qM, qfrc_bias, ...) can be diffed
against the installed mujoco binary in tests/test_physics_smooth.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ppo_tpu.physics import math as pm
from ppo_tpu.physics.model import Model
from ppo_tpu.physics.types import FREE, HINGE, SLIDE


class Kin(NamedTuple):
    xpos: jnp.ndarray        # [nbody, 3] body frame origin, world
    xquat: jnp.ndarray       # [nbody, 4]
    xmat: jnp.ndarray        # [nbody, 3, 3]
    xipos: jnp.ndarray       # [nbody, 3] body com, world
    ximat: jnp.ndarray       # [nbody, 3, 3] inertial frame, world
    xanchor: jnp.ndarray     # [njnt, 3]
    xaxis: jnp.ndarray       # [njnt, 3]
    geom_xpos: jnp.ndarray   # [ngeom, 3]
    geom_xmat: jnp.ndarray   # [ngeom, 3, 3]


class ComQuants(NamedTuple):
    subtree_com: jnp.ndarray  # [nbody, 3]
    cinert: jnp.ndarray       # [nbody, 6, 6] spatial inertia at c-frame
    cdof: jnp.ndarray         # [nv, 6] motion axes at c-frame


def _skew(v):
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], zero], -1),
        ],
        -2,
    )


def kinematics(m: Model, qpos: jnp.ndarray) -> Kin:
    """Forward kinematics (mj_kinematics semantics: qpos0 subtracted for
    hinge/slide so bodies sit at their XML frames when qpos == qpos0)."""
    dtype = qpos.dtype
    xpos = [jnp.zeros(3, dtype)] * m.nbody
    xquat = [jnp.zeros(4, dtype).at[0].set(1.0)] * m.nbody
    xanchor = [None] * m.njnt
    xaxis = [None] * m.njnt

    for b in range(1, m.nbody):
        p = m.body_parentid[b]
        pos = xpos[p] + pm.quat_rot(xquat[p], jnp.asarray(m.body_pos[b], dtype))
        quat = pm.quat_mul(xquat[p], jnp.asarray(m.body_quat[b], dtype))
        j0, jn = m.body_jntadr[b], m.body_jntnum[b]
        for j in range(j0, j0 + jn):
            jtype = m.jnt_type[j]
            qadr = m.jnt_qposadr[j]
            if jtype == FREE:
                pos = qpos[qadr : qadr + 3]
                quat = pm.normalize_quat(qpos[qadr + 3 : qadr + 7])
                xanchor[j] = pos
                xaxis[j] = jnp.asarray(m.jnt_axis[j], dtype)  # global axis for free joints
            elif jtype == SLIDE:
                # anchor/axis are evaluated before the joint's own transform
                axis_w = pm.quat_rot(quat, jnp.asarray(m.jnt_axis[j], dtype))
                xanchor[j] = pos + pm.quat_rot(quat, jnp.asarray(m.jnt_pos[j], dtype))
                xaxis[j] = axis_w
                pos = pos + axis_w * (qpos[qadr] - m.qpos0[qadr])
            elif jtype == HINGE:
                # anchor and axis are both invariant under the joint's own rotation
                anchor = pos + pm.quat_rot(quat, jnp.asarray(m.jnt_pos[j], dtype))
                axis_local = jnp.asarray(m.jnt_axis[j], dtype)
                xanchor[j] = anchor
                xaxis[j] = pm.quat_rot(quat, axis_local)
                angle = qpos[qadr] - m.qpos0[qadr]
                qloc = jnp.concatenate(
                    [jnp.cos(angle / 2)[None], axis_local * jnp.sin(angle / 2)]
                )
                quat = pm.quat_mul(quat, qloc)
                # rotate about the fixed anchor
                pos = anchor - pm.quat_rot(quat, jnp.asarray(m.jnt_pos[j], dtype))
            else:
                raise NotImplementedError(f"joint type {jtype}")
        xpos[b] = pos
        xquat[b] = quat

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = pm.quat_to_mat(xquat)
    xipos = xpos + jnp.einsum("bij,bj->bi", xmat, jnp.asarray(m.body_ipos, dtype))
    ximat = xmat @ pm.quat_to_mat(jnp.asarray(m.body_iquat, dtype))
    gb = m.geom_bodyid
    geom_xpos = xpos[gb] + jnp.einsum(
        "gij,gj->gi", xmat[gb], jnp.asarray(m.geom_pos, dtype)
    )
    geom_xmat = xmat[gb] @ pm.quat_to_mat(jnp.asarray(m.geom_quat, dtype))
    return Kin(
        xpos=xpos,
        xquat=xquat,
        xmat=xmat,
        xipos=xipos,
        ximat=ximat,
        xanchor=jnp.stack(xanchor) if m.njnt else jnp.zeros((0, 3), dtype),
        xaxis=jnp.stack(xaxis) if m.njnt else jnp.zeros((0, 3), dtype),
        geom_xpos=geom_xpos,
        geom_xmat=geom_xmat,
    )


def ancestor_mask(m: Model) -> np.ndarray:
    """mask[b, i] = 1 if dof i is on body b's ancestor chain (incl. b)."""
    mask = np.zeros((m.nbody, m.nv), dtype=bool)
    for b in range(1, m.nbody):
        a = b
        while a != 0:
            if m.body_dofnum[a] > 0:
                d0 = m.body_dofadr[a]
                mask[b, d0 : d0 + m.body_dofnum[a]] = True
            a = m.body_parentid[a]
    return mask


def com_quantities(m: Model, kin: Kin) -> ComQuants:
    """subtree_com, spatial inertias and dof motion axes at the c-frame
    (origin = subtree com of each body's kinematic root, world axes)."""
    dtype = kin.xpos.dtype
    mass = jnp.asarray(m.body_mass, dtype)

    # subtree mass & com (backward accumulation over static tree)
    sub_mass = [mass[b] for b in range(m.nbody)]
    sub_mom = [mass[b] * kin.xipos[b] for b in range(m.nbody)]
    for b in range(m.nbody - 1, 0, -1):
        p = m.body_parentid[b]
        sub_mass[p] = sub_mass[p] + sub_mass[b]
        sub_mom[p] = sub_mom[p] + sub_mom[b]
    subtree_com = jnp.stack(
        [sub_mom[b] / jnp.maximum(sub_mass[b], 1e-12) for b in range(m.nbody)]
    )

    # c-frame origin per body: subtree com of its root body (world body uses its own)
    rootid = getattr(m, "body_root_c", None)
    if rootid is None:
        rootid = np.maximum(m.body_rootid, 0)
    origins = subtree_com[rootid]

    # spatial inertia of each body at its c-frame origin
    I_world = jnp.einsum(
        "bij,bj,bkj->bik", kin.ximat, jnp.asarray(m.body_inertia, dtype), kin.ximat
    )
    c = kin.xipos - origins
    cs = _skew(c)
    from ppo_tpu.physics.consts import eye3
    eye = eye3(dtype)
    top_left = I_world + mass[:, None, None] * (
        jnp.sum(c * c, -1)[:, None, None] * eye - jnp.einsum("bi,bj->bij", c, c)
    )
    top_right = mass[:, None, None] * cs
    bot_left = -mass[:, None, None] * cs
    bot_right = mass[:, None, None] * eye
    cinert = jnp.concatenate(
        [
            jnp.concatenate([top_left, top_right], -1),
            jnp.concatenate([bot_left, bot_right], -1),
        ],
        -2,
    )

    # cdof
    cdofs = []
    for j in range(m.njnt):
        jtype = m.jnt_type[j]
        b = m.jnt_bodyid[j]
        O = origins[b]
        if jtype == FREE:
            for i in range(3):
                e = jnp.zeros(3, dtype).at[i].set(1.0)
                cdofs.append(jnp.concatenate([jnp.zeros(3, dtype), e]))
            # angular velocity of a free joint is expressed in the body frame
            for i in range(3):
                a = kin.xmat[b][:, i]
                cdofs.append(jnp.concatenate([a, jnp.cross(a, O - kin.xpos[b])]))
        elif jtype == SLIDE:
            a = kin.xaxis[j]
            cdofs.append(jnp.concatenate([jnp.zeros(3, dtype), a]))
        elif jtype == HINGE:
            a = kin.xaxis[j]
            cdofs.append(jnp.concatenate([a, jnp.cross(a, O - kin.xanchor[j])]))
    cdof = jnp.stack(cdofs) if cdofs else jnp.zeros((0, 6), dtype)
    return ComQuants(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def crb_mass_matrix(m: Model, com: ComQuants, mask: np.ndarray) -> jnp.ndarray:
    """Dense joint-space inertia M = sum_b J_b^T I_b J_b + diag(armature)."""
    dtype = com.cdof.dtype
    # J[b] = cdof rows masked to body b's ancestor chain: [nbody, nv, 6]
    J = jnp.asarray(mask[:, :, None], dtype) * com.cdof[None, :, :]
    M = jnp.einsum("nva,nab,nwb->vw", J, com.cinert, J)
    return M + jnp.diag(jnp.asarray(m.dof_armature, dtype))


class Vel(NamedTuple):
    cvel: jnp.ndarray      # [nbody, 6]
    cdof_dot: jnp.ndarray  # [nv, 6]


def com_velocities(m: Model, com: ComQuants, qvel: jnp.ndarray) -> Vel:
    """Body spatial velocities and cdof time-derivatives (mj_comVel)."""
    dtype = com.cdof.dtype
    cvel = [jnp.zeros(6, dtype)] * m.nbody
    cdof_dot = [jnp.zeros(6, dtype)] * m.nv
    for b in range(1, m.nbody):
        v = cvel[m.body_parentid[b]]
        j0, jn = m.body_jntadr[b], m.body_jntnum[b]
        for j in range(j0, j0 + jn):
            jtype = m.jnt_type[j]
            d0 = m.jnt_dofadr[j]
            if jtype == FREE:
                # translation dofs: constant axes, cdof_dot = 0
                v = v + com.cdof[d0] * qvel[d0] + com.cdof[d0 + 1] * qvel[d0 + 1] + com.cdof[d0 + 2] * qvel[d0 + 2]
                # rotation dofs: differentiated against full velocity incl. own translation
                for i in range(3, 6):
                    cdof_dot[d0 + i] = pm.motion_cross(v, com.cdof[d0 + i])
                for i in range(3, 6):
                    v = v + com.cdof[d0 + i] * qvel[d0 + i]
            else:
                cdof_dot[d0] = pm.motion_cross(v, com.cdof[d0])
                v = v + com.cdof[d0] * qvel[d0]
        cvel[b] = v
    return Vel(
        cvel=jnp.stack(cvel),
        cdof_dot=jnp.stack(cdof_dot) if m.nv else jnp.zeros((0, 6), dtype),
    )


def rne_bias(
    m: Model,
    com: ComQuants,
    vel: Vel,
    qvel: jnp.ndarray,
    mask: np.ndarray,
) -> jnp.ndarray:
    """qfrc_bias = C(q, qvel): Coriolis/centrifugal + gravity (mj_rne, flg_acc=0)."""
    dtype = qvel.dtype
    gravity = jnp.asarray(-m.opt.gravity, dtype)  # world acceleration fed in as -g

    # forward pass: cacc with qacc = 0
    cacc = [jnp.concatenate([jnp.zeros(3, dtype), gravity])] * m.nbody
    for b in range(1, m.nbody):
        a = cacc[m.body_parentid[b]]
        d0, dn = m.body_dofadr[b], m.body_dofnum[b]
        for i in range(d0, d0 + dn):
            a = a + vel.cdof_dot[i] * qvel[i]
        cacc[b] = a
    cacc = jnp.stack(cacc)

    # body inertial forces
    Iv = jnp.einsum("bij,bj->bi", com.cinert, vel.cvel)
    f = jnp.einsum("bij,bj->bi", com.cinert, cacc) + pm.force_cross(vel.cvel, Iv)

    # project through masked jacobian (equivalent to MuJoCo's backward pass)
    J = jnp.asarray(mask[:, :, None], dtype) * com.cdof[None, :, :]
    return jnp.einsum("nva,na->v", J, f)


def passive_forces(m: Model, qpos: jnp.ndarray, qvel: jnp.ndarray) -> jnp.ndarray:
    """Joint springs (stiffness about qpos_spring) + dampers (mj_passive)."""
    dtype = qvel.dtype
    qfrc = -jnp.asarray(m.dof_damping, dtype) * qvel
    for j in range(m.njnt):
        if m.jnt_stiffness[j] == 0.0:
            continue
        jtype = m.jnt_type[j]
        qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
        k = jnp.asarray(m.jnt_stiffness[j], dtype)
        if jtype in (SLIDE, HINGE):
            qfrc = qfrc.at[dadr].add(-k * (qpos[qadr] - m.qpos_spring[qadr]))
        else:  # FREE: translational spring + rotational spring via quat difference
            qfrc = qfrc.at[dadr : dadr + 3].add(
                -k * (qpos[qadr : qadr + 3] - jnp.asarray(m.qpos_spring[qadr : qadr + 3], dtype))
            )
    return qfrc


def actuator_forces(m: Model, ctrl: jnp.ndarray) -> jnp.ndarray:
    """Motor transmission: qfrc_actuator[dof(jnt)] = gear * clamp(ctrl)."""
    dtype = ctrl.dtype
    qfrc = jnp.zeros(m.nv, dtype)
    for u in range(m.nu):
        c = ctrl[u]
        if m.actuator_ctrllimited[u]:
            lo, hi = m.actuator_ctrlrange[u]
            c = jnp.clip(c, lo, hi)
        j = m.actuator_trnid[u]
        qfrc = qfrc.at[m.jnt_dofadr[j]].add(jnp.asarray(m.actuator_gear[u], dtype) * c)
    return qfrc


def point_jacobians(m: Model, com: ComQuants, mask: np.ndarray, p, b: int):
    """Translational/rotational jacobians (3 x nv) of world point p on body b.

    v(p) = cdof_lin + cdof_ang x (p - O) summed over ancestor dofs, where O is
    the c-frame origin of each dof's kinematic tree.
    """
    dtype = com.cdof.dtype
    dof_root = getattr(m, "dof_root_c", None)
    if dof_root is None:
        dof_root = np.maximum(m.body_rootid[m.dof_bodyid], 0)
    origins = com.subtree_com[dof_root]  # [nv, 3]
    jacp = com.cdof[:, 3:] + jnp.cross(com.cdof[:, :3], p[None, :] - origins)
    jacr = com.cdof[:, :3]
    sel = jnp.asarray(mask[b][:, None], dtype)
    return (sel * jacp).T, (sel * jacr).T


def set_const(m: Model) -> Model:
    """Fill dof_invweight0 / body_invweight0 (mj_setConst equivalent):
    inverse-weight diagonals of M^-1 at qpos0, used by constraint regularizers.

    Runs pinned to the CPU backend: it executes once, eagerly, at model-build
    time, and must not touch the accelerator (op-by-op dispatch on the tunneled
    TPU backend degrades the device for subsequent programs)."""
    import jax

    try:
        # local_devices, not devices: under multi-controller jax.distributed
        # the global cpu:0 belongs to process 0 and is non-addressable elsewhere
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            return _set_const_impl(m)
    return _set_const_impl(m)


def _set_const_impl(m: Model) -> Model:
    qpos0 = jnp.asarray(m.qpos0)
    kin = kinematics(m, qpos0)
    com = com_quantities(m, kin)
    mask = ancestor_mask(m)
    M = crb_mass_matrix(m, com, mask)
    Minv = jnp.linalg.inv(M)
    dof_inv = np.array(jnp.diag(Minv))
    bw = np.zeros((m.nbody, 2))
    for b in range(1, m.nbody):
        jacp, jacr = point_jacobians(m, com, mask, kin.xipos[b], b)
        bw[b, 0] = float(jnp.trace(jacp @ Minv @ jacp.T)) / 3.0
        bw[b, 1] = float(jnp.trace(jacr @ Minv @ jacr.T)) / 3.0
    m.body_invweight0 = bw
    # free-joint dofs use the body's isotropic invweights instead of diag(M^-1)
    for j in range(m.njnt):
        if m.jnt_type[j] == FREE:
            d0 = m.jnt_dofadr[j]
            b = m.jnt_bodyid[j]
            dof_inv[d0 : d0 + 3] = bw[b, 0]
            dof_inv[d0 + 3 : d0 + 6] = bw[b, 1]
    m.dof_invweight0 = dof_inv
    return m
