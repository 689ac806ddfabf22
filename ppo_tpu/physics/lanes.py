"""Lane-major (batch-last) physics step: the vectorized-env hot path.

The reference steps each env serially on the CPU (libs/gymcpp/mujoco/
mujoco_env.h:97-108, one mj_step per env per thread); the TPU-native design
steps thousands of envs in lockstep. `vmap` over the single-env step works but
lays every intermediate out with the tiny physics dims trailing ([B, nbody, 6,
6], [B, nv], ...), which XLA tiles on the (sublane, lane) = (8, 128) grid —
padding nv<=23 and 3-vectors up to 128 lanes and wasting ~10-40x HBM traffic
on every fusion boundary (measured: the vmapped substep is bandwidth-bound at
~4.3 ms for 4096 HalfCheetah envs, >20x above its flop cost).

This module reimplements the whole substep pipeline with the env batch in the
LAST axis of every array ([*, B]): every elementwise op runs on full 128-lane
tiles with zero padding, reductions are over small leading axes, and there are
no matmuls to mis-tile (all contractions are broadcast-multiply-reduce over
dims of size 3/6/nv). The math is the same pipeline as physics/forward.py
(kinematics -> com -> CRB -> RNE -> passive/actuation -> qacc_smooth ->
collision -> constraint rows -> Newton -> integrate) and is tested for
equivalence against the vmapped reference path (tests/test_lanes.py).

Supported subset: the four locomotion models (plane/sphere/capsule colliders,
Newton solver). Models with box colliders fall back to the vmapped reference
path at the env layer.

No array literals may be embedded in traced code (see physics/consts.py for
the dispatch pathology); constants arrive through the injected model/ctx.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ppo_tpu.physics import collision, solver
from ppo_tpu.physics.constraint import MAXIMP, MINIMP
from ppo_tpu.physics.consts import eye3
from ppo_tpu.physics.model import Model
from ppo_tpu.physics.types import EULER, FREE, HINGE, KERNEL_MODE, SLIDE


# Extra constants delivered as Pallas-kernel operands (populated by
# physics/mega.py for the duration of kernel tracing): Mosaic should not see
# arbitrary array literals, so trace-time numpy masks are swapped for loaded
# refs here. Maps name -> in-kernel array.
KERNEL_CONSTS: dict = {}


def _kind_sel(kind_masks):
    """Returns sel(name, nd, a, b): per-slot kind dispatch with `nd` trailing
    singleton dims on the mask. XLA mode: boolean jnp.where on the (S,) bool
    masks. Kernel mode: the masks arrive as PRE-SHAPED f32 0/1 operands
    ((S,1)/(S,1,1)/(S,1,1,1), shaped on the host — in-kernel expand chains
    fuse into Mosaic-unsupported relayouts, and i1 vectors cannot broadcast
    minor dims at all) and the select is arithmetic: m*a + (1-m)*b, exact
    for 0/1 masks with finite branches (every branch here is guarded)."""
    if KERNEL_MODE[0]:
        suffix = {1: "", 2: "3", 3: "4"}

        def sel(name, a, b):
            mf = kind_masks[name + suffix[a.ndim - 1]]
            return mf * a + (1.0 - mf) * b
    else:
        def sel(name, a, b):
            v = kind_masks[name]
            while v.ndim < a.ndim:
                v = v[..., None]
            return jnp.where(v, a, b)

    return sel


def _take0(arr, idx):
    """Gather rows along axis 0. Inside a Pallas kernel (KERNEL_MODE) the
    indices are static numpy and the gather is unrolled into stacked slices
    (Mosaic has no general gather); outside, plain advanced indexing."""
    if KERNEL_MODE[0]:
        return jnp.stack([arr[int(i)] for i in np.asarray(idx)], 0)
    return arr[idx]


# ---------------------------------------------------------------------------
# component-first ("lane") math: vectors [3, B], quats [4, B], mats [3, 3, B]
# ---------------------------------------------------------------------------


def lcross(a, b):
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ],
        0,
    )


def lquat_mul(q, p):
    w1, x1, y1, z1 = q[0], q[1], q[2], q[3]
    w2, x2, y2, z2 = p[0], p[1], p[2], p[3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        0,
    )


def lquat_rot(q, v):
    qv, w = q[1:], q[0]
    t = 2.0 * lcross(qv, v)
    return v + w * t + lcross(qv, t)


def lquat_to_mat(q):
    w, x, y, z = q[0], q[1], q[2], q[3]
    r0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], 0)
    r1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], 0)
    r2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], 0)
    return jnp.stack([r0, r1, r2], 0)


def lnormalize(v, axis=0, eps=1e-30):
    return v / jnp.maximum(jnp.sqrt(jnp.sum(v * v, axis, keepdims=True)), eps)


def lquat_exp(phi):
    """[3, B] rotation vector -> [4, B] quaternion (pm.quat_exp semantics)."""
    angle = jnp.sqrt(jnp.sum(phi * phi, 0))
    small = angle < 1e-12
    safe = jnp.where(small, 1.0, angle)
    axis = jnp.where(small, 0.0, phi / safe)
    # pm.quat_exp falls back to the e0 axis for tiny angles; sin(~0)=0 makes
    # the xyz part vanish either way, so zeroing the axis is equivalent.
    half = angle / 2.0
    return jnp.concatenate([jnp.cos(half)[None], axis * jnp.sin(half)[None]], 0)


def lquat_integrate(q, omega, dt):
    out = lquat_mul(q, lquat_exp(omega * dt))
    return out / jnp.sqrt(jnp.sum(out * out, 0, keepdims=True))


def lmotion_cross(v, u):
    ang = lcross(v[:3], u[:3])
    lin = lcross(v[:3], u[3:]) + lcross(v[3:], u[:3])
    return jnp.concatenate([ang, lin], 0)


def lforce_cross(v, f):
    ang = lcross(v[:3], f[:3]) + lcross(v[3:], f[3:])
    lin = lcross(v[:3], f[3:])
    return jnp.concatenate([ang, lin], 0)


def _bc(v, Bs):
    """Broadcast a constant [k] vector to [k, *Bs] lanes. `Bs` is the
    trailing batch shape: (B,) in flat layout, (B//128, 128) in the tile-2D
    layout (batch filling both sublanes and lanes — see substeps_batched)."""
    if not isinstance(Bs, tuple):
        Bs = (Bs,)
    return jnp.broadcast_to(v[(slice(None),) + (None,) * len(Bs)], (v.shape[0],) + Bs)


def _exp(v, nb):
    """Append `nb` trailing singleton dims (batch-rank-agnostic column form
    of a constant: (S,) -> (S,1) flat / (S,1,1) tile-2D)."""
    return v[(Ellipsis,) + (None,) * nb]


def _static_geom_bodyid(m: Model) -> np.ndarray:
    """geom_bodyid as static numpy: consts injection swaps the model field for
    a traced array, but lanes unrolls geoms in Python (the static copy is
    stashed by consts.inject as geom_bodyid_np)."""
    gb = getattr(m, "geom_bodyid_np", None)
    if gb is None:
        gb = m.geom_bodyid
    return np.asarray(gb).astype(int)


def matvec(M, x):
    """[n, m, *Bs] @ [m, *Bs] -> [n, *Bs] as broadcast-multiply-reduce."""
    return jnp.sum(M * x[None], 1)


# ---------------------------------------------------------------------------
# smooth dynamics (lane ports of physics/smooth.py)
# ---------------------------------------------------------------------------


class KinL(NamedTuple):
    xpos: jnp.ndarray        # [nbody, 3, B]
    xquat: jnp.ndarray       # [nbody, 4, B]
    xmat: jnp.ndarray        # [nbody, 3, 3, B]
    xipos: jnp.ndarray       # [nbody, 3, B]
    ximat: jnp.ndarray       # [nbody, 3, 3, B]
    xanchor: jnp.ndarray     # [njnt, 3, B]
    xaxis: jnp.ndarray       # [njnt, 3, B]
    geom_xpos: jnp.ndarray   # [ngeom, 3, B]
    geom_xmat: jnp.ndarray   # [ngeom, 3, 3, B]


class ComL(NamedTuple):
    subtree_com: jnp.ndarray  # [nbody, 3, B]
    cinert: jnp.ndarray       # [nbody, 6, 6, B]
    cdof: jnp.ndarray         # [nv, 6, B]


class VelL(NamedTuple):
    cvel: jnp.ndarray        # [nbody, 6, B]
    cdof_dot: jnp.ndarray    # [nv, 6, B]


def _rot_const(A, C):
    """[3, 3, *Bs] @ const [3, 3] -> [3, 3, *Bs]: out[:, j] = sum_k A[:, k] C[k, j],
    unrolled so it is batch-rank-agnostic (and Mosaic-safe)."""
    cols = [sum(A[:, k] * C[k, j] for k in range(3)) for j in range(3)]
    return jnp.stack(cols, 1)


def kinematics_l(m: Model, qpos) -> KinL:
    """smooth.kinematics with batch-last layout (mj_kinematics semantics).
    The trailing batch may be flat [.., B] or tile-2D [.., B//128, 128]."""
    dtype = qpos.dtype
    B = qpos.shape[1:]
    body_pos = jnp.asarray(m.body_pos, dtype)
    body_quat = jnp.asarray(m.body_quat, dtype)
    jnt_pos = jnp.asarray(m.jnt_pos, dtype)
    jnt_axis = jnp.asarray(m.jnt_axis, dtype)
    qpos0 = jnp.asarray(m.qpos0, dtype)

    zero3 = jnp.zeros((3,) + B, dtype)
    xpos = [zero3] * m.nbody
    unit_q = jnp.concatenate([jnp.ones((1,) + B, dtype), jnp.zeros((3,) + B, dtype)], 0)
    xquat = [unit_q] * m.nbody
    xanchor = [None] * m.njnt
    xaxis = [None] * m.njnt

    for b in range(1, m.nbody):
        p = m.body_parentid[b]
        pos = xpos[p] + lquat_rot(xquat[p], _bc(body_pos[b], B))
        quat = lquat_mul(xquat[p], _bc(body_quat[b], B))
        j0, jn = m.body_jntadr[b], m.body_jntnum[b]
        for j in range(j0, j0 + jn):
            jtype = m.jnt_type[j]
            qadr = m.jnt_qposadr[j]
            if jtype == FREE:
                pos = qpos[qadr : qadr + 3]
                q = qpos[qadr + 3 : qadr + 7]
                quat = q / jnp.sqrt(jnp.sum(q * q, 0, keepdims=True))
                xanchor[j] = pos
                xaxis[j] = _bc(jnt_axis[j], B)
            elif jtype == SLIDE:
                axis_w = lquat_rot(quat, _bc(jnt_axis[j], B))
                xanchor[j] = pos + lquat_rot(quat, _bc(jnt_pos[j], B))
                xaxis[j] = axis_w
                pos = pos + axis_w * (qpos[qadr] - qpos0[qadr])
            elif jtype == HINGE:
                anchor = pos + lquat_rot(quat, _bc(jnt_pos[j], B))
                xanchor[j] = anchor
                xaxis[j] = lquat_rot(quat, _bc(jnt_axis[j], B))
                angle = qpos[qadr] - qpos0[qadr]
                qloc = jnp.concatenate(
                    [jnp.cos(angle / 2)[None],
                     _exp(jnt_axis[j], len(B)) * jnp.sin(angle / 2)[None]], 0
                )
                quat = lquat_mul(quat, qloc)
                pos = anchor - lquat_rot(quat, _bc(jnt_pos[j], B))
            else:
                raise NotImplementedError(f"joint type {jtype}")
        xpos[b] = pos
        xquat[b] = quat

    xmat = [lquat_to_mat(q) for q in xquat]
    ipos = jnp.asarray(m.body_ipos, dtype)
    xipos = []
    ximat = []
    # body_iquat rotations are per-model constants: build their 3x3 matrices
    # once at trace time from the injected quats (no batch axis)
    biq = jnp.asarray(m.body_iquat, dtype)
    for b in range(m.nbody):
        xipos.append(xpos[b] + matvec(xmat[b], _bc(ipos[b], B)))
        w, x, y, z = biq[b, 0], biq[b, 1], biq[b, 2], biq[b, 3]
        Cq = jnp.stack(
            [
                jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)]),
                jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)]),
                jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]),
            ]
        )
        ximat.append(_rot_const(xmat[b], Cq))

    geom_pos = jnp.asarray(m.geom_pos, dtype)
    geom_quat = jnp.asarray(m.geom_quat, dtype)
    geom_xpos = []
    geom_xmat = []
    gb = _static_geom_bodyid(m)
    for g in range(len(gb)):
        b = int(gb[g])
        geom_xpos.append(xpos[b] + matvec(xmat[b], _bc(geom_pos[g], B)))
        w, x, y, z = geom_quat[g, 0], geom_quat[g, 1], geom_quat[g, 2], geom_quat[g, 3]
        Cg = jnp.stack(
            [
                jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)]),
                jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)]),
                jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]),
            ]
        )
        geom_xmat.append(_rot_const(xmat[b], Cg))

    return KinL(
        xpos=jnp.stack(xpos),
        xquat=jnp.stack(xquat),
        xmat=jnp.stack(xmat),
        xipos=jnp.stack(xipos),
        ximat=jnp.stack(ximat),
        xanchor=jnp.stack(xanchor) if m.njnt else jnp.zeros((0, 3) + B, dtype),
        xaxis=jnp.stack(xaxis) if m.njnt else jnp.zeros((0, 3) + B, dtype),
        geom_xpos=jnp.stack(geom_xpos),
        geom_xmat=jnp.stack(geom_xmat),
    )


def com_quantities_l(m: Model, kin: KinL) -> ComL:
    dtype = kin.xpos.dtype
    B = kin.xpos.shape[2:]   # xpos is [nbody, 3, *B]
    nb = len(B)
    mass = jnp.asarray(m.body_mass, dtype)
    inertia = jnp.asarray(m.body_inertia, dtype)

    sub_mass = [mass[b] for b in range(m.nbody)]
    sub_mom = [mass[b] * kin.xipos[b] for b in range(m.nbody)]
    for b in range(m.nbody - 1, 0, -1):
        p = m.body_parentid[b]
        sub_mass[p] = sub_mass[p] + sub_mass[b]
        sub_mom[p] = sub_mom[p] + sub_mom[b]
    subtree_com = [sub_mom[b] / jnp.maximum(sub_mass[b], 1e-12) for b in range(m.nbody)]

    # c-frame origins need static root ids (Python list indexing); body_rootid
    # is never swapped by consts injection
    rootid = np.maximum(np.asarray(m.body_rootid), 0)

    eye = eye3(dtype)
    cinert = []
    for b in range(m.nbody):
        O = subtree_com[int(rootid[b])]
        R = kin.ximat[b]                                 # [3, 3, B]
        # I_world = R diag(inertia) R^T
        # Iw = R diag(inertia) R^T, unrolled (batch-rank-agnostic)
        Iw = jnp.stack([
            jnp.stack([
                sum(R[i, k] * R[j, k] * inertia[b][k] for k in range(3))
                for j in range(3)
            ], 0)
            for i in range(3)
        ], 0)
        c = kin.xipos[b] - O                             # [3, B]
        cc = jnp.sum(c * c, 0)                           # [B]
        outer = c[:, None] * c[None]                     # [3, 3, *B]
        zero = jnp.zeros_like(c[0])
        cs = jnp.stack(
            [
                jnp.stack([zero, -c[2], c[1]], 0),
                jnp.stack([c[2], zero, -c[0]], 0),
                jnp.stack([-c[1], c[0], zero], 0),
            ],
            0,
        )
        tl = Iw + mass[b] * (cc[None, None] * _exp(eye, nb) - outer)
        tr = mass[b] * cs
        bl = -mass[b] * cs
        br = mass[b] * _exp(eye, nb) * jnp.ones((1, 1) + B, dtype)
        cinert.append(
            jnp.concatenate(
                [jnp.concatenate([tl, tr], 1), jnp.concatenate([bl, br], 1)], 0
            )
        )

    cdofs = []
    zero3 = jnp.zeros((3,) + B, dtype)
    for j in range(m.njnt):
        jtype = m.jnt_type[j]
        b = int(m.jnt_bodyid[j])
        O = subtree_com[int(rootid[b])]
        if jtype == FREE:
            for i in range(3):
                e = _bc(eye[:, i], B)
                cdofs.append(jnp.concatenate([zero3, e], 0))
            for i in range(3):
                a = kin.xmat[b][:, i]                    # [3, B]
                cdofs.append(jnp.concatenate([a, lcross(a, O - kin.xpos[b])], 0))
        elif jtype == SLIDE:
            cdofs.append(jnp.concatenate([zero3, kin.xaxis[j]], 0))
        elif jtype == HINGE:
            a = kin.xaxis[j]
            cdofs.append(jnp.concatenate([a, lcross(a, O - kin.xanchor[j])], 0))
    cdof = jnp.stack(cdofs) if cdofs else jnp.zeros((0, 6) + B, dtype)
    return ComL(subtree_com=jnp.stack(subtree_com), cinert=jnp.stack(cinert), cdof=cdof)


def _static_mask(m: Model) -> np.ndarray:
    """Ancestor mask recomputed from the model's (always static) tree arrays
    — ctx.mask may be a traced array after consts injection."""
    from ppo_tpu.physics import smooth

    return smooth.ancestor_mask(m)


def crb_mass_matrix_l(m: Model, com: ComL) -> jnp.ndarray:
    """M [nv, nv, B] by composite-rigid-body accumulation + masked contraction
    (equals smooth.crb_mass_matrix's einsum; see tests/test_lanes.py)."""
    dtype = com.cdof.dtype
    mask = _static_mask(m)
    crb = [com.cinert[b] for b in range(m.nbody)]
    for b in range(m.nbody - 1, 0, -1):
        p = m.body_parentid[b]
        if p > 0:
            crb[p] = crb[p] + crb[b]
    # F[w] = crb[body(w)] @ cdof[w]
    F = jnp.stack([matvec(crb[int(m.dof_bodyid[w])], com.cdof[w]) for w in range(m.nv)])
    # anc[v, w] = dof v lies on body(w)'s ancestor chain; intersect with the
    # upper triangle so same-body dof pairs (free joints) are counted once
    anc = np.triu(mask[np.asarray(m.dof_bodyid)].T)      # [nv(v), nv(w)]
    U = jnp.sum(com.cdof[:, None] * F[None], 2)          # [v, w, *B]
    nb = U.ndim - 2
    if KERNEL_MODE[0]:
        U = U * _exp(KERNEL_CONSTS["anc_triu"], nb)
    else:
        U = U * _exp(jnp.asarray(anc, dtype), nb)
    r = jax.lax.broadcasted_iota(jnp.int32, (m.nv, m.nv), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (m.nv, m.nv), 1)
    eye2 = (r == c).astype(dtype)
    eyev = _exp(eye2, nb)
    M = U + jnp.swapaxes(U, 0, 1) - U * eyev
    # armature on the diagonal via a 2D mask then trailing singletons: the
    # direct (nv,) -> (nv,1,..) broadcast is an unsupported Mosaic relayout
    arm_diag = jnp.asarray(m.dof_armature, dtype)[None, :] * eye2
    return M + _exp(arm_diag, nb)


def com_velocities_l(m: Model, com: ComL, qvel) -> VelL:
    dtype = com.cdof.dtype
    B = qvel.shape[1:]
    zero6 = jnp.zeros((6,) + B, dtype)
    cvel = [zero6] * m.nbody
    cdof_dot = [zero6] * m.nv
    for b in range(1, m.nbody):
        v = cvel[m.body_parentid[b]]
        j0, jn = m.body_jntadr[b], m.body_jntnum[b]
        for j in range(j0, j0 + jn):
            jtype = m.jnt_type[j]
            d0 = m.jnt_dofadr[j]
            if jtype == FREE:
                v = (
                    v
                    + com.cdof[d0] * qvel[d0]
                    + com.cdof[d0 + 1] * qvel[d0 + 1]
                    + com.cdof[d0 + 2] * qvel[d0 + 2]
                )
                for i in range(3, 6):
                    cdof_dot[d0 + i] = lmotion_cross(v, com.cdof[d0 + i])
                for i in range(3, 6):
                    v = v + com.cdof[d0 + i] * qvel[d0 + i]
            else:
                cdof_dot[d0] = lmotion_cross(v, com.cdof[d0])
                v = v + com.cdof[d0] * qvel[d0]
        cvel[b] = v
    return VelL(
        cvel=jnp.stack(cvel),
        cdof_dot=jnp.stack(cdof_dot) if m.nv else jnp.zeros((0, 6) + B, dtype),
    )


def rne_bias_l(m: Model, com: ComL, vel: VelL, qvel) -> jnp.ndarray:
    """qfrc_bias [nv, B] (mj_rne flg_acc=0) via subtree force accumulation."""
    dtype = qvel.dtype
    B = qvel.shape[1:]
    gravity = jnp.asarray(m.opt.gravity, dtype)
    cacc0 = jnp.concatenate([jnp.zeros((3,) + B, dtype), _bc(-gravity, B)], 0)
    cacc = [cacc0] * m.nbody
    for b in range(1, m.nbody):
        a = cacc[m.body_parentid[b]]
        d0, dn = m.body_dofadr[b], m.body_dofnum[b]
        for i in range(d0, d0 + dn):
            a = a + vel.cdof_dot[i] * qvel[i]
        cacc[b] = a

    f = [
        matvec(com.cinert[b], cacc[b])
        + lforce_cross(vel.cvel[b], matvec(com.cinert[b], vel.cvel[b]))
        for b in range(m.nbody)
    ]
    # fsub[b] = sum of f over b's subtree; qfrc[v] = cdof[v] . fsub[body(v)]
    fsub = list(f)
    for b in range(m.nbody - 1, 0, -1):
        p = m.body_parentid[b]
        if p > 0:
            fsub[p] = fsub[p] + fsub[b]
    rows = [jnp.sum(com.cdof[v] * fsub[int(m.dof_bodyid[v])], 0) for v in range(m.nv)]
    return jnp.stack(rows) if rows else jnp.zeros((0,) + B, dtype)


def passive_forces_l(m: Model, qpos, qvel) -> jnp.ndarray:
    dtype = qvel.dtype
    damping = jnp.asarray(m.dof_damping, dtype)
    base = -_exp(damping, qvel.ndim - 1) * qvel
    # spring terms per affected dof row: accumulated in a Python dict and
    # merged row-wise (no scatter: Mosaic-safe, and identical math)
    adds: dict[int, jnp.ndarray] = {}

    def _add(d, expr):
        adds[d] = adds[d] + expr if d in adds else expr

    spring = jnp.asarray(m.qpos_spring, dtype)
    for j in range(m.njnt):
        if m.jnt_stiffness[j] == 0.0:
            continue
        jtype = m.jnt_type[j]
        qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
        k = float(m.jnt_stiffness[j])
        if jtype in (SLIDE, HINGE):
            _add(dadr, -k * (qpos[qadr] - spring[qadr]))
        else:
            for i in range(3):
                _add(dadr + i, -k * (qpos[qadr + i] - spring[qadr + i]))
    if not adds:
        return base
    rows = [base[v] + adds[v] if v in adds else base[v] for v in range(m.nv)]
    return jnp.stack(rows)


def actuator_forces_l(m: Model, ctrl) -> jnp.ndarray:
    """Motor transmission [nv, B] (smooth.actuator_forces port)."""
    dtype = ctrl.dtype
    B = ctrl.shape[1:]
    ctrlrange = jnp.asarray(m.actuator_ctrlrange, dtype)
    adds: dict[int, jnp.ndarray] = {}
    for u in range(m.nu):
        c = ctrl[u]
        if m.actuator_ctrllimited[u]:
            c = jnp.clip(c, ctrlrange[u, 0], ctrlrange[u, 1])
        j = m.actuator_trnid[u]
        gear = float(np.asarray(m.actuator_gear)[u]) if isinstance(m.actuator_gear, np.ndarray) \
            else m.actuator_gear[u]
        d = int(m.jnt_dofadr[j])
        adds[d] = adds[d] + gear * c if d in adds else gear * c
    zero = jnp.zeros(B, dtype)
    return jnp.stack([adds.get(v, zero) for v in range(m.nv)])


def spd_solve_l(M, b, iters=None):
    """x = M^-1 b, M [n, n, B] SPD, b [n, B]: Jacobi-preconditioned CG
    (physics/math.spd_solve in lane layout; same 2n default)."""
    n = M.shape[0]
    iters = iters or 2 * n
    r_ = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c_ = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (r_ == c_).astype(M.dtype)
    diag = jnp.sum(M * _exp(eye, M.ndim - 2), 1)
    Pinv = 1.0 / diag

    x = jnp.zeros_like(b)
    r = b
    z = Pinv * r
    p = z
    rz = jnp.sum(r * z, 0)
    for _ in range(iters):
        hp = matvec(M, p)
        alpha = rz / jnp.maximum(jnp.sum(p * hp, 0), 1e-30)
        x = x + alpha * p
        r = r - alpha * hp
        z = Pinv * r
        rz2 = jnp.sum(r * z, 0)
        beta = rz2 / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        rz = rz2
    return x


# ---------------------------------------------------------------------------
# collision (lane port of collision.collide, sphere/capsule/plane subset)
# ---------------------------------------------------------------------------


class ContactsL(NamedTuple):
    dist: jnp.ndarray      # [S, B]
    pos: jnp.ndarray       # [S, 3, B]
    frame: jnp.ndarray     # [S, 3, 3, B]
    active: jnp.ndarray    # [S, B]


def _make_frame_l(n):
    """collision.make_frame in lanes: n [S, 3, B] -> [S, 3, 3, B]."""
    use_y = jnp.abs(n[:, 1]) < 0.5
    zero = jnp.zeros_like(n[:, 0])
    one = jnp.ones_like(n[:, 0])
    tmp = jnp.stack([zero, jnp.where(use_y, one, zero), jnp.where(use_y, zero, one)], 1)
    t1 = tmp - jnp.sum(tmp * n, 1, keepdims=True) * n
    t1 = t1 / jnp.maximum(jnp.sqrt(jnp.sum(t1 * t1, 1, keepdims=True)), 1e-30)
    t2 = jnp.stack(
        [
            n[:, 1] * t1[:, 2] - n[:, 2] * t1[:, 1],
            n[:, 2] * t1[:, 0] - n[:, 0] * t1[:, 2],
            n[:, 0] * t1[:, 1] - n[:, 1] * t1[:, 0],
        ],
        1,
    )
    return jnp.stack([n, t1, t2], 1)


def _plane_capsule_frame_l(n, axis):
    vec = axis - n * jnp.sum(n * axis, 1, keepdims=True)
    norm2 = jnp.sqrt(jnp.sum(vec * vec, 1, keepdims=True))
    ex = jnp.concatenate(
        [jnp.ones_like(n[:, :1]), jnp.zeros_like(n[:, :1]), jnp.zeros_like(n[:, :1])], 1
    )
    if KERNEL_MODE[0]:
        smallf = (norm2 < 1e-14).astype(n.dtype)
        t1 = smallf * ex + (1.0 - smallf) * (vec / jnp.maximum(norm2, 1e-30))
    else:
        t1 = jnp.where(norm2 < 1e-14, ex, vec / jnp.maximum(norm2, 1e-30))
    t2 = jnp.stack(
        [
            n[:, 1] * t1[:, 2] - n[:, 2] * t1[:, 1],
            n[:, 2] * t1[:, 0] - n[:, 0] * t1[:, 2],
            n[:, 0] * t1[:, 1] - n[:, 1] * t1[:, 0],
        ],
        1,
    )
    return jnp.stack([n, t1, t2], 1)


def collide_l(m: Model, geom_xpos, geom_xmat, slots, kind_masks) -> ContactsL:
    """Sphere/capsule/plane narrowphase with slot axis leading, batch last
    (same reduction-to-sphere-sphere structure as collision.collide).

    geom_xpos [ngeom, 3, B], geom_xmat [ngeom, 3, 3, B].
    """
    dtype = geom_xpos.dtype
    B = geom_xpos.shape[2:]
    nb = len(B)
    S = len(np.asarray(slots.kind))
    if S == 0:
        return ContactsL(
            dist=jnp.zeros((0,) + B, dtype), pos=jnp.zeros((0, 3) + B, dtype),
            frame=jnp.zeros((0, 3, 3) + B, dtype), active=jnp.zeros((0,) + B, bool),
        )
    p1 = _take0(geom_xpos, slots.geom1)   # [S, 3, B]
    p2 = _take0(geom_xpos, slots.geom2)
    R1 = _take0(geom_xmat, slots.geom1)   # [S, 3, 3, B]
    R2 = _take0(geom_xmat, slots.geom2)
    size1 = jnp.asarray(slots.size1, dtype)
    size2 = jnp.asarray(slots.size2, dtype)
    r1 = _exp(size1[:, 0], nb)    # (S, 1[,1]) -> broadcasts over the batch
    r2 = _exp(size2[:, 0], nb)
    hl1 = _exp(size1[:, 1], nb)
    hl2 = _exp(size2[:, 1], nb)
    axis1 = R1[:, :, 2]           # [S, 3, B]
    axis2 = R2[:, :, 2]
    if KERNEL_MODE[0]:
        # re-materialize the sliced axes at zero layout offset: Mosaic cannot
        # ADD-reduce over a sublane dim whose layout offset is nonzero, and
        # these slices (offset 2 of the 3x3 frame) feed dot-product reductions
        axis1 = jnp.stack(
            [jax.lax.index_in_dim(axis1, j, 1, keepdims=False) for j in range(3)], 1
        )
        axis2 = jnp.stack(
            [jax.lax.index_in_dim(axis2, j, 1, keepdims=False) for j in range(3)], 1
        )
    point = _exp(jnp.asarray(slots.point, dtype), nb)    # (S, 1[,1])

    if kind_masks is None:
        kind_masks = collision.make_kind_masks(np.asarray(slots.kind))
    sel = _kind_sel(kind_masks)

    c2 = sel("is_pc", p2 + (point * hl2)[:, None] * axis2, p2)
    t_sc = jnp.clip(jnp.sum((p1 - p2) * axis2, 1), -hl2, hl2)    # [S, B]
    c2 = sel("is_sc", p2 + t_sc[:, None] * axis2, c2)

    r = p1 - p2
    a = jnp.sum(axis1 * axis1, 1)
    e = jnp.sum(axis2 * axis2, 1)
    bb = jnp.sum(axis1 * axis2, 1)
    c = jnp.sum(axis1 * r, 1)
    f = jnp.sum(axis2 * r, 1)
    denom = a * e - bb * bb
    ok = jnp.abs(denom) > 1e-12
    s_par = jnp.where(ok, (bb * f - c * e) / jnp.where(ok, denom, 1.0), 0.0)
    s_par = jnp.clip(s_par, -hl1, hl1)
    t_par = jnp.clip((bb * s_par + f) / jnp.maximum(e, 1e-12), -hl2, hl2)
    s_par = jnp.clip((bb * t_par - c) / jnp.maximum(a, 1e-12), -hl1, hl1)
    cseg1 = p1 + s_par[:, None] * axis1
    cseg2 = p2 + t_par[:, None] * axis2
    c1 = sel("is_cc", cseg1, p1)
    c2 = sel("is_cc", cseg2, c2)

    # sphere-sphere on reduced centers
    d = c2 - c1
    L = jnp.sqrt(jnp.sum(d * d, 1))                      # [S, B]
    up = jnp.concatenate(
        [jnp.zeros((S, 2) + B, dtype), jnp.ones((S, 1) + B, dtype)], 1
    )
    if KERNEL_MODE[0]:
        # arithmetic select: [S,B] i1 -> [S,1,B] inserts are not Mosaic-safe
        nearf = (L < 1e-12).astype(dtype)[:, None]
        n_ss = nearf * up + (1.0 - nearf) * (d / jnp.maximum(L, 1e-12)[:, None])
    else:
        n_ss = jnp.where((L < 1e-12)[:, None], up, d / jnp.maximum(L, 1e-12)[:, None])
    dist_ss = L - (r1 + r2)
    pos_ss = c1 + n_ss * (r1 + 0.5 * dist_ss)[:, None]

    # plane narrowphase (axis1 IS R1[:,:,2], already offset-zeroed in kernel mode)
    n_pl = axis1
    cdist = jnp.sum(n_pl * (c2 - p1), 1)
    dist_pl = cdist - r2
    pos_pl = c2 - n_pl * (r2 + 0.5 * dist_pl)[:, None]

    dist = sel("is_plane", dist_pl, dist_ss)
    pos = sel("is_plane", pos_pl, pos_ss)
    n = sel("is_plane", n_pl, n_ss)

    frame = sel("is_pc", _plane_capsule_frame_l(n, axis2), _make_frame_l(n))
    active = dist < _exp(jnp.asarray(slots.includemargin, dtype), nb)
    return ContactsL(dist=dist, pos=pos, frame=frame, active=active)


# ---------------------------------------------------------------------------
# constraint rows (lane port of constraint.make_efc)
# ---------------------------------------------------------------------------


class EfcL(NamedTuple):
    J: jnp.ndarray        # [ne, nv, B]
    R: jnp.ndarray        # [ne, B]
    aref: jnp.ndarray     # [ne, B]


class SelMeta(NamedTuple):
    """Per-slot constraint metadata AFTER per-env top-k slot selection: the
    static [S, ...] tables of EfcMeta gathered down to traced [k, ..., *B]
    arrays (each env picks its own k slots, so the tables become batched)."""

    maskdiff: jnp.ndarray  # [k, nv, *B]
    C: jnp.ndarray         # [k, NR, 6, *B]
    rowmask: jnp.ndarray   # [k, NR, *B]
    approx: jnp.ndarray    # [k, NR, *B]
    margin: jnp.ndarray    # [k, *B]
    K: jnp.ndarray         # [k, *B]
    Bc: jnp.ndarray        # [k, *B]
    solimp: jnp.ndarray    # [k, 5, *B]
    onehot: jnp.ndarray    # [k, S, *B] the selection itself (for aux gathers)


def select_topk_contacts(meta, con: ContactsL, k: int, dtype):
    """Per-env top-k contact-slot selection (the dynamic-contact analogue of
    MuJoCo's variable nc; MJX's max_contact_points plays the same role).

    The full slot table evaluates every candidate pair every step — Humanoid
    carries 138 slots -> 552 padded constraint rows of which a handful are
    ever active (docs/PERF.md). Every [ne, nv, B] tensor downstream (row
    assembly, Newton H build, J matvecs) scales with ne = L + NR*S, so
    shrinking S -> k cuts the dominating HBM traffic ~S/k times.

    Selection is EXACT whenever every active slot is among the k selected:
    inactive rows are masked to J=0/aref=0/R=1, contributing zero force and
    zero cost to the Newton objective, so dropping them does not change the
    solve. k is sized per model from measured simultaneous-contact counts
    (runs_curves/count_contacts.py) with headroom; an env that somehow
    exceeds k sees its shallowest excess contacts ignored for that step
    (graceful degradation, like engine contact-buffer caps).

    No sorts, no gathers: XLA-TPU lowers both catastrophically (measured
    argsort of the [S, B] scores alone at 1.4-1.8 ms/forward — more than the
    entire 569-row Humanoid assembly; runs_curves/bench_topk_parts.py).
    Selection instead runs k argmin sweeps over the scores (compare/reduce
    ops at full lane width), builds a slot-ordered one-hot [k, S, *B], and
    realizes every "gather" as a one-hot multiply-reduce — the static tables
    in ONE [k,S]x[S,F] einsum the MXU eats. XLA-path only (forward_l guards
    on KERNEL_MODE)."""
    Bs = con.dist.shape[1:]
    nb = len(Bs)
    S = con.dist.shape[0]
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (S,) + (1,) * nb, 0)
    # Distinct finite scores: actives by signed distance (ties broken by
    # argmin's first-occurrence rule), inactive slots at 1e6 + slot index so
    # padding picks the lowest-index inactive slots deterministically and no
    # slot is ever selected twice. (Active |dist| < margin << 1e6 always;
    # 1e6 + 137 is exact in f32.)
    score = jnp.where(con.active, con.dist,
                      jnp.asarray(1e6, dtype) + iota_s.astype(dtype))
    remaining = score
    hits = []
    for _ in range(k):
        am = jnp.argmin(remaining, axis=0)                     # [*B]
        oh_r = (iota_s == am[None]).astype(dtype)              # [S, *B]
        hits.append(oh_r)
        remaining = jnp.where(oh_r > 0, jnp.asarray(jnp.inf, dtype), remaining)
    # slot-ordered compaction (selection is a filter, not a permutation: row
    # reduction order then matches the full path's, keeping solver-boundary-
    # sensitive trajectories as close as fp allows)
    selmask = sum(hits)                                        # [S, *B] 0/1
    pos = jnp.cumsum(selmask, axis=0) - 1.0                    # [S, *B]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, 1) + (1,) * nb, 0).astype(dtype)
    oh = selmask[None] * (pos[None] == iota_k).astype(dtype)   # [k, S, *B]

    def g_env(x, nin):
        """[S, inner..., *B] -> [k, inner..., *B] one-hot multiply-reduce."""
        o = oh.reshape((k, S) + (1,) * nin + Bs)
        return jnp.sum(o * x[None], 1)

    con_k = ContactsL(
        dist=g_env(con.dist, 0),
        pos=g_env(con.pos, 1),
        frame=g_env(con.frame, 2),
        active=g_env(con.active.astype(dtype), 0) > 0.5,
    )

    # static tables: one [k,S]x[S,F] contraction (batched over *B)
    nv = jnp.asarray(meta.con_maskdiff).shape[1]
    NR = jnp.asarray(meta.con_rowmask).shape[1]
    tabs = [
        (jnp.asarray(meta.con_maskdiff, dtype), (nv,)),
        (jnp.asarray(meta.con_C, dtype).reshape(S, NR * 6), (NR, 6)),
        (jnp.asarray(meta.con_rowmask, dtype), (NR,)),
        (jnp.asarray(meta.con_approx, dtype), (NR,)),
        (jnp.asarray(meta.con_margin, dtype)[:, None], ()),
        (jnp.asarray(meta.con_K, dtype)[:, None], ()),
        (jnp.asarray(meta.con_B, dtype)[:, None], ()),
        (jnp.asarray(meta.con_solimp, dtype), (5,)),
    ]
    table = jnp.concatenate([t for t, _ in tabs], axis=1)      # [S, F]
    gathered = jnp.einsum("ks...,sf->kf...", oh, table)        # [k, F, *B]
    cols, off = [], 0
    for t, shape in tabs:
        w = t.shape[1]
        g = gathered[:, off:off + w]
        off += w
        cols.append(g.reshape((k,) + (shape or ()) + Bs) if shape
                    else g.reshape((k,) + Bs))
    sel = SelMeta(
        maskdiff=cols[0], C=cols[1], rowmask=cols[2], approx=cols[3],
        margin=cols[4], K=cols[5], Bc=cols[6], solimp=cols[7], onehot=oh,
    )
    return con_k, sel


def _impedance_l(solimp, r):
    """constraint.impedance with solimp [rows, 5] (static or traced consts)
    or [rows, 5, *B] (per-env top-k-selected, select_topk_contacts) and
    r [rows, *B]."""
    dtype = r.dtype
    nb = r.ndim - 1
    solimp = jnp.asarray(solimp, dtype)
    if solimp.ndim > 2:
        # selected tables already carry the batch dims: columns match r exactly
        d0, dmax, width, mid, power = (solimp[:, i] for i in range(5))
    else:
        # (rows, 1[,1]) columns via 2D slice + _exp (not [:, i][:, None]: 2D ->
        # 1D -> 2D chains can fuse into Mosaic-unsupported relayouts in-kernel)
        d0 = _exp(solimp[:, 0:1], nb - 1) if nb else solimp[:, 0:1]
        dmax = _exp(solimp[:, 1:2], nb - 1) if nb else solimp[:, 1:2]
        width = _exp(solimp[:, 2:3], nb - 1) if nb else solimp[:, 2:3]
        mid = _exp(solimp[:, 3:4], nb - 1) if nb else solimp[:, 3:4]
        power = _exp(solimp[:, 4:5], nb - 1) if nb else solimp[:, 4:5]
    x = jnp.clip(jnp.abs(r) / jnp.where(width <= 0, 1.0, width), 0.0, 1.0)
    a = 1.0 / mid ** (power - 1.0)
    b = 1.0 / (1.0 - mid) ** (power - 1.0)
    y = jnp.where(x < mid, a * x**power, 1.0 - b * (1.0 - x) ** power)
    y = jnp.where(width <= 0, 1.0, y)
    return jnp.clip(d0 + y * (dmax - d0), MINIMP, MAXIMP)


def make_efc_l(m: Model, meta, com: ComL, qpos, qvel, con: ContactsL,
               sel: SelMeta | None = None) -> EfcL:
    dtype = qvel.dtype
    B = qvel.shape[1:]
    nb = len(B)
    L, S = meta.n_limit, meta.n_slots
    if sel is not None:
        S = con.dist.shape[0]   # k selected slots (select_topk_contacts)
    parts_J, parts_R, parts_aref = [], [], []

    if L:
        q = _take0(qpos, meta.lim_qadr)                   # [L, B] (gather)
        v = _take0(qvel, meta.lim_dadr)
        lo = _exp(jnp.asarray(meta.lim_lo, dtype), nb)
        hi = _exp(jnp.asarray(meta.lim_hi, dtype), nb)
        dist_lo = q - lo
        dist_hi = hi - q
        lower_closer = dist_lo < dist_hi
        pos = jnp.minimum(dist_lo, dist_hi)
        sign = jnp.where(lower_closer, 1.0, -1.0).astype(dtype)
        J = _exp(jnp.asarray(meta.lim_onehot, dtype), nb) * sign[:, None]
        margin = _exp(jnp.asarray(meta.lim_margin, dtype), nb)
        r = pos - margin
        imp = _impedance_l(meta.lim_solimp, r)
        aref = (
            -_exp(jnp.asarray(meta.lim_B, dtype), nb) * (sign * v)
            - _exp(jnp.asarray(meta.lim_K, dtype), nb) * imp * r
        )
        Rr = (1.0 - imp) / imp * _exp(jnp.asarray(meta.lim_invw, dtype), nb)
        active = pos < margin
        actf = active.astype(dtype)
        parts_J.append(J * actf[:, None])
        parts_R.append(jnp.where(active, Rr, 1.0))
        parts_aref.append(aref * actf)

    if S and meta.needs_jacr:
        # torsional/rolling (condim>3) rows keep the original 4D formulation;
        # not Mosaic-kernel-eligible (mega.supported excludes needs_jacr) and
        # none of the four locomotion models use it
        assert sel is None, "top-k selection not wired for condim>3 models"
        assert nb == 1, "needs_jacr path supports flat batch only"
        NR = meta.n_rows
        dof_root = np.maximum(
            np.asarray(m.body_rootid)[np.asarray(m.dof_bodyid)], 0
        )
        origins = _take0(com.subtree_com, dof_root)       # [nv, 3, B]
        cd_ang = com.cdof[:, :3]                          # [nv, 3, B]
        cd_lin = com.cdof[:, 3:]
        rel = con.pos[:, None, :, :] - origins[None]      # [S, nv, 3, B]
        ca0, ca1, ca2 = (
            jax.lax.index_in_dim(cd_ang, i, 1, keepdims=False)[None] for i in range(3)
        )                                                 # each [1, nv, B]
        r0, r1, r2 = (
            jax.lax.index_in_dim(rel, i, 2, keepdims=False) for i in range(3)
        )                                                 # each [S, nv, B]
        cross = jnp.stack(
            [ca1 * r2 - ca2 * r1, ca2 * r0 - ca0 * r2, ca0 * r1 - ca1 * r0], 2
        )
        jacp = cd_lin[None] + cross                       # [S, nv, 3, B]
        maskdiff = jnp.asarray(meta.con_maskdiff, dtype)[:, :, None, None]
        jacd = maskdiff * jacp
        # Jf[s, k, n, B] = frame[s, k, :, B] . jacd[s, n, :, B]
        Jf = jnp.sum(con.frame[:, :, None, :, :] * jacd[:, None, :, :, :], 3)
        conC = jnp.asarray(meta.con_C, dtype)             # [S, NR, 6]
        jacr = maskdiff * cd_ang[None]                    # [S, nv, 3, B]
        Jr = jnp.sum(con.frame[:, :, None, :, :] * jacr[:, None, :, :, :], 3)
        Jax_ = jnp.concatenate([Jf, Jr], 1)               # [S, 6, nv, B]
        # Jrows[s, r, n, B] = sum_k conC[s, r, k] Jax[s, k, n, B]
        Jrows = jnp.sum(conC[:, :, :, None, None] * Jax_[:, None], 2)
        vel = jnp.sum(Jrows * qvel[None, None, :, :], 2)  # [S, NR, B]
        rm = jnp.asarray(meta.con_rowmask, dtype)

        r = con.dist - jnp.asarray(meta.con_margin, dtype)[:, None]
        imp = _impedance_l(meta.con_solimp, r)
        aref = (
            -jnp.asarray(meta.con_B, dtype)[:, None, None] * vel
            - (jnp.asarray(meta.con_K, dtype)[:, None] * imp * r)[:, None, :]
        )
        Rr = ((1.0 - imp) / imp)[:, None, :] * jnp.asarray(meta.con_approx, dtype)[:, :, None]
        active = con.active[:, None, :] & (rm > 0)[:, :, None]
        actf = active.astype(dtype)
        parts_J.append((Jrows * actf[:, :, None, :]).reshape((NR * S, m.nv) + B))
        parts_R.append(jnp.where(active, Rr, 1.0).reshape((NR * S,) + B))
        parts_aref.append((aref * actf).reshape((NR * S,) + B))
    elif S:
        # Component-wise pyramid rows (the Mosaic-kernel-safe formulation,
        # also fewer flops): everything is built from [S, B] / [S, nv, B]
        # tiles — no 4D/5D broadcasts, no (x,) -> (x,1,1) relayouts. Row
        # blocks are emitted r-major ([r0 of all slots, r1 of all slots, ..]
        # vs the 4D path's s-major) — EfcL row order is free: every consumer
        # (Newton solve, qfrc_constraint) reduces over rows.
        NR = meta.n_rows
        dof_root = np.maximum(
            np.asarray(m.body_rootid)[np.asarray(m.dof_bodyid)], 0
        )
        origins = _take0(com.subtree_com, dof_root)       # [nv, 3, B]
        cd_ang = com.cdof[:, :3]                          # [nv, 3, B]
        cd_lin = com.cdof[:, 3:]
        ca = [jax.lax.index_in_dim(cd_ang, i, 1, keepdims=False) for i in range(3)]
        cl = [jax.lax.index_in_dim(cd_lin, i, 1, keepdims=False) for i in range(3)]
        o = [jax.lax.index_in_dim(origins, i, 1, keepdims=False) for i in range(3)]
        p = [jax.lax.index_in_dim(con.pos, i, 1, keepdims=False) for i in range(3)]
        rel = [p[i][:, None] - o[i][None] for i in range(3)]         # [S, nv, *B]
        cross = [
            ca[1][None] * rel[2] - ca[2][None] * rel[1],
            ca[2][None] * rel[0] - ca[0][None] * rel[2],
            ca[0][None] * rel[1] - ca[1][None] * rel[0],
        ]
        if sel is None:
            maskdiff3 = _exp(jnp.asarray(meta.con_maskdiff, dtype), nb)  # (S, nv, 1[,1])
            conC = jnp.asarray(meta.con_C, dtype)             # [S, NR, 6]
            rm = jnp.asarray(meta.con_rowmask, dtype)         # [S, NR]
            approx = jnp.asarray(meta.con_approx, dtype)      # [S, NR]
            # exact pre-round-5 slicing (index_in_dim row then column): keeps
            # the emitted HLO — and thus fusion rounding — identical to the
            # formulation the equivalence tolerances were pinned against
            crows = [jax.lax.index_in_dim(conC, rr, 1, keepdims=False)
                     for rr in range(NR)]

            def Ccomp(rr, kk):
                return _exp(crows[rr][:, kk], nb)

            def rmcol(rr):
                return _exp(rm[:, rr], nb)

            def apcol(rr):
                return _exp(approx[:, rr], nb)

            margin = _exp(jnp.asarray(meta.con_margin, dtype), nb)
            conK = _exp(jnp.asarray(meta.con_K, dtype), nb)
            conB_col = _exp(jnp.asarray(meta.con_B, dtype), nb)          # (S, 1[,1])
            solimp = meta.con_solimp
        else:
            # per-env selected tables: every column already carries *B dims
            maskdiff3 = sel.maskdiff

            def Ccomp(rr, kk):
                return sel.C[:, rr, kk]

            def rmcol(rr):
                return sel.rowmask[:, rr]

            def apcol(rr):
                return sel.approx[:, rr]

            margin, conK, conB_col, solimp = sel.margin, sel.K, sel.Bc, sel.solimp
        jacd = [maskdiff3 * (cl[i][None] + cross[i]) for i in range(3)]
        # frame component fr[k][j] = frame[:, k, j] as [S, B]
        frk = [jax.lax.index_in_dim(con.frame, k, 1, keepdims=False) for k in range(3)]
        fr = [[jax.lax.index_in_dim(frk[k], j, 1, keepdims=False) for j in range(3)]
              for k in range(3)]

        r = con.dist - margin
        imp = _impedance_l(solimp, r)                                 # [S, *B]
        Kterm = conK * imp * r                                        # [S, *B]
        Rbase = (1.0 - imp) / imp                                     # [S, B]

        rows_J, rows_R, rows_a = [], [], []
        for rr in range(NR):
            # g[j] = sum_k conC[s, r, k] frame[s, k, j]  — [S, B]-level combine
            g = [
                sum(Ccomp(rr, k) * fr[k][j] for k in range(3))
                for j in range(3)
            ]
            # Jrow[s, n, *B] = sum_j g[j] jacd[j]
            Jrow = sum(g[j][:, None] * jacd[j] for j in range(3))
            velr = jnp.sum(Jrow * qvel[None], 1)                      # [S, B]
            arefr = -conB_col * velr - Kterm
            # rm is a 0/1 float table: actf = active * rm_col is exact, and
            # avoids [S,B] & (S,1) i1 broadcasts in the kernel
            actf = con.active.astype(dtype) * rmcol(rr)
            rows_J.append(Jrow * actf[:, None])
            rows_R.append(actf * (Rbase * apcol(rr)) + (1.0 - actf))
            rows_a.append(arefr * actf)
        if KERNEL_MODE[0]:
            # r-major blocks (order is free for every consumer; a 4D
            # stack+reshape would be a Mosaic relayout)
            parts_J.extend(rows_J)
            parts_R.extend(rows_R)
            parts_aref.extend(rows_a)
        else:
            # s-major interleave, matching the 4D path / reference row order
            parts_J.append(jnp.stack(rows_J, 1).reshape((NR * S, m.nv) + B))
            parts_R.append(jnp.stack(rows_R, 1).reshape((NR * S,) + B))
            parts_aref.append(jnp.stack(rows_a, 1).reshape((NR * S,) + B))

    if not parts_J:
        return EfcL(
            J=jnp.zeros((0, m.nv) + B, dtype),
            R=jnp.zeros((0,) + B, dtype),
            aref=jnp.zeros((0,) + B, dtype),
        )
    return EfcL(
        J=jnp.concatenate(parts_J),
        R=jnp.concatenate(parts_R),
        aref=jnp.concatenate(parts_aref),
    )


# ---------------------------------------------------------------------------
# post-constraint observables (lane port of forward.rne_post_constraint)
# ---------------------------------------------------------------------------


def cfrc_ext_l(m: Model, ctx, com: ComL, con: ContactsL, sel: SelMeta | None,
               f: jnp.ndarray) -> jnp.ndarray:
    """cfrc_ext [nbody, 6, *B] (torque-first, about each body's c-frame
    origin) from the solved constraint forces — forward.rne_post_constraint's
    math in lane layout. The scatter-to-bodies runs as static 0/1-mask
    contractions (full slot table) or one-hot contractions over the selected
    slots' traced body ids (top-k path) — no dynamic scatters, which XLA-TPU
    lowers as badly as gathers."""
    meta = ctx.meta
    dtype = f.dtype
    Bs = f.shape[1:]
    nb = len(Bs)
    L, NR = meta.n_limit, meta.n_rows
    Snow = con.dist.shape[0]
    nbody = int(m.nbody)
    slots_np = getattr(ctx, "slots_np", None) or ctx.slots
    body1 = np.asarray(slots_np.body1).astype(int)   # [S] static
    body2 = np.asarray(slots_np.body2).astype(int)
    rootid = np.maximum(np.asarray(m.body_rootid), 0)

    f_con = f[L:].reshape((Snow, NR) + Bs)
    # frame-space wrench per slot: con_C^T f_rows (mj_contactForce decoding)
    if sel is None:
        conC = jnp.asarray(meta.con_C, dtype)
        wr = [sum(f_con[:, r] * _exp(conC[:, r, c], nb) for r in range(NR))
              for c in range(6)]
    else:
        wr = [sum(f_con[:, r] * sel.C[:, r, c] for r in range(NR))
              for c in range(6)]
    frk = [jax.lax.index_in_dim(con.frame, kk, 1, keepdims=False) for kk in range(3)]
    fr = [[jax.lax.index_in_dim(frk[kk], j, 1, keepdims=False) for j in range(3)]
          for kk in range(3)]
    force = [sum(wr[kk] * fr[kk][j] for kk in range(3)) for j in range(3)]
    torque = [sum(wr[3 + kk] * fr[kk][j] for kk in range(3)) for j in range(3)]
    p = [jax.lax.index_in_dim(con.pos, i, 1, keepdims=False) for i in range(3)]

    org = com.subtree_com                             # [nbody, 3, *B]
    parts = []                                        # [(scatter, contrib6)]
    for bids, sign in ((body1, -1.0), (body2, 1.0)):
        o_all = org[rootid[bids]]                     # [S, 3, *B] static gather
        nw_s = (bids != 0).astype(float)              # [S] static
        if sel is not None:
            oh = sel.onehot                           # [k, S, *B]
            o_slot = [jnp.sum(oh * jax.lax.index_in_dim(o_all, i, 1, False)[None], 1)
                      for i in range(3)]              # [k, *B] each
            bidf = jnp.sum(oh * _exp(jnp.asarray(bids, dtype), nb)[None, :], 1)
            nw = jnp.sum(oh * _exp(jnp.asarray(nw_s, dtype), nb)[None, :], 1)
            scat = jnp.stack(
                [(bidf == n).astype(dtype) for n in range(nbody)], 0
            )                                         # [nbody, k, *B]
        else:
            o_slot = [jax.lax.index_in_dim(o_all, i, 1, False) for i in range(3)]
            nw = _exp(jnp.asarray(nw_s, dtype), nb)
            scat = jnp.asarray(
                np.stack([(bids == n).astype(float) for n in range(nbody)], 0),
                dtype,
            )                                         # [nbody, S] static 0/1
        fb = [sign * force[j] * nw for j in range(3)]
        rel = [p[i] - o_slot[i] for i in range(3)]
        tq = [
            rel[1] * fb[2] - rel[2] * fb[1] + sign * torque[0] * nw,
            rel[2] * fb[0] - rel[0] * fb[2] + sign * torque[1] * nw,
            rel[0] * fb[1] - rel[1] * fb[0] + sign * torque[2] * nw,
        ]
        parts.append((scat, tq + fb))                 # 6 comps, torque-first

    comps = []
    for c in range(6):
        acc = None
        for scat, contrib in parts:
            if scat.ndim == 2:                        # static [nbody, S]
                term = jnp.einsum("ns,s...->n...", scat, contrib[c])
            else:                                     # traced [nbody, k, *B]
                term = jnp.sum(scat * contrib[c][None], 1)
            acc = term if acc is None else acc + term
        comps.append(acc)
    return jnp.stack(comps, 1)                        # [nbody, 6, *B]


class AuxL(NamedTuple):
    """Last-forward observables for the env layer (mjData stale-read parity):
    everything gymnasium's obs builders touch after mj_step."""

    kin: "KinL"
    com: ComL
    vel: VelL
    cfrc_ext: jnp.ndarray | None   # [nbody, 6, *B]


# ---------------------------------------------------------------------------
# forward + integrators (lane ports of physics/forward.py)
# ---------------------------------------------------------------------------


class ForwardLOut(NamedTuple):
    qacc: jnp.ndarray            # [nv, B]
    qfrc_smooth: jnp.ndarray     # [nv, B]
    qfrc_constraint: jnp.ndarray # [nv, B]
    M: jnp.ndarray               # [nv, nv, B]
    aux: AuxL | None = None      # want_aux=True only


def forward_l(m: Model, ctx, qpos, qvel, ctrl, iterations, warmstart=None,
              want_aux=False) -> ForwardLOut:
    kin = kinematics_l(m, qpos)
    com = com_quantities_l(m, kin)
    M = crb_mass_matrix_l(m, com)
    vel = com_velocities_l(m, com, qvel)
    qfrc_bias = rne_bias_l(m, com, vel, qvel)
    qfrc_smooth = passive_forces_l(m, qpos, qvel) + actuator_forces_l(m, ctrl) - qfrc_bias
    qacc_smooth = spd_solve_l(M, qfrc_smooth)

    con = collide_l(m, kin.geom_xpos, kin.geom_xmat, ctx.slots, ctx.kind_masks)
    sel = None
    topk = getattr(ctx, "topk", None)
    if topk and not KERNEL_MODE[0] and not ctx.meta.needs_jacr \
            and topk < ctx.meta.n_slots:
        con, sel = select_topk_contacts(ctx.meta, con, topk, qvel.dtype)
    efc = make_efc_l(m, ctx.meta, com, qpos, qvel, con, sel)

    ne = efc.J.shape[0]
    if ne:
        D = 1.0 / efc.R
        x0 = qacc_smooth if warmstart is None else warmstart
        f, qacc = solver.solve_newton_lanes(
            M, efc.J, D, efc.aref, qacc_smooth, x0, iterations
        )
        qfrc_constraint = jnp.sum(efc.J * f[:, None, :], 0)
    else:
        qacc = qacc_smooth
        qfrc_constraint = jnp.zeros_like(qfrc_smooth)
    aux = None
    if want_aux:
        cfrc = (
            cfrc_ext_l(m, ctx, com, con, sel, f) if ne
            else jnp.zeros((int(m.nbody), 6) + qvel.shape[1:], qvel.dtype)
        )
        aux = AuxL(kin=kin, com=com, vel=vel, cfrc_ext=cfrc)
    return ForwardLOut(
        qacc=qacc, qfrc_smooth=qfrc_smooth, qfrc_constraint=qfrc_constraint, M=M,
        aux=aux,
    )


def integrate_pos_l(m: Model, qpos, qvel, dt):
    rows = [qpos[i] for i in range(m.nq)]
    for j in range(m.njnt):
        qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
        if m.jnt_type[j] == FREE:
            for i in range(3):
                rows[qadr + i] = qpos[qadr + i] + dt * qvel[dadr + i]
            q = lquat_integrate(qpos[qadr + 3 : qadr + 7], qvel[dadr + 3 : dadr + 6], dt)
            for i in range(4):
                rows[qadr + 3 + i] = q[i]
        else:
            rows[qadr] = qpos[qadr] + dt * qvel[dadr]
    return jnp.stack(rows)


def _euler_l(m, ctx, qpos, qvel, ctrl, iterations, warmstart, want_aux=False):
    h = m.opt.timestep
    fwd = forward_l(m, ctx, qpos, qvel, ctrl, iterations, warmstart,
                    want_aux=want_aux)
    if ctx.has_damping:
        damping = jnp.asarray(m.dof_damping, qvel.dtype)
        r_ = jax.lax.broadcasted_iota(jnp.int32, (m.nv, m.nv), 0)
        c_ = jax.lax.broadcasted_iota(jnp.int32, (m.nv, m.nv), 1)
        eye2 = (r_ == c_).astype(qvel.dtype)
        # diagonal via 2D mask + trailing singletons (Mosaic-safe; see
        # crb_mass_matrix_l note on the (nv,)->(nv,1,..) relayout)
        MhB = fwd.M + _exp((h * damping)[None, :] * eye2, qvel.ndim - 1)
        dv = h * spd_solve_l(MhB, fwd.qfrc_smooth + fwd.qfrc_constraint)
    else:
        dv = h * fwd.qacc
    qvel_new = qvel + dv
    qpos_new = integrate_pos_l(m, qpos, qvel_new, h)
    if want_aux:
        return qpos_new, qvel_new, fwd.qacc, fwd.aux
    return qpos_new, qvel_new, fwd.qacc


_RK4_A = ((0.5,), (0.0, 0.5), (0.0, 0.0, 1.0))
_RK4_B = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)


def _rk4_l(m, ctx, qpos, qvel, ctrl, iterations, warmstart, want_aux=False):
    h = m.opt.timestep
    fwd0 = forward_l(m, ctx, qpos, qvel, ctrl, iterations, warmstart)
    Fv = [qvel]
    Fa = [fwd0.qacc]
    fwd_i = fwd0
    for i in range(3):
        dv = sum(a * v for a, v in zip(_RK4_A[i], Fv) if a)
        da = sum(a * acc for a, acc in zip(_RK4_A[i], Fa) if a)
        qpos_i = integrate_pos_l(m, qpos, dv, h)
        qvel_i = qvel + h * da
        # mjData observables live at the LAST RK stage's trial state after
        # mj_step (forward._rk4_step); aux only there
        fwd_i = forward_l(m, ctx, qpos_i, qvel_i, ctrl, iterations, Fa[-1],
                          want_aux=want_aux and i == 2)
        Fv.append(qvel_i)
        Fa.append(fwd_i.qacc)
    dv = sum(b * v for b, v in zip(_RK4_B, Fv))
    da = sum(b * a for b, a in zip(_RK4_B, Fa))
    qpos_new = integrate_pos_l(m, qpos, dv, h)
    qvel_new = qvel + h * da
    if want_aux:
        return qpos_new, qvel_new, Fa[-1], fwd_i.aux
    return qpos_new, qvel_new, Fa[-1]


def step_l(m: Model, ctx, qpos, qvel, ctrl, iterations, warmstart,
           want_aux=False):
    """One lane-major mj_step: [*, B] in, [*, B] out; returns qacc for the
    next step's warmstart (qacc_warmstart semantics of forward.step).
    want_aux=True additionally returns the mjData-visible observables
    (AuxL of the last forward — stale-read parity with forward.step)."""
    if m.opt.integrator == EULER:
        return _euler_l(m, ctx, qpos, qvel, ctrl, iterations, warmstart,
                        want_aux=want_aux)
    return _rk4_l(m, ctx, qpos, qvel, ctrl, iterations, warmstart,
                  want_aux=want_aux)


def lanes_supported(m: Model, ctx, solver_type: str) -> bool:
    """The lane path covers the locomotion subset: Newton solver and
    sphere/capsule/plane colliders (box kinds keep the vmapped path)."""
    if solver_type != "newton":
        return False
    kind = np.asarray(ctx.slots.kind)
    return not np.any(kind >= collision.K_PLANE_BOX)


def substeps_batched(m: Model, ctx, qpos, qvel, ctrl, warmstart, iterations,
                     n_sub, tile2d=None):
    """Run n_sub substeps in lane layout. Batch-first API: qpos [B, nq] etc.
    in and out; one transpose+reshape at each boundary (the only place the
    batch axis moves). Returns (qpos, qvel, qacc) with qacc the last
    substep's qacc_warmstart carry.

    `tile2d` (default: on for B a multiple of 128, XLA path only) runs the
    pipeline with the batch as TWO trailing axes [.., B//128, 128]: XLA tiles
    the last two dims onto the (8, 128) vreg, so flat [k, B] arrays with
    k<8 (3-vectors, quats, nv-rows) waste 1-5/8 of every sublane; the 2D
    form fills tiles completely (measured 1.6-1.8x on the substep op mix)."""
    if n_sub == 0:
        return qpos, qvel, warmstart
    B = qpos.shape[0]
    if tile2d is None:
        # the needs_jacr (condim>3) constraint path asserts a flat batch
        # (make_efc_l), so the tile-2D default must not capture such models
        tile2d = B % 128 == 0 and B >= 256 and not ctx.meta.needs_jacr

    if tile2d:
        def to_l(x):
            return x.T.reshape(x.shape[1], B // 128, 128)

        def from_l(x):
            return x.reshape(x.shape[0], B).T
    else:
        def to_l(x):
            return x.T

        def from_l(x):
            return x.T

    qp = to_l(qpos)
    qv = to_l(qvel)
    ct = to_l(ctrl)
    ws = to_l(warmstart)

    if n_sub == 1:
        qp, qv, ws = step_l(m, ctx, qp, qv, ct, iterations, ws)
    else:
        def body(carry, _):
            qp, qv, ws = carry
            qp, qv, ws = step_l(m, ctx, qp, qv, ct, iterations, ws)
            return (qp, qv, ws), None

        (qp, qv, ws), _ = jax.lax.scan(body, (qp, qv, ws), None, length=n_sub)
    return from_l(qp), from_l(qv), from_l(ws)


class AuxB(NamedTuple):
    """Batch-first observables of the final substep, for the env layer's
    vmapped _post_step (exactly the fields gymnasium's stale reads touch)."""

    xpos: jnp.ndarray      # [B, nbody, 3]
    xipos: jnp.ndarray     # [B, nbody, 3]
    cinert: jnp.ndarray    # [B, nbody, 6, 6]
    cvel: jnp.ndarray      # [B, nbody, 6]
    cfrc_ext: jnp.ndarray  # [B, nbody, 6]


def final_substep_aux(m: Model, ctx, qpos, qvel, ctrl, warmstart, iterations,
                      tile2d=None):
    """One lane-major substep that ALSO returns the mjData-visible
    observables batch-first — replaces the env layer's per-step fallback to
    the vmapped reference path for cfrc_ext envs (the round-5 Ant/Humanoid
    bottleneck: that vmapped final substep cost ~4x the other four substeps
    combined). Batch-first in/out like substeps_batched."""
    B = qpos.shape[0]
    if tile2d is None:
        tile2d = B % 128 == 0 and B >= 256 and not ctx.meta.needs_jacr

    if tile2d:
        def to_l(x):
            return x.T.reshape(x.shape[1], B // 128, 128)
    else:
        def to_l(x):
            return x.T

    def from_l_any(x):
        # [lead..., *Bs] -> [B, lead...]
        lead = x.shape[: x.ndim - (2 if tile2d else 1)]
        return jnp.moveaxis(x.reshape(lead + (B,)), -1, 0)

    qp, qv, ct, ws = to_l(qpos), to_l(qvel), to_l(ctrl), to_l(warmstart)
    qp, qv, qacc, aux = step_l(m, ctx, qp, qv, ct, iterations, ws, want_aux=True)
    auxb = AuxB(
        xpos=from_l_any(aux.kin.xpos),
        xipos=from_l_any(aux.kin.xipos),
        cinert=from_l_any(aux.com.cinert),
        cvel=from_l_any(aux.vel.cvel),
        cfrc_ext=from_l_any(aux.cfrc_ext),
    )
    return from_l_any(qp), from_l_any(qv), from_l_any(qacc), auxb
