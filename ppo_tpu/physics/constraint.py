"""Soft-constraint rows (joint limits + pyramidal contact friction cones).

Implements MuJoCo's soft-constraint model (Computation chapter) with formulas
validated empirically against mjData internals (efc_KBIP / efc_R / efc_aref):

  imp  = sigmoid(|pos - margin| / width; solimp)            (clamped [1e-4, 0.9999])
  K    = 1 / (dmax^2 * timeconst^2 * dampratio^2)
  B    = 2 / (dmax * timeconst)
  aref = -B * (J qvel) - K * imp * (pos - margin)
  R    = (1 - imp) / imp * A_approx
    A_approx(limit)            = dof_invweight0[dof]
    A_approx(contact, normal)  = invw = body_invweight0[b1,0] + body_invweight0[b2,0]
    A_approx(contact, pyramid) = invw * 2 mu_i^2 (1 + mu_i^2)

Pyramidal rows per contact with condim c > 1: 2(c-1) rows, ordered as mjData
orders them — [n +- mu_1 t1, n +- mu_2 t2] (sliding), then [n +- mu_3 rot_n]
(torsional, condim >= 4), then [n +- mu_4 rot_t1, n +- mu_5 rot_t2] (rolling,
condim 6) — where mu is the contact's 5-vector friction and rot_* axes engage
the *rotational* point jacobian. condim-1 contacts use the normal row only.
R/diagApprox for every pyramidal row uses friction[0] and the translational
invweight (verified against mjData.efc_R for condim 3/4/6). The whole row set
is statically shaped and fully vectorized: row layout is [L limit rows][S
slots x R rows] (R = model max rows per contact), with structurally-absent
rows masked off by a static row mask, so the XLA graph stays compact
regardless of slot count.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ppo_tpu.physics import smooth
from ppo_tpu.physics.collision import ContactSlots, Contacts
from ppo_tpu.physics.model import Model

MINIMP, MAXIMP = 0.0001, 0.9999


class EfcMeta(NamedTuple):
    """Static constraint-row metadata, built once per model."""

    # limits [L]
    lim_qadr: np.ndarray
    lim_dadr: np.ndarray
    lim_lo: np.ndarray
    lim_hi: np.ndarray
    lim_margin: np.ndarray
    lim_K: np.ndarray
    lim_B: np.ndarray
    lim_solimp: np.ndarray      # [L, 5]
    lim_onehot: np.ndarray      # [L, nv]
    lim_invw: np.ndarray        # [L]
    # contacts [S]; R = max pyramid rows over slots (1 / 4 / 6 / 10)
    con_maskdiff: np.ndarray    # [S, nv]  (mask[b2] - mask[b1])
    con_C: np.ndarray           # [S, R, 6] row combos over (n, t1, t2, rn, rt1, rt2)
    con_rowmask: np.ndarray     # [S, R] structural row presence
    con_approx: np.ndarray      # [S, R] diag approximations
    con_K: np.ndarray           # [S]
    con_B: np.ndarray           # [S]
    con_solimp: np.ndarray      # [S, 5]
    con_margin: np.ndarray      # [S]
    # combined layout
    n_limit: int
    n_slots: int
    n_rows: int                 # R: pyramid rows per slot
    needs_jacr: bool            # any slot with condim > 3 (rotational jacobian)
    is_contact: np.ndarray      # [L + RS]
    slot_id: np.ndarray         # [L + RS] (-1 for limits)


class Efc(NamedTuple):
    J: jnp.ndarray        # [ne, nv]
    R: jnp.ndarray        # [ne]
    aref: jnp.ndarray     # [ne]
    pos: jnp.ndarray      # [ne]
    active: jnp.ndarray   # [ne] bool
    imp: jnp.ndarray      # [ne]
    meta: EfcMeta


def _kb(solref, solimp):
    timeconst, dampratio = solref
    dmax = solimp[1]
    if timeconst > 0 and dampratio > 0:
        k = 1.0 / (dmax * dmax * timeconst * timeconst * dampratio * dampratio)
        b = 2.0 / (dmax * timeconst)
    else:
        k, b = -timeconst, -dampratio
    return k, b


def make_efc_meta(m: Model, slots: ContactSlots, mask: np.ndarray) -> EfcMeta:
    # limits
    lim = [j for j in range(m.njnt) if m.jnt_limited[j]]
    L = len(lim)
    lim_onehot = np.zeros((L, m.nv))
    lim_K = np.zeros(L)
    lim_B = np.zeros(L)
    for i, j in enumerate(lim):
        lim_onehot[i, m.jnt_dofadr[j]] = 1.0
        lim_K[i], lim_B[i] = _kb(m.jnt_solref[j], m.jnt_solimp[j])
    # contacts: R = max pyramid rows over slots (1 for condim 1, 2(c-1) else)
    S = len(slots.geom1)
    R = 1
    for s in range(S):
        c = int(slots.condim[s])
        R = max(R, 1 if c == 1 else 2 * (c - 1))
    con_maskdiff = np.zeros((S, m.nv))
    con_C = np.zeros((S, R, 6))
    con_rowmask = np.zeros((S, R))
    con_approx = np.zeros((S, R))
    con_K = np.zeros(S)
    con_B = np.zeros(S)
    for s in range(S):
        b1, b2 = slots.body1[s], slots.body2[s]
        con_maskdiff[s] = mask[b2].astype(float) - mask[b1].astype(float)
        mu = slots.friction[s]            # 5-vector [s, s, t, r, r]
        invw = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
        c = int(slots.condim[s])
        if c == 1:
            con_C[s, 0, 0] = 1.0
            con_rowmask[s, 0] = 1.0
            con_approx[s, 0] = invw
        else:
            # every pyramidal row's diag approximation uses friction[0]
            # (verified vs mjData.efc_R for condim 3/4/6)
            approx = invw * 2 * mu[0] * mu[0] * (1 + mu[0] * mu[0])
            for i in range(c - 1):        # friction axis i -> frame axis i+1
                for sgn, r in ((1.0, 2 * i), (-1.0, 2 * i + 1)):
                    con_C[s, r, 0] = 1.0
                    con_C[s, r, i + 1] = sgn * mu[i]
                    con_rowmask[s, r] = 1.0
                    con_approx[s, r] = approx
        con_K[s], con_B[s] = _kb(slots.solref[s], slots.solimp[s])
    is_contact = np.concatenate([np.zeros(L, bool), np.ones(R * S, bool)])
    slot_id = np.concatenate([np.full(L, -1, int), np.repeat(np.arange(S), R)])
    return EfcMeta(
        lim_qadr=m.jnt_qposadr[lim], lim_dadr=m.jnt_dofadr[lim],
        lim_lo=m.jnt_range[lim, 0] if L else np.zeros(0),
        lim_hi=m.jnt_range[lim, 1] if L else np.zeros(0),
        lim_margin=m.jnt_margin[lim] if L else np.zeros(0),
        lim_K=lim_K, lim_B=lim_B,
        lim_solimp=m.jnt_solimp[lim] if L else np.zeros((0, 5)),
        lim_onehot=lim_onehot,
        lim_invw=m.dof_invweight0[m.jnt_dofadr[lim]] if L else np.zeros(0),
        con_maskdiff=con_maskdiff, con_C=con_C, con_rowmask=con_rowmask,
        con_approx=con_approx, con_K=con_K, con_B=con_B,
        con_solimp=np.asarray(slots.solimp), con_margin=np.asarray(slots.margin),
        n_limit=L, n_slots=S, n_rows=R,
        needs_jacr=bool(S and np.any(np.asarray(slots.condim) > 3)),
        is_contact=is_contact, slot_id=slot_id,
    )


def impedance(solimp, r):
    """Vectorized constraint impedance d(r); solimp [..., 5] (static), r [...]."""
    dtype = jnp.result_type(r)
    d0 = jnp.asarray(solimp[..., 0], dtype)
    dmax = jnp.asarray(solimp[..., 1], dtype)
    width = jnp.asarray(solimp[..., 2], dtype)
    mid = jnp.asarray(solimp[..., 3], dtype)
    power = jnp.asarray(solimp[..., 4], dtype)
    x = jnp.clip(jnp.abs(r) / jnp.where(width <= 0, 1.0, width), 0.0, 1.0)
    a = 1.0 / mid ** (power - 1.0)
    b = 1.0 / (1.0 - mid) ** (power - 1.0)
    y = jnp.where(x < mid, a * x**power, 1.0 - b * (1.0 - x) ** power)
    y = jnp.where(width <= 0, 1.0, y)
    return jnp.clip(d0 + y * (dmax - d0), MINIMP, MAXIMP)


def make_efc(
    m: Model,
    meta: EfcMeta,
    com: smooth.ComQuants,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    contacts: Contacts,
) -> Efc:
    dtype = qvel.dtype
    L, S = meta.n_limit, meta.n_slots
    parts_J, parts_R, parts_aref, parts_pos, parts_act, parts_imp = [], [], [], [], [], []

    if L:
        q = qpos[meta.lim_qadr]
        v = qvel[meta.lim_dadr]
        dist_lo = q - jnp.asarray(meta.lim_lo, dtype)
        dist_hi = jnp.asarray(meta.lim_hi, dtype) - q
        lower_closer = dist_lo < dist_hi
        pos = jnp.minimum(dist_lo, dist_hi)
        sign = jnp.where(lower_closer, 1.0, -1.0).astype(dtype)
        J = jnp.asarray(meta.lim_onehot, dtype) * sign[:, None]
        margin = jnp.asarray(meta.lim_margin, dtype)
        r = pos - margin
        imp = impedance(jnp.asarray(meta.lim_solimp), r)
        aref = -jnp.asarray(meta.lim_B, dtype) * (sign * v) - jnp.asarray(meta.lim_K, dtype) * imp * r
        R = (1.0 - imp) / imp * jnp.asarray(meta.lim_invw, dtype)
        active = pos < margin
        parts_J.append(J)
        parts_R.append(jnp.where(active, R, 1.0))
        parts_aref.append(aref * active)
        parts_pos.append(pos)
        parts_act.append(active)
        parts_imp.append(imp)

    if S:
        NR = meta.n_rows
        dof_root = getattr(m, "dof_root_c", None)
        if dof_root is None:
            dof_root = np.maximum(m.body_rootid[m.dof_bodyid], 0)
        origins = com.subtree_com[dof_root]  # [nv,3]
        # point jacobians for every slot: [S, nv, 3]
        jacp = com.cdof[None, :, 3:] + jnp.cross(
            com.cdof[None, :, :3], contacts.pos[:, None, :] - origins[None, :, :]
        )
        maskdiff = jnp.asarray(meta.con_maskdiff, dtype)[:, :, None]
        jacd = maskdiff * jacp
        Jf = jnp.einsum("skb,snb->skn", contacts.frame, jacd)       # [S, 3, nv]
        conC = jnp.asarray(meta.con_C, dtype)
        if meta.needs_jacr:
            # torsional/rolling rows engage the rotational point jacobian
            jacr = maskdiff * com.cdof[None, :, :3]                 # [S, nv, 3]
            Jr = jnp.einsum("skb,snb->skn", contacts.frame, jacr)   # [S, 3, nv]
            Jax = jnp.concatenate([Jf, Jr], axis=1)                 # [S, 6, nv]
            Jrows = jnp.einsum("srk,skn->srn", conC, Jax)           # [S, NR, nv]
        else:
            Jrows = jnp.einsum("srk,skn->srn", conC[:, :, :3], Jf)
        vel = jnp.einsum("srn,n->sr", Jrows, qvel)
        rm = jnp.asarray(meta.con_rowmask, dtype)

        r = contacts.dist - jnp.asarray(meta.con_margin, dtype)
        imp = impedance(jnp.asarray(meta.con_solimp), r)
        aref = (
            -jnp.asarray(meta.con_B, dtype)[:, None] * vel
            - (jnp.asarray(meta.con_K, dtype) * imp * r)[:, None]
        )
        R = ((1.0 - imp) / imp)[:, None] * jnp.asarray(meta.con_approx, dtype)
        active = contacts.active[:, None] & (rm > 0)
        actf = active.astype(dtype)
        parts_J.append((Jrows * actf[:, :, None]).reshape(NR * S, m.nv))
        parts_R.append(jnp.where(active, R, 1.0).reshape(NR * S))
        parts_aref.append((aref * actf).reshape(NR * S))
        parts_pos.append(jnp.broadcast_to(contacts.dist[:, None], (S, NR)).reshape(NR * S))
        parts_act.append(active.reshape(NR * S))
        parts_imp.append(jnp.broadcast_to(imp[:, None], (S, NR)).reshape(NR * S))

    if not parts_J:
        return Efc(
            J=jnp.zeros((0, m.nv), dtype), R=jnp.zeros((0,), dtype),
            aref=jnp.zeros((0,), dtype), pos=jnp.zeros((0,), dtype),
            active=jnp.zeros((0,), bool), imp=jnp.zeros((0,), dtype), meta=meta,
        )
    active = jnp.concatenate(parts_act)
    return Efc(
        J=jnp.concatenate(parts_J) * active.astype(dtype)[:, None],
        R=jnp.concatenate(parts_R),
        aref=jnp.concatenate(parts_aref),
        pos=jnp.concatenate(parts_pos),
        active=active,
        imp=jnp.concatenate(parts_imp),
        meta=meta,
    )
