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

Pyramidal rows per condim-3 contact: [n + mu1 t1, n - mu1 t1, n + mu2 t2,
n - mu2 t2] (row order matches mjData). All rows are statically allocated per
model (fixed shapes for jit/vmap) and masked by activity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ppo_tpu.physics import smooth
from ppo_tpu.physics.collision import Contacts
from ppo_tpu.physics.model import Model

MINIMP, MAXIMP = 0.0001, 0.9999


class Efc(NamedTuple):
    J: jnp.ndarray        # [ne, nv]
    R: jnp.ndarray        # [ne] diagonal regularizer (1/efc_D)
    aref: jnp.ndarray     # [ne]
    pos: jnp.ndarray      # [ne] constraint violation (efc_pos)
    active: jnp.ndarray   # [ne] bool
    imp: jnp.ndarray      # [ne] impedance (debug / parity tests)
    # static row metadata
    is_contact: np.ndarray   # [ne] bool
    slot_id: np.ndarray      # [ne] contact slot index (-1 for limits)


def impedance(solimp, r):
    """Constraint impedance d(r) from the 5-element solimp sigmoid."""
    d0, dmax, width, mid, power = [jnp.asarray(s, jnp.result_type(r)) for s in solimp]
    x = jnp.clip(jnp.abs(r) / jnp.where(width <= 0, 1.0, width), 0.0, 1.0)
    a = 1.0 / mid ** (power - 1.0)
    b = 1.0 / (1.0 - mid) ** (power - 1.0)
    y = jnp.where(x < mid, a * x**power, 1.0 - b * (1.0 - x) ** power)
    y = jnp.where(width <= 0, 1.0, y)
    return jnp.clip(d0 + y * (dmax - d0), MINIMP, MAXIMP)


def kb(solref, solimp):
    """Stiffness/damping from solref: standard (positive) or direct (negative)."""
    timeconst, dampratio = solref
    dmax = solimp[1]
    if timeconst > 0 and dampratio > 0:
        k = 1.0 / (dmax * dmax * timeconst * timeconst * dampratio * dampratio)
        b = 2.0 / (dmax * timeconst)
    else:
        k, b = -timeconst, -dampratio
    return k, b


def make_efc(
    m: Model,
    com: smooth.ComQuants,
    mask: np.ndarray,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    contacts: Contacts,
) -> Efc:
    dtype = qvel.dtype
    rows_J, rows_R, rows_aref, rows_pos, rows_active, rows_imp = [], [], [], [], [], []
    meta_contact, meta_slot = [], []

    # --- joint limit rows (one statically-allocated row per limited joint)
    for j in range(m.njnt):
        if not m.jnt_limited[j]:
            continue
        qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
        lo, hi = m.jnt_range[j]
        dist_lo = qpos[qadr] - lo
        dist_hi = hi - qpos[qadr]
        lower_closer = dist_lo < dist_hi
        pos = jnp.minimum(dist_lo, dist_hi)
        sign = jnp.where(lower_closer, 1.0, -1.0).astype(dtype)
        Jrow = jnp.zeros(m.nv, dtype).at[dadr].set(sign)
        margin = m.jnt_margin[j]
        r = pos - margin
        imp = impedance(m.jnt_solimp[j], r)
        k, b = kb(m.jnt_solref[j], m.jnt_solimp[j])
        vel = sign * qvel[dadr]
        aref = -b * vel - k * imp * r
        R = (1.0 - imp) / imp * m.dof_invweight0[dadr]
        active = pos < margin
        rows_J.append(Jrow)
        rows_R.append(R)
        rows_aref.append(aref)
        rows_pos.append(pos)
        rows_active.append(active)
        rows_imp.append(imp)
        meta_contact.append(False)
        meta_slot.append(-1)

    # --- contact rows
    origins_per_dof = np.maximum(m.body_rootid[m.dof_bodyid], 0)
    for s in range(len(contacts.geom1)):
        b1, b2 = int(contacts.body1[s]), int(contacts.body2[s])
        pos_c = contacts.pos[s]
        frame = contacts.frame[s]           # rows: n, t1, t2
        O = com.subtree_com[origins_per_dof]  # [nv, 3]
        jacp = com.cdof[:, 3:] + jnp.cross(com.cdof[:, :3], pos_c[None, :] - O)
        sel2 = jnp.asarray(mask[b2][:, None], dtype)
        sel1 = jnp.asarray(mask[b1][:, None], dtype)
        Jrel = (sel2 * jacp - sel1 * jacp).T    # [3? no: nv rows] -> (nv,3).T = [3, nv]
        # project onto contact frame: [3, nv]
        Jf = frame @ Jrel

        dist = contacts.dist[s]
        margin = contacts.margin[s]
        r = dist - margin
        imp = impedance(contacts.solimp[s], r)
        k, b = kb(contacts.solref[s], contacts.solimp[s])
        invw = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
        active = contacts.active[s]
        condim = int(contacts.condim[s])
        mu = contacts.friction[s]

        if condim == 1:
            row_dirs = [Jf[0]]
            approx = [invw]
        else:
            row_dirs = [
                Jf[0] + mu[0] * Jf[1],
                Jf[0] - mu[0] * Jf[1],
                Jf[0] + mu[1] * Jf[2],
                Jf[0] - mu[1] * Jf[2],
            ]
            approx = [invw * 2 * mu[i // 2] ** 2 * (1 + mu[i // 2] ** 2) for i in range(4)]
        for Jrow, ap in zip(row_dirs, approx):
            vel = Jrow @ qvel
            aref = -b * vel - k * imp * r
            R = (1.0 - imp) / imp * ap
            rows_J.append(Jrow)
            rows_R.append(R)
            rows_aref.append(aref)
            rows_pos.append(dist)
            rows_active.append(active)
            rows_imp.append(imp)
            meta_contact.append(True)
            meta_slot.append(s)

    if not rows_J:
        return Efc(
            J=jnp.zeros((0, m.nv), dtype), R=jnp.zeros((0,), dtype),
            aref=jnp.zeros((0,), dtype), pos=jnp.zeros((0,), dtype),
            active=jnp.zeros((0,), bool), imp=jnp.zeros((0,), dtype),
            is_contact=np.zeros(0, bool), slot_id=np.zeros(0, int),
        )

    J = jnp.stack(rows_J)
    active = jnp.stack(rows_active)
    actf = active.astype(dtype)
    return Efc(
        J=J * actf[:, None],
        R=jnp.where(active, jnp.stack(rows_R), 1.0),
        aref=jnp.stack(rows_aref) * actf,
        pos=jnp.stack(rows_pos),
        active=active,
        imp=jnp.stack(rows_imp),
        is_contact=np.array(meta_contact, bool),
        slot_id=np.array(meta_slot, int),
    )
