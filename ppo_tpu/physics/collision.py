"""Collision detection: static candidate pairs -> fixed-size masked contact set.

Narrowphase colliders for the plane/sphere/capsule subset (all four locomotion
models). The candidate pair list (contype/conaffinity + parent-weld filtering)
is computed at model-build time; at trace time all candidates are evaluated in
a handful of *vectorized* batches (one per collider type), producing fixed-size
arrays friendly to jit/vmap with a compact XLA graph. Contact frame convention
matches MuJoCo (normal points geom1->geom2; mju_makeFrame tangents, and the
plane-capsule axis-projected frame) so contacts diff directly in tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ppo_tpu.physics.model import Model
from ppo_tpu.physics.types import CAPSULE, PLANE, SPHERE


class ContactSlots(NamedTuple):
    """Static (numpy) slot table: one row per potential contact point."""

    geom1: np.ndarray
    geom2: np.ndarray
    body1: np.ndarray
    body2: np.ndarray
    point: np.ndarray        # capsule end selector for plane-capsule (+-1), else 0
    kind: np.ndarray         # collider kind id per slot
    includemargin: np.ndarray
    margin: np.ndarray
    condim: np.ndarray
    friction: np.ndarray     # [S, 2] tangential frictions (sliding, sliding)
    solref: np.ndarray       # [S, 2]
    solimp: np.ndarray       # [S, 5]
    size1: np.ndarray        # [S, 3]
    size2: np.ndarray        # [S, 3]


class Contacts(NamedTuple):
    """Fixed-size contact arrays; rows beyond `active` are masked out."""

    dist: jnp.ndarray      # [S]
    pos: jnp.ndarray       # [S, 3]
    frame: jnp.ndarray     # [S, 3, 3] rows: normal, tangent1, tangent2
    active: jnp.ndarray    # [S] bool
    slots: ContactSlots

    # convenience passthroughs used elsewhere
    @property
    def geom1(self):
        return self.slots.geom1

    @property
    def geom2(self):
        return self.slots.geom2

    @property
    def body1(self):
        return self.slots.body1

    @property
    def body2(self):
        return self.slots.body2

    @property
    def friction(self):
        return self.slots.friction

    @property
    def condim(self):
        return self.slots.condim

    @property
    def margin(self):
        return self.slots.margin

    @property
    def solref(self):
        return self.slots.solref

    @property
    def solimp(self):
        return self.slots.solimp


# collider kinds
K_PLANE_SPHERE, K_PLANE_CAPSULE, K_SPHERE_SPHERE, K_SPHERE_CAPSULE, K_CAPSULE_CAPSULE = range(5)

_KIND = {
    (PLANE, SPHERE): K_PLANE_SPHERE,
    (PLANE, CAPSULE): K_PLANE_CAPSULE,
    (SPHERE, SPHERE): K_SPHERE_SPHERE,
    (SPHERE, CAPSULE): K_SPHERE_CAPSULE,
    (CAPSULE, CAPSULE): K_CAPSULE_CAPSULE,
}


def _mix_params(m: Model, g1: int, g2: int):
    """MuJoCo contact parameter mixing (equal priority, solmix weighting)."""
    s1, s2 = m.geom_solmix[g1], m.geom_solmix[g2]
    mix = s1 / (s1 + s2) if (s1 + s2) > 0 else 0.5
    condim = max(m.geom_condim[g1], m.geom_condim[g2])
    friction = np.maximum(m.geom_friction[g1], m.geom_friction[g2])
    solref = mix * m.geom_solref[g1] + (1 - mix) * m.geom_solref[g2]
    solimp = mix * m.geom_solimp[g1] + (1 - mix) * m.geom_solimp[g2]
    # margins/gaps ADD across the pair (verified empirically: includemargin =
    # margin1 + margin2 for a pair with margins 0.005/0.002)
    margin = m.geom_margin[g1] + m.geom_margin[g2]
    gap = m.geom_gap[g1] + m.geom_gap[g2]
    return condim, friction, solref, solimp, margin, gap


def contact_slots(m: Model) -> ContactSlots:
    rows = []
    for (t1, t2), pairs in sorted(m.collision_pairs.items()):
        kind = _KIND[(t1, t2)]
        for g1, g2 in pairs:
            condim, friction, solref, solimp, margin, gap = _mix_params(m, g1, g2)
            points = (1.0, -1.0) if kind == K_PLANE_CAPSULE else (0.0,)
            for pt in points:
                rows.append(
                    (g1, g2, m.geom_bodyid[g1], m.geom_bodyid[g2], pt, kind,
                     margin - gap, margin, condim, (friction[0], friction[0]),
                     tuple(solref), tuple(solimp), tuple(m.geom_size[g1]), tuple(m.geom_size[g2]))
                )
    if not rows:
        z = np.zeros(0)
        return ContactSlots(*(z.astype(int),) * 4, z, z.astype(int), z, z, z.astype(int),
                            np.zeros((0, 2)), np.zeros((0, 2)), np.zeros((0, 5)),
                            np.zeros((0, 3)), np.zeros((0, 3)))
    cols = list(zip(*rows))
    return ContactSlots(
        geom1=np.array(cols[0], int), geom2=np.array(cols[1], int),
        body1=np.array(cols[2], int), body2=np.array(cols[3], int),
        point=np.array(cols[4]), kind=np.array(cols[5], int),
        includemargin=np.array(cols[6]), margin=np.array(cols[7]),
        condim=np.array(cols[8], int), friction=np.array(cols[9]),
        solref=np.array(cols[10]), solimp=np.array(cols[11]),
        size1=np.array(cols[12]), size2=np.array(cols[13]),
    )


def make_frame(n):
    """mju_makeFrame tangents for unit normals n [..., 3] (verified
    empirically): t2 = normalize((n_y, -n_x, 0)), t1 = cross(t2, n); for
    n ~ +-z the fallback is t1 = (0, 1, 0), t2 = cross(n, t1)."""
    dtype = n.dtype
    degenerate = (jnp.abs(n[..., 0]) < 1e-10) & (jnp.abs(n[..., 1]) < 1e-10)
    zt = jnp.stack([n[..., 1], -n[..., 0], jnp.zeros_like(n[..., 0])], -1)
    zt = zt / jnp.maximum(jnp.linalg.norm(zt, axis=-1, keepdims=True), 1e-30)
    t1_nd = jnp.cross(zt, n)
    t1_d = jnp.zeros_like(n).at[..., 1].set(1.0)
    deg = degenerate[..., None]
    t1 = jnp.where(deg, t1_d, t1_nd)
    t2 = jnp.where(deg, jnp.cross(n, t1_d), zt)
    return jnp.stack([n, t1, t2], axis=-2)


def _plane_capsule_frame(n, axis):
    """mjc_PlaneCapsule frame: t1 = capsule axis projected onto the plane
    (zero projection falls back to (1,0,0) like mju_normalize3), t2 = n x t1."""
    dtype = n.dtype
    vec = axis - n * jnp.sum(n * axis, -1, keepdims=True)
    norm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    fallback = jnp.zeros_like(n).at[..., 0].set(1.0)
    t1 = jnp.where(norm < 1e-14, fallback, vec / jnp.maximum(norm, 1e-30))
    return jnp.stack([n, t1, jnp.cross(n, t1)], axis=-2)


def _sphere_sphere(p1, r1, p2, r2):
    """Vectorized: (dist, pos, normal geom1->geom2) for center/radius arrays."""
    d = p2 - p1
    L = jnp.linalg.norm(d, axis=-1, keepdims=True)
    up = jnp.zeros_like(d).at[..., 2].set(1.0)
    n = jnp.where(L < 1e-12, up, d / jnp.maximum(L, 1e-12))
    dist = L[..., 0] - (r1 + r2)
    pos = p1 + n * (r1 + 0.5 * dist)[..., None]
    return dist, pos, n


def collide(m: Model, geom_xpos, geom_xmat, slots: ContactSlots | None = None, kind_masks: dict | None = None) -> Contacts:
    """Evaluate all contact slots vectorized per collider kind."""
    if slots is None:
        slots = contact_slots(m)
    dtype = geom_xpos.dtype
    S = len(slots.geom1)
    if S == 0:
        return Contacts(
            dist=jnp.zeros((0,), dtype), pos=jnp.zeros((0, 3), dtype),
            frame=jnp.zeros((0, 3, 3), dtype), active=jnp.zeros((0,), bool),
            slots=slots,
        )
    p1 = geom_xpos[slots.geom1]          # [S, 3]
    p2 = geom_xpos[slots.geom2]
    R1 = geom_xmat[slots.geom1]          # [S, 3, 3]
    R2 = geom_xmat[slots.geom2]
    r1 = jnp.asarray(slots.size1[:, 0], dtype)
    r2 = jnp.asarray(slots.size2[:, 0], dtype)
    hl1 = jnp.asarray(slots.size1[:, 1], dtype)
    hl2 = jnp.asarray(slots.size2[:, 1], dtype)
    axis1 = R1[:, :, 2]
    axis2 = R2[:, :, 2]
    kind = slots.kind
    point = jnp.asarray(slots.point, dtype)

    # --- reduce every collider to a sphere-sphere test with per-kind centers.
    if kind_masks is None:
        kind_masks = {
            "is_plane": (kind == K_PLANE_SPHERE) | (kind == K_PLANE_CAPSULE),
            "is_pc": kind == K_PLANE_CAPSULE,
            "is_sc": kind == K_SPHERE_CAPSULE,
            "is_cc": kind == K_CAPSULE_CAPSULE,
        }
    is_plane = kind_masks["is_plane"]

    # geom2 center: capsule-end for plane-capsule, clamped segment point for
    # (sphere|capsule)-capsule, plain center otherwise
    c2 = p2
    c2 = jnp.where(
        kind_masks["is_pc"][:, None], p2 + (point * hl2)[:, None] * axis2, c2
    )
    # sphere-capsule: closest point on capsule 2's segment to sphere 1 center
    t_sc = jnp.clip(jnp.sum((p1 - p2) * axis2, -1), -hl2, hl2)
    c2 = jnp.where(kind_masks["is_sc"][:, None], p2 + t_sc[:, None] * axis2, c2)

    # capsule-capsule: segment-segment closest points (well-defined everywhere,
    # harmless for other kinds)
    r = p1 - p2
    a = jnp.sum(axis1 * axis1, -1)
    e = jnp.sum(axis2 * axis2, -1)
    bb = jnp.sum(axis1 * axis2, -1)
    c = jnp.sum(axis1 * r, -1)
    f = jnp.sum(axis2 * r, -1)
    denom = a * e - bb * bb
    s_par = jnp.where(jnp.abs(denom) > 1e-12, (bb * f - c * e) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0), 0.0)
    s_par = jnp.clip(s_par, -hl1, hl1)
    t_par = jnp.clip((bb * s_par + f) / jnp.maximum(e, 1e-12), -hl2, hl2)
    s_par = jnp.clip((bb * t_par - c) / jnp.maximum(a, 1e-12), -hl1, hl1)
    cc1 = p1 + s_par[:, None] * axis1
    cc2 = p2 + t_par[:, None] * axis2
    is_cc = kind_masks["is_cc"]
    c1 = jnp.where(is_cc[:, None], cc1, p1)
    c2 = jnp.where(is_cc[:, None], cc2, c2)

    # sphere-sphere narrowphase on the reduced centers
    dist_ss, pos_ss, n_ss = _sphere_sphere(c1, r1, c2, r2)

    # plane narrowphase
    n_pl = R1[:, :, 2]
    cdist = jnp.sum(n_pl * (c2 - p1), -1)
    dist_pl = cdist - r2
    pos_pl = c2 - n_pl * (r2 + 0.5 * dist_pl)[:, None]

    dist = jnp.where(is_plane, dist_pl, dist_ss)
    pos = jnp.where(is_plane[:, None], pos_pl, pos_ss)
    n = jnp.where(is_plane[:, None], n_pl, n_ss)

    frame = jnp.where(
        kind_masks["is_pc"][:, None, None],
        _plane_capsule_frame(n, axis2),
        make_frame(n),
    )
    active = dist < jnp.asarray(slots.includemargin, dtype)
    return Contacts(dist=dist, pos=pos, frame=frame, active=active, slots=slots)
