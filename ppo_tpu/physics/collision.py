"""Collision detection: static candidate pairs -> fixed-size masked contact set.

Narrowphase colliders for the plane/sphere/capsule subset (all four locomotion
models). The candidate pair list (contype/conaffinity + parent-weld filtering)
is computed at model-build time; at trace time every candidate is evaluated and
masked by `dist < includemargin`, producing fixed-size arrays friendly to
jit/vmap. Contact frame convention matches MuJoCo (normal points geom1->geom2,
tangents from mju_makeFrame) so contacts diff directly in tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ppo_tpu.physics.model import Model
from ppo_tpu.physics.types import CAPSULE, PLANE, SPHERE


class Contacts(NamedTuple):
    """Fixed-size contact arrays; rows beyond `active` are masked out."""

    dist: jnp.ndarray      # [ncon]
    pos: jnp.ndarray       # [ncon, 3]
    frame: jnp.ndarray     # [ncon, 3, 3] rows: normal, tangent1, tangent2
    active: jnp.ndarray    # [ncon] bool
    # static per-slot metadata (numpy, identical across batch)
    geom1: np.ndarray
    geom2: np.ndarray
    body1: np.ndarray
    body2: np.ndarray
    includemargin: np.ndarray
    margin: np.ndarray
    condim: np.ndarray
    friction: np.ndarray   # [ncon, 2] tangential frictions
    solref: np.ndarray     # [ncon, 2]
    solimp: np.ndarray     # [ncon, 5]


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


def contact_slots(m: Model):
    """Static contact slot table: one row per potential contact point."""
    slots = []
    for (t1, t2), pairs in sorted(m.collision_pairs.items()):
        for g1, g2 in pairs:
            n_points = 2 if (t1 == PLANE and t2 == CAPSULE) else 1
            condim, friction, solref, solimp, margin, gap = _mix_params(m, g1, g2)
            for k in range(n_points):
                slots.append(
                    dict(
                        g1=g1, g2=g2, t1=t1, t2=t2, point=k,
                        b1=m.geom_bodyid[g1], b2=m.geom_bodyid[g2],
                        condim=condim, friction=friction, solref=solref,
                        solimp=solimp, margin=margin, includemargin=margin - gap,
                    )
                )
    return slots


def make_frame(n):
    """mju_makeFrame tangents for unit normal n (verified empirically):
    t2 = normalize((n_y, -n_x, 0)), t1 = cross(t2, n); for n ~ +-z the
    fallback is t1 = (0, 1, 0), t2 = cross(n, t1)."""
    dtype = n.dtype
    degenerate = (jnp.abs(n[0]) < 1e-10) & (jnp.abs(n[1]) < 1e-10)
    zt = jnp.stack([n[1], -n[0], jnp.zeros((), dtype)])
    zt = zt / jnp.maximum(jnp.linalg.norm(zt), 1e-30)
    t1_nd = jnp.cross(zt, n)
    t1_d = jnp.asarray([0.0, 1.0, 0.0], dtype)
    t1 = jnp.where(degenerate, t1_d, t1_nd)
    t2 = jnp.where(degenerate, jnp.cross(n, t1_d), zt)
    return jnp.stack([n, t1, t2])


def plane_capsule_frame(n, axis):
    """mjc_PlaneCapsule frame: t1 = capsule axis projected on the plane
    (zero-projection falls back to (1,0,0) like mju_normalize3), t2 = n x t1."""
    dtype = n.dtype
    vec = axis - n * jnp.dot(n, axis)
    norm = jnp.linalg.norm(vec)
    t1 = jnp.where(norm < 1e-14, jnp.asarray([1.0, 0.0, 0.0], dtype), vec / jnp.maximum(norm, 1e-30))
    return jnp.stack([n, t1, jnp.cross(n, t1)])


def _sphere_sphere(p1, r1, p2, r2):
    """Returns (dist, pos, normal). Normal points from sphere1 to sphere2."""
    d = p2 - p1
    L = jnp.linalg.norm(d)
    n = jnp.where(L < 1e-12, jnp.asarray([0.0, 0.0, 1.0], d.dtype), d / jnp.maximum(L, 1e-12))
    dist = L - (r1 + r2)
    pos = p1 + n * (r1 + 0.5 * dist)
    return dist, pos, n


def _seg_seg_closest(p1, d1, hl1, p2, d2, hl2):
    """Closest points between segments p +- hl*d (unit dirs). Returns (c1, c2)."""
    r = p1 - p2
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    b = jnp.dot(d1, d2)
    c = jnp.dot(d1, r)
    f = jnp.dot(d2, r)
    denom = a * e - b * b
    # parallel-safe: fall back to s=0 when denom ~ 0
    s = jnp.where(jnp.abs(denom) > 1e-12, (b * f - c * e) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0), 0.0)
    s = jnp.clip(s, -hl1, hl1)
    t = (b * s + f) / e
    t = jnp.clip(t, -hl2, hl2)
    s = jnp.clip((b * t - c) / a, -hl1, hl1)
    return p1 + s * d1, p2 + t * d2


def narrowphase(m: Model, slot, geom_xpos, geom_xmat):
    """dist/pos/normal for one contact slot. Normal points geom1 -> geom2."""
    g1, g2, t1, t2 = slot["g1"], slot["g2"], slot["t1"], slot["t2"]
    p1, R1 = geom_xpos[g1], geom_xmat[g1]
    p2, R2 = geom_xpos[g2], geom_xmat[g2]
    dtype = p1.dtype
    size1 = np.asarray(m.geom_size[g1])
    size2 = np.asarray(m.geom_size[g2])

    if t1 == PLANE:
        n = R1[:, 2]
        if t2 == SPHERE:
            center, r = p2, size2[0]
        else:  # CAPSULE endpoint sphere (slot["point"] selects the end)
            axis = R2[:, 2]
            sign = 1.0 if slot["point"] == 0 else -1.0
            center = p2 + sign * size2[1] * axis
            r = size2[0]
        cdist = jnp.dot(n, center - p1)
        dist = cdist - r
        pos = center - n * (r + 0.5 * dist)
        return dist, pos, n

    if t1 == SPHERE and t2 == SPHERE:
        return _sphere_sphere(p1, size1[0], p2, size2[0])

    if t1 == SPHERE and t2 == CAPSULE:
        axis = R2[:, 2]
        t = jnp.clip(jnp.dot(p1 - p2, axis), -size2[1], size2[1])
        return _sphere_sphere(p1, size1[0], p2 + t * axis, size2[0])

    if t1 == CAPSULE and t2 == CAPSULE:
        c1, c2 = _seg_seg_closest(p1, R1[:, 2], size1[1], p2, R2[:, 2], size2[1])
        return _sphere_sphere(c1, size1[0], c2, size2[0])

    raise NotImplementedError(f"collider {t1}-{t2}")


def collide(m: Model, geom_xpos, geom_xmat, slots=None) -> Contacts:
    """Evaluate all contact slots; mask by includemargin."""
    if slots is None:
        slots = contact_slots(m)
    dtype = geom_xpos.dtype
    if not slots:
        z3 = jnp.zeros((0, 3), dtype)
        return Contacts(
            dist=jnp.zeros((0,), dtype), pos=z3, frame=jnp.zeros((0, 3, 3), dtype),
            active=jnp.zeros((0,), bool),
            geom1=np.zeros(0, int), geom2=np.zeros(0, int),
            body1=np.zeros(0, int), body2=np.zeros(0, int),
            includemargin=np.zeros(0), margin=np.zeros(0), condim=np.zeros(0, int),
            friction=np.zeros((0, 2)), solref=np.zeros((0, 2)), solimp=np.zeros((0, 5)),
        )
    dists, poss, frames = [], [], []
    for slot in slots:
        dist, pos, n = narrowphase(m, slot, geom_xpos, geom_xmat)
        dists.append(dist)
        poss.append(pos)
        if slot["t1"] == PLANE and slot["t2"] == CAPSULE:
            frames.append(plane_capsule_frame(n, geom_xmat[slot["g2"]][:, 2]))
        else:
            frames.append(make_frame(n))
    dist = jnp.stack(dists)
    includemargin = np.array([s["includemargin"] for s in slots])
    return Contacts(
        dist=dist,
        pos=jnp.stack(poss),
        frame=jnp.stack(frames),
        active=dist < jnp.asarray(includemargin, dtype),
        geom1=np.array([s["g1"] for s in slots], int),
        geom2=np.array([s["g2"] for s in slots], int),
        body1=np.array([s["b1"] for s in slots], int),
        body2=np.array([s["b2"] for s in slots], int),
        includemargin=includemargin,
        margin=np.array([s["margin"] for s in slots]),
        condim=np.array([s["condim"] for s in slots], int),
        # both tangential directions use the sliding friction coefficient
        friction=np.array([[s["friction"][0], s["friction"][0]] for s in slots]),
        solref=np.array([s["solref"] for s in slots]),
        solimp=np.array([s["solimp"] for s in slots]),
    )
