"""Collision detection: static candidate pairs -> fixed-size masked contact set.

Narrowphase colliders for the plane/sphere/capsule/box subset (the four
locomotion models use plane/sphere/capsule; box extends the MJCF subset). The
candidate pair list (contype/conaffinity + parent-weld filtering) is computed
at model-build time; at trace time all candidates are evaluated in a handful
of *vectorized* batches (one per collider type), producing fixed-size arrays
friendly to jit/vmap with a compact XLA graph. Contact frame convention
matches MuJoCo (normal points geom1->geom2; mju_makeFrame tangents, and the
plane-capsule axis-projected frame) so contacts diff directly in tests.

Box slot layouts (all verified against mujoco's contact sets):
  plane-box   8 corner slots; active = support-side corner (local corner dot
              plane normal < 0, the rule that drops the top corners of a thin
              box even inside the margin) and dist < margin
  sphere-box  1 slot; clamped-closest-point test, with MuJoCo's deep-center
              branch (dist = -(r + nearest-face depth), face normal)
  capsule-box 3 slots: sphere-box probes at both endpoints plus at the
              interior segment point closest to the box (found by a fixed
              ternary search); the interior slot is suppressed unless strictly
              closer than both endpoint probes (matching mujoco's 2-contact
              behavior for face-parallel and edge-crossing capsules)
  box-box     8 slots: SAT over 15 axes; face-face contacts by clipping the
              incident face against the reference face (Sutherland-Hodgman,
              <= 8 points), single edge-edge contact otherwise
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ppo_tpu.physics.model import Model
from ppo_tpu.physics.types import BOX, CAPSULE, PLANE, SPHERE


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
    friction: np.ndarray     # [S, 5] contact frictions [slide, slide, torsion, roll, roll]
    solref: np.ndarray       # [S, 2]
    solimp: np.ndarray       # [S, 5]
    size1: np.ndarray        # [S, 3]
    size2: np.ndarray        # [S, 3]
    corner: np.ndarray       # [S, 3] box corner signs (plane-box) / clip slot id (box-box)


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
(K_PLANE_SPHERE, K_PLANE_CAPSULE, K_SPHERE_SPHERE, K_SPHERE_CAPSULE,
 K_CAPSULE_CAPSULE, K_PLANE_BOX, K_SPHERE_BOX, K_CAPSULE_BOX, K_BOX_BOX) = range(9)

_KIND = {
    (PLANE, SPHERE): K_PLANE_SPHERE,
    (PLANE, CAPSULE): K_PLANE_CAPSULE,
    (SPHERE, SPHERE): K_SPHERE_SPHERE,
    (SPHERE, CAPSULE): K_SPHERE_CAPSULE,
    (CAPSULE, CAPSULE): K_CAPSULE_CAPSULE,
    (PLANE, BOX): K_PLANE_BOX,
    (SPHERE, BOX): K_SPHERE_BOX,
    (CAPSULE, BOX): K_CAPSULE_BOX,
    (BOX, BOX): K_BOX_BOX,
}

# per-kind slot multiplicity: (count, point selectors, corner signs)
_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)]
)

KIND_MASK_NAMES = (
    "is_plane", "is_pc", "is_sc", "is_cc", "is_pb", "is_sb", "is_cb", "is_bb",
)


def make_kind_masks(kind: np.ndarray) -> dict:
    return {
        "is_plane": (kind == K_PLANE_SPHERE) | (kind == K_PLANE_CAPSULE),
        "is_pc": kind == K_PLANE_CAPSULE,
        "is_sc": kind == K_SPHERE_CAPSULE,
        "is_cc": kind == K_CAPSULE_CAPSULE,
        "is_pb": kind == K_PLANE_BOX,
        "is_sb": kind == K_SPHERE_BOX,
        "is_cb": kind == K_CAPSULE_BOX,
        "is_bb": kind == K_BOX_BOX,
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


def _slot_layout(kind):
    """(point, corner) per slot of a candidate pair of this collider kind."""
    if kind == K_PLANE_CAPSULE:
        return [(1.0, np.zeros(3)), (-1.0, np.zeros(3))]
    if kind == K_PLANE_BOX:
        return [(0.0, c) for c in _CORNERS]
    if kind == K_CAPSULE_BOX:
        # endpoint probes, then the interior closest-point probe
        return [(1.0, np.zeros(3)), (-1.0, np.zeros(3)), (0.0, np.zeros(3))]
    if kind == K_BOX_BOX:
        # 8 clip-polygon slots; corner[0] carries the slot's clip-vertex index
        return [(0.0, np.array([float(i), 0.0, 0.0])) for i in range(8)]
    return [(0.0, np.zeros(3))]


def contact_slots(m: Model) -> ContactSlots:
    rows = []
    for (t1, t2), pairs in sorted(m.collision_pairs.items()):
        kind = _KIND[(t1, t2)]
        for g1, g2 in pairs:
            condim, friction, solref, solimp, margin, gap = _mix_params(m, g1, g2)
            for pt, corner in _slot_layout(kind):
                rows.append(
                    (g1, g2, m.geom_bodyid[g1], m.geom_bodyid[g2], pt, kind,
                     margin - gap, margin, condim,
                     (friction[0], friction[0], friction[1], friction[2], friction[2]),
                     tuple(solref), tuple(solimp), tuple(m.geom_size[g1]),
                     tuple(m.geom_size[g2]), tuple(corner))
                )
    if not rows:
        z = np.zeros(0)
        return ContactSlots(*(z.astype(int),) * 4, z, z.astype(int), z, z, z.astype(int),
                            np.zeros((0, 5)), np.zeros((0, 2)), np.zeros((0, 5)),
                            np.zeros((0, 3)), np.zeros((0, 3)), np.zeros((0, 3)))
    cols = list(zip(*rows))
    return ContactSlots(
        geom1=np.array(cols[0], int), geom2=np.array(cols[1], int),
        body1=np.array(cols[2], int), body2=np.array(cols[3], int),
        point=np.array(cols[4]), kind=np.array(cols[5], int),
        includemargin=np.array(cols[6]), margin=np.array(cols[7]),
        condim=np.array(cols[8], int), friction=np.array(cols[9]),
        solref=np.array(cols[10]), solimp=np.array(cols[11]),
        size1=np.array(cols[12]), size2=np.array(cols[13]),
        corner=np.array(cols[14]),
    )


def make_frame(n):
    """mju_makeFrame tangents for unit normals n [..., 3] (rule verified
    against mujoco on 200 random contact normals): pick the helper axis
    tmp = (0,1,0) if |n_y| < 0.5 else (0,0,1), then
    t1 = normalize(tmp - (tmp . n) n), t2 = n x t1."""
    use_y = jnp.abs(n[..., 1]) < 0.5
    zero = jnp.zeros_like(n[..., 0])
    one = jnp.ones_like(n[..., 0])
    tmp = jnp.stack([zero, jnp.where(use_y, one, zero), jnp.where(use_y, zero, one)], -1)
    t1 = tmp - jnp.sum(tmp * n, -1, keepdims=True) * n
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-30)
    return jnp.stack([n, t1, jnp.cross(n, t1)], axis=-2)


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
        kind_masks = make_kind_masks(kind)
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

    # --- box narrowphase (compiled only for models with box pairs; `kind`
    # is always static numpy even when other slot columns are traced)
    extra = None
    if np.any(kind >= K_PLANE_BOX):
        dist, pos, n, extra = _box_narrowphase(
            slots, kind, kind_masks, dist, pos, n,
            p1, p2, R1, R2, r1, hl1, axis1, dtype,
        )

    frame = jnp.where(
        kind_masks["is_pc"][:, None, None],
        _plane_capsule_frame(n, axis2),
        make_frame(n),
    )
    active = dist < jnp.asarray(slots.includemargin, dtype)
    if extra is not None:
        active = active & extra
    return Contacts(dist=dist, pos=pos, frame=frame, active=active, slots=slots)


def _sphere_box_local(cl, r, size):
    """Sphere (local center cl [S,3], radius r [S]) vs box (half-sizes [S,3]):
    (dist, local normal box->sphere), including MuJoCo's deep-center branch
    (center inside: dist = -(r + nearest-face depth), face normal)."""
    clamped = jnp.clip(cl, -size, size)
    delta = cl - clamped
    dn = jnp.linalg.norm(delta, axis=-1)
    inside = dn < 1e-12
    n_out = delta / jnp.maximum(dn, 1e-12)[..., None]
    depth = size - jnp.abs(cl)                       # >= 0 when inside
    k = jnp.argmin(depth, axis=-1)
    dmin = jnp.take_along_axis(depth, k[..., None], -1)[..., 0]
    onehot = jax.nn.one_hot(k, 3, dtype=cl.dtype)
    n_in = onehot * jnp.sign(jnp.take_along_axis(cl, k[..., None], -1))
    dist = jnp.where(inside, -(r + dmin), dn - r)
    nloc = jnp.where(inside[..., None], n_in, n_out)
    return dist, nloc


def _box_narrowphase(slots, kind, km, dist, pos, n, p1, p2, R1, R2, r1, hl1, axis1, dtype):
    """plane-box / sphere-box / capsule-box slot evaluation (box is geom2)."""
    S = len(kind)
    size2 = jnp.asarray(slots.size2, dtype)
    corner = jnp.asarray(slots.corner, dtype)
    extra = jnp.ones((S,), bool)

    if np.any(kind == K_PLANE_BOX):
        mask = km["is_pb"]
        n_pl = R1[:, :, 2]
        cw = p2 + jnp.einsum("sij,sj->si", R2, corner * size2)     # corner world
        dist_pb = jnp.sum(n_pl * (cw - p1), -1)
        pos_pb = cw - 0.5 * dist_pb[:, None] * n_pl
        nl = jnp.einsum("sij,si->sj", R2, n_pl)                    # plane normal, box frame
        support = jnp.sum(corner * size2 * nl, -1) < 0             # drops top-side corners
        dist = jnp.where(mask, dist_pb, dist)
        pos = jnp.where(mask[:, None], pos_pb, pos)
        n = jnp.where(mask[:, None], n_pl, n)
        extra = extra & (~mask | support)

    if np.any(kind == K_SPHERE_BOX):
        mask = km["is_sb"]
        cl = jnp.einsum("sij,si->sj", R2, p1 - p2)                 # sphere center, box frame
        d_sb, nloc = _sphere_box_local(cl, r1, size2)
        n_sb = -jnp.einsum("sij,sj->si", R2, nloc)                 # geom1 -> geom2
        pos_sb = p1 + n_sb * (r1 + 0.5 * d_sb)[:, None]
        dist = jnp.where(mask, d_sb, dist)
        pos = jnp.where(mask[:, None], pos_sb, pos)
        n = jnp.where(mask[:, None], n_sb, n)

    if np.any(kind == K_CAPSULE_BOX):
        mask = km["is_cb"]
        point = jnp.asarray(slots.point, dtype)
        a = jnp.einsum("sij,si->sj", R2, p1 - p2)                  # segment center, box frame
        u = jnp.einsum("sij,si->sj", R2, axis1)                    # segment axis, box frame

        def g(t):  # signed center distance to box surface at segment param t
            c = a + t[:, None] * u
            clamped = jnp.clip(c, -size2, size2)
            dn = jnp.linalg.norm(c - clamped, axis=-1)
            depth = jnp.min(size2 - jnp.abs(c), axis=-1)
            return jnp.where(dn < 1e-12, -depth, dn)

        # ternary search for the interior minimum (signed distance to a convex
        # set along a line is convex outside; inside-penetration cases are
        # still located well enough for the probe point)
        def shrink(carry, _):
            lo, hi = carry
            m1 = lo + (hi - lo) / 3.0
            m2 = hi - (hi - lo) / 3.0
            left = g(m1) < g(m2)
            return (jnp.where(left, lo, m1), jnp.where(left, m2, hi)), None

        (lo, hi), _ = jax.lax.scan(shrink, (-hl1, hl1), None, length=28)
        tstar = 0.5 * (lo + hi)
        g_lo, g_hi, g_star = g(-hl1), g(hl1), g(tstar)

        t_sel = jnp.where(point != 0, point * hl1, tstar)
        cl = a + t_sel[:, None] * u
        d_cb, nloc = _sphere_box_local(cl, r1, size2)
        n_cb = -jnp.einsum("sij,sj->si", R2, nloc)
        pos_cb = (p1 + t_sel[:, None] * axis1) + n_cb * (r1 + 0.5 * d_cb)[:, None]
        # the interior slot only fires when strictly closer than both endpoint
        # probes (mujoco emits the two endpoint contacts for face-parallel and
        # edge-crossing capsules, one interior contact otherwise)
        interior_ok = (
            (g_star < jnp.minimum(g_lo, g_hi) - 1e-9)
            & (jnp.abs(tstar) < hl1 * (1.0 - 1e-6))
        )
        dist = jnp.where(mask, d_cb, dist)
        pos = jnp.where(mask[:, None], pos_cb, pos)
        n = jnp.where(mask[:, None], n_cb, n)
        extra = extra & (~(mask & (point == 0)) | interior_ok)

    if np.any(kind == K_BOX_BOX):
        dist, pos, n, extra = _box_box(slots, km["is_bb"], dist, pos, n, extra,
                                       p1, p2, R1, R2, size2, corner, dtype)

    return dist, pos, n, extra


def _box_box(slots, mask, dist, pos, n, extra, p1, p2, R1, R2, size2, corner, dtype):
    """Box-box via SAT (6 face + 9 edge axes, ODE's 1.05 face bias) and
    incident-face clipping in reference-face 2D coordinates. Each candidate
    pair occupies 8 slots; slot i takes the i-th deepest clip point (the
    single edge-edge contact occupies slot 0). Behaviorally validated against
    mujoco (resting stacks, drop trajectories) rather than row-exact."""
    size1 = jnp.asarray(slots.size1, dtype)
    slot_idx = jnp.asarray(slots.corner, dtype)[:, 0].astype(jnp.int32)
    eps = 1e-12

    C = jnp.einsum("sji,sjk->sik", R1, R2)            # box2 axes in box1 frame
    AC = jnp.abs(C) + 1e-9                            # ODE's fudge2 keeps edges stable
    t = jnp.einsum("sji,sj->si", R1, p2 - p1)         # box2 center in box1 frame
    t2 = jnp.einsum("sik,si->sk", C, t)               # box1 center in box2 frame (negated proj)

    # face-axis overlaps (positive = penetrating)
    o1 = size1 + jnp.einsum("skj,sj->sk", AC, size2) - jnp.abs(t)     # box1 axes [S,3]
    o2 = size2 + jnp.einsum("sjk,sj->sk", AC, size1) - jnp.abs(t2)    # box2 axes [S,3]
    face_o = jnp.concatenate([o1, o2], -1)            # [S, 6]
    best_face = jnp.argmin(face_o, -1)
    best_face_o = jnp.min(face_o, -1)

    # edge-axis overlaps: L = e_i x c_j (box1 frame)
    def edge_overlap(i, j):
        i1, i2 = (i + 1) % 3, (i + 2) % 3
        j1, j2 = (j + 1) % 3, (j + 2) % 3
        s_proj = jnp.abs(t[:, i2] * C[:, i1, j] - t[:, i1] * C[:, i2, j])
        r1e = size1[:, i1] * AC[:, i2, j] + size1[:, i2] * AC[:, i1, j]
        r2e = size2[:, j1] * AC[:, i, j2] + size2[:, j2] * AC[:, i, j1]
        ln = jnp.sqrt(C[:, i1, j] ** 2 + C[:, i2, j] ** 2)
        o = (r1e + r2e - s_proj) / jnp.maximum(ln, eps)
        return jnp.where(ln > 1e-6, o, jnp.inf)       # parallel edges: no axis

    edge_os = jnp.stack([edge_overlap(i, j) for i in range(3) for j in range(3)], -1)
    best_edge = jnp.argmin(edge_os, -1)
    best_edge_o = jnp.min(edge_os, -1)

    margin = jnp.asarray(slots.includemargin, dtype)
    touching = (jnp.min(face_o, -1) > -margin) & (best_edge_o > -margin)
    use_edge = best_edge_o * 1.05 < best_face_o       # ODE face preference

    # ---- face case: reference face on box1 (ref1) or box2
    ref1 = best_face < 3
    k = jnp.where(ref1, best_face, best_face - 3)     # ref axis index
    Rr = jnp.where(ref1[:, None, None], R1, R2)       # ref box rotation
    Ri = jnp.where(ref1[:, None, None], R2, R1)       # incident box rotation
    pr = jnp.where(ref1[:, None], p1, p2)
    pi = jnp.where(ref1[:, None], p2, p1)
    sr = jnp.where(ref1[:, None], size1, size2)
    si = jnp.where(ref1[:, None], size2, size1)
    tk = jnp.where(ref1, jnp.take_along_axis(t, k[:, None], -1)[:, 0],
                   -jnp.take_along_axis(t2, k[:, None], -1)[:, 0])
    sgn = jnp.where(tk >= 0, 1.0, -1.0).astype(dtype)  # outward (toward incident box)
    axk = jnp.take_along_axis(Rr, k[:, None, None], -1)[:, :, 0]      # ref axis world
    n_out = sgn[:, None] * axk                                         # ref face outward normal
    ku, kv = (k + 1) % 3, (k + 2) % 3
    axu = jnp.take_along_axis(Rr, ku[:, None, None], -1)[:, :, 0]
    axv = jnp.take_along_axis(Rr, kv[:, None, None], -1)[:, :, 0]
    a_half = jnp.take_along_axis(sr, ku[:, None], -1)[:, 0]
    b_half = jnp.take_along_axis(sr, kv[:, None], -1)[:, 0]
    face_c = pr + n_out * jnp.take_along_axis(sr, k[:, None], -1)      # ref face center

    # incident face: the incident-box axis most anti-parallel to n_out
    dots = jnp.einsum("sij,si->sj", Ri, n_out)        # [S,3] per incident axis
    ji = jnp.argmax(jnp.abs(dots), -1)                # dominant axis
    sgn_i = -jnp.sign(jnp.take_along_axis(dots, ji[:, None], -1)[:, 0])
    axji = jnp.take_along_axis(Ri, ji[:, None, None], -1)[:, :, 0]
    inc_c = pi + (sgn_i * jnp.take_along_axis(si, ji[:, None], -1)[:, 0])[:, None] * axji
    ju, jv = (ji + 1) % 3, (ji + 2) % 3
    axju = jnp.take_along_axis(Ri, ju[:, None, None], -1)[:, :, 0]
    axjv = jnp.take_along_axis(Ri, jv[:, None, None], -1)[:, :, 0]
    cu = jnp.take_along_axis(si, ju[:, None], -1)[:, 0]
    cv = jnp.take_along_axis(si, jv[:, None], -1)[:, 0]

    # incident face quad in ref-face 2D coords + signed gap (affine in 2D);
    # vertex sign table unrolled in Python (no embedded array constants)
    quad3 = jnp.stack(
        [inc_c + su * cu[:, None] * axju + sv * cv[:, None] * axjv
         for su, sv in ((1.0, 1.0), (1.0, -1.0), (-1.0, -1.0), (-1.0, 1.0))],
        axis=1,
    )                                                  # [S, 4, 3]
    rel = quad3 - face_c[:, None, :]
    qx = jnp.einsum("svj,sj->sv", rel, axu)
    qy = jnp.einsum("svj,sj->sv", rel, axv)
    qd = jnp.einsum("svj,sj->sv", rel, n_out)          # signed gap at quad verts

    # candidates: 4 quad verts + 16 edge/side intersections + 4 rect corners
    cand_x, cand_y, cand_d, cand_ok = [], [], [], []
    cand_x.append(qx); cand_y.append(qy); cand_d.append(qd)
    cand_ok.append((jnp.abs(qx) <= a_half[:, None]) & (jnp.abs(qy) <= b_half[:, None]))

    nxt = [1, 2, 3, 0]
    ex, ey, ed = qx[:, nxt] - qx, qy[:, nxt] - qy, qd[:, nxt] - qd     # quad edges [S,4]
    for side in range(4):                              # x=+a, x=-a, y=+b, y=-b
        horiz = side < 2
        lim = (a_half if horiz else b_half)[:, None] * (1.0 if side % 2 == 0 else -1.0)
        num = lim - (qx if horiz else qy)
        den = ex if horiz else ey
        nonpar = jnp.abs(den) > eps
        tpar = num / jnp.where(nonpar, den, jnp.inf)
        okp = nonpar & (tpar >= 0.0) & (tpar <= 1.0)
        ix = qx + tpar * ex
        iy = qy + tpar * ey
        idd = qd + tpar * ed
        okp = okp & (jnp.abs(iy if horiz else ix)
                     <= ((b_half if horiz else a_half)[:, None] + 1e-10))
        cand_x.append(ix); cand_y.append(iy); cand_d.append(idd); cand_ok.append(okp)

    # rect corners inside the quad (convex: same-side test on all 4 edges)
    rcx = jnp.stack([a_half, a_half, -a_half, -a_half], -1)
    rcy = jnp.stack([b_half, -b_half, -b_half, b_half], -1)
    crossz = (ex[:, None, :] * (rcy[:, :, None] - qy[:, None, :])
              - ey[:, None, :] * (rcx[:, :, None] - qx[:, None, :]))   # [S, 4c, 4e]
    inside = jnp.all(crossz >= -1e-10, -1) | jnp.all(crossz <= 1e-10, -1)
    # depth at rect corners via the affine gap d(x, y)
    gnorm = ex[:, 0] * ey[:, 1] - ex[:, 1] * ey[:, 0]
    gx = (ed[:, 0] * ey[:, 1] - ed[:, 1] * ey[:, 0]) / jnp.where(jnp.abs(gnorm) > eps, gnorm, jnp.inf)
    gy = (ex[:, 0] * ed[:, 1] - ex[:, 1] * ed[:, 0]) / jnp.where(jnp.abs(gnorm) > eps, gnorm, jnp.inf)
    d_rc = qd[:, 0:1] + gx[:, None] * (rcx - qx[:, 0:1]) + gy[:, None] * (rcy - qy[:, 0:1])
    cand_x.append(rcx); cand_y.append(rcy); cand_d.append(d_rc); cand_ok.append(inside)

    cx = jnp.concatenate(cand_x, -1)                   # [S, 24]
    cy = jnp.concatenate(cand_y, -1)
    cd = jnp.concatenate(cand_d, -1)
    ok = jnp.concatenate(cand_ok, -1) & (cd < margin[:, None])
    # dedup coincident candidates (vertex exactly on a rect side appears as
    # both an inside-vertex and an edge intersection): drop j if a valid i < j
    # sits at the same 2D point (index comparison via iota, no array literals)
    idx = jnp.arange(cx.shape[-1])
    close = ((cx[:, :, None] - cx[:, None, :]) ** 2
             + (cy[:, :, None] - cy[:, None, :]) ** 2) < 1e-14
    dup = jnp.any(close & ok[:, :, None] & (idx[:, None] < idx[None, :])[None], axis=1)
    ok = ok & ~dup
    order = jnp.argsort(jnp.where(ok, cd, jnp.inf), -1)        # deepest first
    pick = jnp.take_along_axis(order, slot_idx[:, None], -1)[:, 0]
    px = jnp.take_along_axis(cx, pick[:, None], -1)[:, 0]
    py = jnp.take_along_axis(cy, pick[:, None], -1)[:, 0]
    pd = jnp.take_along_axis(cd, pick[:, None], -1)[:, 0]
    p_ok = jnp.take_along_axis(ok, pick[:, None], -1)[:, 0]
    pos_face = (face_c + px[:, None] * axu + py[:, None] * axv
                + (0.5 * pd)[:, None] * n_out)
    n_face = jnp.where(ref1[:, None], n_out, -n_out)   # geom1 -> geom2

    # ---- edge case: closest points of the two support edges (slot 0 only)
    ei = best_edge // 3
    ej = best_edge % 3
    ax1 = jnp.take_along_axis(R1, ei[:, None, None], -1)[:, :, 0]
    ax2 = jnp.take_along_axis(R2, ej[:, None, None], -1)[:, :, 0]
    ncr = jnp.cross(ax1, ax2)
    ncr = ncr / jnp.maximum(jnp.linalg.norm(ncr, axis=-1, keepdims=True), eps)
    ncr = ncr * jnp.where(jnp.sum(ncr * (p2 - p1), -1) >= 0, 1.0, -1.0)[:, None]
    # support corners on the off axes
    q1 = p1
    q2 = p2
    for kk in range(3):
        s1k = jnp.where(kk == ei, 0.0, jnp.sign(jnp.sum(R1[:, :, kk] * ncr, -1)))
        s2k = jnp.where(kk == ej, 0.0, -jnp.sign(jnp.sum(R2[:, :, kk] * ncr, -1)))
        q1 = q1 + (s1k * size1[:, kk])[:, None] * R1[:, :, kk]
        q2 = q2 + (s2k * size2[:, kk])[:, None] * R2[:, :, kk]
    # closest points between lines q1 + s ax1, q2 + u ax2
    r12 = q1 - q2
    a11 = jnp.sum(ax1 * ax1, -1)
    a22 = jnp.sum(ax2 * ax2, -1)
    a12 = jnp.sum(ax1 * ax2, -1)
    b1 = jnp.sum(ax1 * r12, -1)
    b2 = jnp.sum(ax2 * r12, -1)
    den = a11 * a22 - a12 * a12
    s_par = (a12 * b2 - a22 * b1) / jnp.where(jnp.abs(den) > eps, den, jnp.inf)
    u_par = (a11 * b2 - a12 * b1) / jnp.where(jnp.abs(den) > eps, den, jnp.inf)
    pe1 = q1 + s_par[:, None] * ax1
    pe2 = q2 + u_par[:, None] * ax2
    pos_edge = 0.5 * (pe1 + pe2)
    dist_edge = -best_edge_o

    is_edge = use_edge
    d_bb = jnp.where(is_edge, dist_edge, pd)
    pos_bb = jnp.where(is_edge[:, None], pos_edge, pos_face)
    n_bb = jnp.where(is_edge[:, None], ncr, n_face)
    ok_bb = touching & jnp.where(is_edge, slot_idx == 0, p_ok)

    dist = jnp.where(mask, d_bb, dist)
    pos = jnp.where(mask[:, None], pos_bb, pos)
    n = jnp.where(mask[:, None], n_bb, n)
    extra = extra & (~mask | ok_bb)
    return dist, pos, n, extra
