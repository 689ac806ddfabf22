"""MJCF model compiler: XML -> static Model structure (host-side numpy).

From-scratch implementation of the MJCF subset used by the four locomotion
models (half_cheetah / hopper / ant / humanoid, loaded from the installed
gymnasium package's assets — byte-identical to the reference's
libs/gymcpp/mujoco/assets/). Covers: nested bodies, hinge/slide/free joints,
plane/sphere/capsule geoms, per-file <default> classes, degree/radian angles,
fromto/axisangle frames, inertiafromgeom, settotalmass, motor actuators.

The compiled Model is intentionally comparable field-by-field with mjModel so
tests can diff against the installed `mujoco` binary (tests/test_physics_model.py).
"""

from __future__ import annotations

import dataclasses
import os
import xml.etree.ElementTree as ET

import numpy as np

from ppo_tpu.physics.types import BOX, CAPSULE, EULER, FREE, HINGE, PLANE, RK4, SLIDE, SPHERE

# ---------------------------------------------------------------------------
# numpy quaternion helpers (compile-time only)
# ---------------------------------------------------------------------------


def _np_quat_mul(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def _np_axisangle2quat(axis, angle):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate([[np.cos(angle / 2)], axis * np.sin(angle / 2)])


def _np_quat2mat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _np_mat2quat(R):
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        q = np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        q = np.array([(R[2, 1] - R[1, 2]) / s, 0.25 * s, (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s])
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        q = np.array([(R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s, 0.25 * s, (R[1, 2] + R[2, 1]) / s])
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        q = np.array([(R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s, (R[1, 2] + R[2, 1]) / s, 0.25 * s])
    return q / np.linalg.norm(q)


def _np_z2quat(v):
    """Quaternion rotating +z onto unit vector v."""
    z = np.array([0.0, 0.0, 1.0])
    c = np.cross(z, v)
    s = np.linalg.norm(c)
    if s < 1e-12:
        if v[2] > 0:
            return np.array([1.0, 0.0, 0.0, 0.0])
        return np.array([0.0, 1.0, 0.0, 0.0])
    angle = np.arctan2(s, v[2])
    return _np_axisangle2quat(c / s, angle)


# ---------------------------------------------------------------------------
# Model dataclass
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Option:
    timestep: float = 0.002
    gravity: np.ndarray = dataclasses.field(default_factory=lambda: np.array([0.0, 0.0, -9.81]))
    integrator: int = EULER
    solver_iterations: int = 100
    solver_tolerance: float = 1e-8
    impratio: float = 1.0


@dataclasses.dataclass
class Model:
    nq: int
    nv: int
    nu: int
    nbody: int
    njnt: int
    ngeom: int
    opt: Option
    qpos0: np.ndarray
    qpos_spring: np.ndarray
    # bodies
    body_parentid: np.ndarray
    body_rootid: np.ndarray
    body_weldid: np.ndarray
    body_jntadr: np.ndarray
    body_jntnum: np.ndarray
    body_dofadr: np.ndarray
    body_dofnum: np.ndarray
    body_pos: np.ndarray
    body_quat: np.ndarray
    body_ipos: np.ndarray
    body_iquat: np.ndarray
    body_mass: np.ndarray
    body_inertia: np.ndarray
    body_invweight0: np.ndarray
    # joints
    jnt_type: np.ndarray
    jnt_bodyid: np.ndarray
    jnt_qposadr: np.ndarray
    jnt_dofadr: np.ndarray
    jnt_pos: np.ndarray
    jnt_axis: np.ndarray
    jnt_range: np.ndarray
    jnt_limited: np.ndarray
    jnt_stiffness: np.ndarray
    jnt_solref: np.ndarray
    jnt_solimp: np.ndarray
    jnt_margin: np.ndarray
    # dofs
    dof_bodyid: np.ndarray
    dof_jntid: np.ndarray
    dof_damping: np.ndarray
    dof_armature: np.ndarray
    dof_invweight0: np.ndarray
    # geoms
    geom_type: np.ndarray
    geom_bodyid: np.ndarray
    geom_pos: np.ndarray
    geom_quat: np.ndarray
    geom_size: np.ndarray
    geom_friction: np.ndarray
    geom_margin: np.ndarray
    geom_gap: np.ndarray
    geom_contype: np.ndarray
    geom_conaffinity: np.ndarray
    geom_condim: np.ndarray
    geom_solref: np.ndarray
    geom_solimp: np.ndarray
    geom_solmix: np.ndarray
    geom_priority: np.ndarray
    geom_rgba: np.ndarray
    # actuators
    actuator_trnid: np.ndarray
    actuator_gear: np.ndarray
    actuator_ctrlrange: np.ndarray
    actuator_ctrllimited: np.ndarray
    # precomputed collision candidate pairs: {(type1, type2): int array [n, 2]}
    collision_pairs: dict
    # names (debugging / asserts)
    body_names: list
    jnt_names: list
    geom_names: list


# MuJoCo built-in attribute defaults.
_JOINT_DEFAULTS = {
    "type": "hinge",
    "axis": "0 0 1",
    "pos": "0 0 0",
    "limited": "false",
    "range": "0 0",
    "stiffness": "0",
    "damping": "0",
    "armature": "0",
    "ref": "0",
    "springref": "0",
    "solreflimit": "0.02 1",
    "solimplimit": "0.9 0.95 0.001 0.5 2",
    "margin": "0",
}
_GEOM_DEFAULTS = {
    "type": "sphere",
    "size": "0 0 0",
    "density": "1000",
    "friction": "1 0.005 0.0001",
    "condim": "3",
    "contype": "1",
    "conaffinity": "1",
    "margin": "0",
    "gap": "0",
    "solref": "0.02 1",
    "solimp": "0.9 0.95 0.001 0.5 2",
    "solmix": "1",
    "priority": "0",
    "rgba": "0.5 0.5 0.5 1",
}
_MOTOR_DEFAULTS = {"gear": "1", "ctrlrange": "0 0", "ctrllimited": "false"}

_JNT_TYPE = {"free": FREE, "slide": SLIDE, "hinge": HINGE}
_GEOM_TYPE = {"plane": PLANE, "sphere": SPHERE, "capsule": CAPSULE, "box": BOX}
_JNT_NDOF = {FREE: 6, SLIDE: 1, HINGE: 1}
_JNT_NQ = {FREE: 7, SLIDE: 1, HINGE: 1}


def _floats(s, n=None, fill=None):
    vals = [float(x) for x in s.split()]
    if n is not None and len(vals) < n:
        rest = fill[len(vals):] if fill is not None else [0.0] * (n - len(vals))
        vals = vals + list(rest)
    return np.array(vals[:n] if n else vals, float)


class _Attrs:
    """Attribute lookup: element attr > default-class attr > builtin default."""

    def __init__(self, elem, defaults, builtin):
        self.elem = elem
        self.defaults = defaults
        self.builtin = builtin

    def get(self, name, n=None, fill=None):
        s = self.elem.get(name)
        if s is None:
            s = self.defaults.get(name)
        if s is None:
            s = self.builtin.get(name)
        if s is None:
            return None
        return s

    def f(self, name, n=None, fill=None):
        return _floats(self.get(name), n, fill)

    def scalar(self, name):
        return float(self.get(name))

    def boolean(self, name):
        return self.get(name).lower() == "true"


def _geom_mass_inertia(gtype, size, density):
    """Mass and principal-frame inertia of a geom about its own center.

    Capsule = cylinder (half-length h) + two hemispheres, matching MuJoCo's
    compiled values (validated in tests against mjModel.body_inertia).
    """
    if gtype == SPHERE:
        r = size[0]
        m = density * 4.0 / 3.0 * np.pi * r**3
        i = 0.4 * m * r * r
        return m, np.array([i, i, i])
    if gtype == CAPSULE:
        r, h = size[0], size[1]
        mc = density * np.pi * r * r * (2 * h)          # cylinder
        ms = density * 4.0 / 3.0 * np.pi * r**3         # two hemispheres = sphere
        m = mc + ms
        iz = mc * r * r / 2.0 + ms * 0.4 * r * r
        # perpendicular axis: cylinder about center + hemispheres (parallel axis)
        ix_cyl = mc * (3 * r * r + 4 * h * h) / 12.0
        d = h + 3.0 * r / 8.0                            # hemisphere com offset
        i_hemi_com = (83.0 / 320.0) * (ms / 2.0) * r * r
        ix_sph = 2.0 * (i_hemi_com + (ms / 2.0) * d * d)
        ix = ix_cyl + ix_sph
        return m, np.array([ix, ix, iz])
    if gtype == BOX:
        sx, sy, sz = size[0], size[1], size[2]
        m = density * 8.0 * sx * sy * sz
        return m, m / 3.0 * np.array([sy * sy + sz * sz, sx * sx + sz * sz, sx * sx + sy * sy])
    if gtype == PLANE:
        return 0.0, np.zeros(3)
    raise ValueError(f"unsupported geom type {gtype}")


def load_model(path_or_string: str) -> Model:
    if os.path.exists(path_or_string):
        root = ET.parse(path_or_string).getroot()
    else:
        root = ET.fromstring(path_or_string)

    # --- compiler settings
    comp = root.find("compiler")
    angle = comp.get("angle", "degree") if comp is not None else "degree"
    deg2rad = np.pi / 180.0 if angle == "degree" else 1.0
    settotalmass = float(comp.get("settotalmass", "-1")) if comp is not None else -1.0

    # --- defaults (single flat class; the four target files use no named classes)
    defaults = {"joint": {}, "geom": {}, "motor": {}}
    for dflt in root.findall("default"):
        for kind in ("joint", "geom", "motor"):
            el = dflt.find(kind)
            if el is not None:
                defaults[kind].update(el.attrib)

    # --- option
    opt = Option()
    oel = root.find("option")
    if oel is not None:
        opt.timestep = float(oel.get("timestep", opt.timestep))
        if oel.get("gravity"):
            opt.gravity = _floats(oel.get("gravity"), 3)
        integ = oel.get("integrator", "Euler")
        opt.integrator = {"Euler": EULER, "RK4": RK4}[integ]
        opt.solver_iterations = int(oel.get("iterations", opt.solver_iterations))
        opt.solver_tolerance = float(oel.get("tolerance", opt.solver_tolerance))
        opt.impratio = float(oel.get("impratio", opt.impratio))

    # --- accumulators
    bodies = []      # dicts
    joints = []
    geoms = []

    def parse_geom(el, body_id):
        a = _Attrs(el, defaults["geom"], _GEOM_DEFAULTS)
        gtype = _GEOM_TYPE[a.get("type")]
        size = a.f("size", 3)
        quat = np.array([1.0, 0.0, 0.0, 0.0])
        pos = a.f("pos", 3) if a.get("pos") else np.zeros(3)
        if el.get("fromto"):
            ft = _floats(el.get("fromto"), 6)
            p1, p2 = ft[:3], ft[3:]
            pos = 0.5 * (p1 + p2)
            # MuJoCo's compiled capsule z-axis points along (from - to); the
            # capsule is symmetric so this only matters for frame parity tests.
            d = p1 - p2
            length = np.linalg.norm(d)
            quat = _np_z2quat(d / length)
            size = np.array([size[0], 0.5 * length, 0.0])
        elif el.get("axisangle"):
            aa = _floats(el.get("axisangle"), 4)
            quat = _np_axisangle2quat(aa[:3], aa[3] * deg2rad)
        elif el.get("quat"):
            quat = _floats(el.get("quat"), 4)
            quat = quat / np.linalg.norm(quat)
        friction = a.f("friction", 3, fill=_floats(_GEOM_DEFAULTS["friction"], 3))
        # partial friction spec keeps defaults for missing entries
        nfr = len((el.get("friction") or defaults["geom"].get("friction") or "").split())
        if el.get("friction") is None and defaults["geom"].get("friction") is None:
            friction = _floats(_GEOM_DEFAULTS["friction"], 3)
        geoms.append(
            dict(
                name=el.get("name", f"geom{len(geoms)}"),
                type=gtype,
                bodyid=body_id,
                pos=pos,
                quat=quat,
                size=size,
                density=a.scalar("density"),
                friction=friction,
                condim=int(a.scalar("condim")),
                contype=int(a.scalar("contype")),
                conaffinity=int(a.scalar("conaffinity")),
                margin=a.scalar("margin"),
                gap=a.scalar("gap"),
                solref=a.f("solref", 2),
                solimp=a.f("solimp", 5, fill=_floats(_GEOM_DEFAULTS["solimp"], 5)),
                solmix=a.scalar("solmix"),
                priority=int(a.scalar("priority")),
                rgba=a.f("rgba", 4, fill=_floats(_GEOM_DEFAULTS["rgba"], 4)),
            )
        )

    def parse_body(el, parent_id):
        body_id = len(bodies)
        pos = _floats(el.get("pos", "0 0 0"), 3)
        quat = np.array([1.0, 0.0, 0.0, 0.0])
        if el.get("quat"):
            quat = _floats(el.get("quat"), 4)
            quat = quat / np.linalg.norm(quat)
        elif el.get("axisangle"):
            aa = _floats(el.get("axisangle"), 4)
            quat = _np_axisangle2quat(aa[:3], aa[3] * deg2rad)
        bodies.append(
            dict(name=el.get("name", f"body{body_id}"), parent=parent_id, pos=pos, quat=quat, jntadr=-1, jntnum=0)
        )
        first_jnt = True
        for child in el:
            if child.tag == "freejoint":
                # <freejoint/> = <joint type="free"/> shorthand (no other attrs)
                joints.append(
                    dict(
                        name=child.get("name", f"jnt{len(joints)}"),
                        type=FREE, bodyid=body_id, pos=np.zeros(3),
                        axis=np.array([0.0, 0.0, 1.0]), limited=False,
                        range=np.zeros(2), stiffness=0.0, damping=0.0,
                        armature=0.0, ref=0.0, springref=0.0,
                        solref=_floats(_JOINT_DEFAULTS["solreflimit"], 2),
                        solimp=_floats(_JOINT_DEFAULTS["solimplimit"], 5),
                        margin=0.0,
                    )
                )
                if first_jnt:
                    bodies[body_id]["jntadr"] = len(joints) - 1
                    first_jnt = False
                bodies[body_id]["jntnum"] += 1
            elif child.tag == "joint":
                a = _Attrs(child, defaults["joint"], _JOINT_DEFAULTS)
                jtype = _JNT_TYPE[a.get("type")]
                limited_attr = a.get("limited")
                jrange = a.f("range", 2) * (deg2rad if jtype == HINGE else 1.0)
                joints.append(
                    dict(
                        name=child.get("name", f"jnt{len(joints)}"),
                        type=jtype,
                        bodyid=body_id,
                        pos=a.f("pos", 3),
                        axis=a.f("axis", 3) / np.linalg.norm(a.f("axis", 3)),
                        limited=(limited_attr.lower() == "true") and jtype != FREE,
                        range=jrange,
                        stiffness=a.scalar("stiffness"),
                        damping=a.scalar("damping"),
                        armature=a.scalar("armature"),
                        ref=a.scalar("ref") * (deg2rad if jtype == HINGE else 1.0),
                        springref=a.scalar("springref") * (deg2rad if jtype == HINGE else 1.0),
                        solref=a.f("solreflimit", 2),
                        solimp=a.f("solimplimit", 5, fill=_floats(_JOINT_DEFAULTS["solimplimit"], 5)),
                        margin=a.scalar("margin"),
                    )
                )
                if first_jnt:
                    bodies[body_id]["jntadr"] = len(joints) - 1
                    first_jnt = False
                bodies[body_id]["jntnum"] += 1
            elif child.tag == "geom":
                parse_geom(child, body_id)
            elif child.tag == "body":
                parse_body(child, body_id)

    world = root.find("worldbody")
    bodies.append(dict(name="world", parent=0, pos=np.zeros(3), quat=np.array([1.0, 0, 0, 0]), jntadr=-1, jntnum=0))
    for child in world:
        if child.tag == "geom":
            parse_geom(child, 0)
        elif child.tag == "body":
            parse_body(child, 0)

    nbody, njnt, ngeom = len(bodies), len(joints), len(geoms)

    # --- dof / qpos layout
    jnt_qposadr = np.zeros(njnt, int)
    jnt_dofadr = np.zeros(njnt, int)
    nq = nv = 0
    dof_bodyid, dof_jntid, dof_damping, dof_armature = [], [], [], []
    for j, jd in enumerate(joints):
        jnt_qposadr[j] = nq
        jnt_dofadr[j] = nv
        nq += _JNT_NQ[jd["type"]]
        ndof = _JNT_NDOF[jd["type"]]
        nv += ndof
        for _ in range(ndof):
            dof_bodyid.append(jd["bodyid"])
            dof_jntid.append(j)
            dof_damping.append(jd["damping"])
            dof_armature.append(jd["armature"])

    body_jntadr = np.array([b["jntadr"] for b in bodies], int)
    body_jntnum = np.array([b["jntnum"] for b in bodies], int)
    body_dofadr = np.full(nbody, -1, int)
    body_dofnum = np.zeros(nbody, int)
    for b in range(nbody):
        if body_jntnum[b]:
            j0 = body_jntadr[b]
            body_dofadr[b] = jnt_dofadr[j0]
            body_dofnum[b] = sum(_JNT_NDOF[joints[j]["type"]] for j in range(j0, j0 + body_jntnum[b]))

    body_parentid = np.array([b["parent"] for b in bodies], int)
    # weldid: nearest ancestor (or self) with dofs
    body_weldid = np.zeros(nbody, int)
    for b in range(1, nbody):
        body_weldid[b] = b if body_dofnum[b] > 0 else body_weldid[body_parentid[b]]
    # rootid: child-of-world ancestor
    body_rootid = np.zeros(nbody, int)
    for b in range(1, nbody):
        p = body_parentid[b]
        body_rootid[b] = b if p == 0 else body_rootid[p]

    # --- body inertial properties from geoms (inertiafromgeom)
    body_mass = np.zeros(nbody)
    body_ipos = np.zeros((nbody, 3))
    body_iquat = np.tile(np.array([1.0, 0, 0, 0]), (nbody, 1))
    body_inertia = np.zeros((nbody, 3))
    for b in range(1, nbody):
        gs = [g for g in geoms if g["bodyid"] == b and g["type"] != PLANE]
        if not gs:
            continue
        masses, coms, inertias = [], [], []
        for g in gs:
            m, diag = _geom_mass_inertia(g["type"], g["size"], g["density"])
            masses.append(m)
            coms.append(g["pos"])
            R = _np_quat2mat(g["quat"])
            inertias.append(R @ np.diag(diag) @ R.T)
        masses = np.array(masses)
        total = masses.sum()
        com = (masses[:, None] * np.array(coms)).sum(0) / total
        I = np.zeros((3, 3))
        for m, c, Ig in zip(masses, coms, inertias):
            d = c - com
            I += Ig + m * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
        body_mass[b] = total
        body_ipos[b] = com
        w, V = np.linalg.eigh(I)
        order = np.argsort(w)[::-1]          # MuJoCo sorts principal moments descending
        w, V = w[order], V[:, order]
        if np.linalg.det(V) < 0:
            V[:, 2] = -V[:, 2]
        body_inertia[b] = w
        body_iquat[b] = _np_mat2quat(V)

    if settotalmass > 0:
        scale = settotalmass / body_mass.sum()
        body_mass *= scale
        body_inertia *= scale

    # --- qpos0 / qpos_spring
    qpos0 = np.zeros(nq)
    qpos_spring = np.zeros(nq)
    for j, jd in enumerate(joints):
        adr = jnt_qposadr[j]
        if jd["type"] == FREE:
            b = jd["bodyid"]
            qpos0[adr : adr + 3] = bodies[b]["pos"]
            qpos0[adr + 3 : adr + 7] = bodies[b]["quat"]
            qpos_spring[adr : adr + 7] = qpos0[adr : adr + 7]
        else:
            qpos0[adr] = jd["ref"]
            qpos_spring[adr] = jd["springref"]

    # --- actuators (motor)
    jnt_name_to_id = {jd["name"]: j for j, jd in enumerate(joints)}
    act_trnid, act_gear, act_ctrlrange, act_ctrllimited = [], [], [], []
    act_root = root.find("actuator")
    if act_root is not None:
        for el in act_root.findall("motor"):
            a = _Attrs(el, defaults["motor"], _MOTOR_DEFAULTS)
            act_trnid.append(jnt_name_to_id[el.get("joint")])
            act_gear.append(_floats(a.get("gear"), 1)[0])
            act_ctrlrange.append(a.f("ctrlrange", 2))
            act_ctrllimited.append(a.boolean("ctrllimited"))
    nu = len(act_trnid)

    # --- collision candidate pairs
    geom_bodyid = np.array([g["bodyid"] for g in geoms], int)
    geom_contype = np.array([g["contype"] for g in geoms], int)
    geom_conaffinity = np.array([g["conaffinity"] for g in geoms], int)
    geom_type = np.array([g["type"] for g in geoms], int)
    pairs: dict = {}
    for g1 in range(ngeom):
        for g2 in range(g1 + 1, ngeom):
            b1, b2 = geom_bodyid[g1], geom_bodyid[g2]
            w1, w2 = body_weldid[b1], body_weldid[b2]
            if w1 == w2:
                continue
            # parent filter: exclude weld-parent pairs unless the parent weld is world
            wp1 = body_weldid[body_parentid[w1]]
            wp2 = body_weldid[body_parentid[w2]]
            if (w1 == wp2 and w1 != 0) or (w2 == wp1 and w2 != 0):
                continue
            if not (
                (geom_contype[g1] & geom_conaffinity[g2])
                or (geom_contype[g2] & geom_conaffinity[g1])
            ):
                continue
            a, b = g1, g2
            if geom_type[a] > geom_type[b]:
                a, b = b, a
            key = (int(geom_type[a]), int(geom_type[b]))
            pairs.setdefault(key, []).append((a, b))
    collision_pairs = {k: np.array(v, int) for k, v in pairs.items()}

    return Model(
        nq=nq,
        nv=nv,
        nu=nu,
        nbody=nbody,
        njnt=njnt,
        ngeom=ngeom,
        opt=opt,
        qpos0=qpos0,
        qpos_spring=qpos_spring,
        body_parentid=body_parentid,
        body_rootid=body_rootid,
        body_weldid=body_weldid,
        body_jntadr=body_jntadr,
        body_jntnum=body_jntnum,
        body_dofadr=body_dofadr,
        body_dofnum=body_dofnum,
        body_pos=np.array([b["pos"] for b in bodies]),
        body_quat=np.array([b["quat"] for b in bodies]),
        body_ipos=body_ipos,
        body_iquat=body_iquat,
        body_mass=body_mass,
        body_inertia=body_inertia,
        body_invweight0=np.zeros((nbody, 2)),
        jnt_type=np.array([jd["type"] for jd in joints], int),
        jnt_bodyid=np.array([jd["bodyid"] for jd in joints], int),
        jnt_qposadr=jnt_qposadr,
        jnt_dofadr=jnt_dofadr,
        jnt_pos=np.array([jd["pos"] for jd in joints]).reshape(njnt, 3),
        jnt_axis=np.array([jd["axis"] for jd in joints]).reshape(njnt, 3),
        jnt_range=np.array([jd["range"] for jd in joints]).reshape(njnt, 2),
        jnt_limited=np.array([jd["limited"] for jd in joints], bool),
        jnt_stiffness=np.array([jd["stiffness"] for jd in joints]),
        jnt_solref=np.array([jd["solref"] for jd in joints]).reshape(njnt, 2),
        jnt_solimp=np.array([jd["solimp"] for jd in joints]).reshape(njnt, 5),
        jnt_margin=np.array([jd["margin"] for jd in joints]),
        dof_bodyid=np.array(dof_bodyid, int),
        dof_jntid=np.array(dof_jntid, int),
        dof_damping=np.array(dof_damping),
        dof_armature=np.array(dof_armature),
        dof_invweight0=np.zeros(nv),
        geom_type=geom_type,
        geom_bodyid=geom_bodyid,
        geom_pos=np.array([g["pos"] for g in geoms]),
        geom_quat=np.array([g["quat"] for g in geoms]),
        geom_size=np.array([g["size"] for g in geoms]),
        geom_friction=np.array([g["friction"] for g in geoms]),
        geom_margin=np.array([g["margin"] for g in geoms]),
        geom_gap=np.array([g["gap"] for g in geoms]),
        geom_contype=geom_contype,
        geom_conaffinity=geom_conaffinity,
        geom_condim=np.array([g["condim"] for g in geoms], int),
        geom_solref=np.array([g["solref"] for g in geoms]),
        geom_solimp=np.array([g["solimp"] for g in geoms]),
        geom_solmix=np.array([g["solmix"] for g in geoms]),
        geom_priority=np.array([g["priority"] for g in geoms], int),
        geom_rgba=np.array([g["rgba"] for g in geoms]),
        actuator_trnid=np.array(act_trnid, int),
        actuator_gear=np.array(act_gear),
        actuator_ctrlrange=np.array(act_ctrlrange).reshape(nu, 2),
        actuator_ctrllimited=np.array(act_ctrllimited, bool),
        collision_pairs=collision_pairs,
        body_names=[b["name"] for b in bodies],
        jnt_names=[jd["name"] for jd in joints],
        geom_names=[g["name"] for g in geoms],
    )


def gym_asset_path(name: str) -> str:
    """Path to a gymnasium-installed MJCF asset (byte-identical to the
    reference's libs/gymcpp/mujoco/assets/, verified in tests)."""
    import gymnasium

    return os.path.join(os.path.dirname(gymnasium.__file__), "envs", "mujoco", "assets", name)
