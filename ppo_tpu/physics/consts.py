"""Device-resident model constants: extract/inject around jit boundaries.

The tunneled TPU backend used here has a dispatch pathology: ANY compiled
program that embeds an array literal (even 2 elements) permanently degrades
every subsequent dispatch in the process to ~28 ms (measured empirically).
The engine therefore keeps every model array OUT of the compiled program:

  consts = extract(model, ctx, dtype)          # host: one pytree of arrays
  ...
  @jax.jit
  def step(state, action, consts):
      m, ctx = inject(model, ctx, consts)      # trace-time: shallow replace
      ...                                       # all math uses traced arrays

Structural fields (parent ids, dof addresses, joint types, slot tables' int
columns) stay as numpy/python and steer Python-level unrolling as before.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

MODEL_FIELDS = [
    "body_pos", "body_quat", "body_ipos", "body_iquat", "body_mass",
    "body_inertia", "qpos0", "qpos_spring", "jnt_pos", "jnt_axis",
    "dof_armature", "dof_damping", "actuator_ctrlrange", "geom_pos", "geom_quat",
]
SLOT_FIELDS = ["size1", "size2", "includemargin", "margin", "point", "friction", "corner"]
META_FIELDS = [
    "lim_onehot", "lim_lo", "lim_hi", "lim_margin", "lim_K", "lim_B",
    "lim_solimp", "lim_invw", "con_maskdiff", "con_C", "con_rowmask",
    "con_approx", "con_K", "con_B", "con_solimp", "con_margin",
]


INT_SLOT_FIELDS = ["geom1", "geom2", "body1", "body2"]
INT_META_FIELDS = ["lim_qadr", "lim_dadr"]


def extract(m, ctx, dtype=jnp.float32) -> dict:
    """Host-side pytree of every array the compiled step needs."""
    c = {f"m.{f}": jnp.asarray(getattr(m, f), dtype) for f in MODEL_FIELDS}
    c["m.gravity"] = jnp.asarray(m.opt.gravity, dtype)
    for f in SLOT_FIELDS:
        c[f"s.{f}"] = jnp.asarray(getattr(ctx.slots, f), dtype)
    for f in INT_SLOT_FIELDS:
        c[f"s.{f}"] = jnp.asarray(getattr(ctx.slots, f), jnp.int32)
    for f in META_FIELDS:
        c[f"e.{f}"] = jnp.asarray(getattr(ctx.meta, f), dtype)
    for f in INT_META_FIELDS:
        c[f"e.{f}"] = jnp.asarray(getattr(ctx.meta, f), jnp.int32)
    c["anc_mask"] = jnp.asarray(ctx.mask, dtype)
    # structural gathers
    c["m.geom_bodyid_c"] = jnp.asarray(m.geom_bodyid, jnp.int32)
    c["m.body_root_c"] = jnp.asarray(np.maximum(m.body_rootid, 0), jnp.int32)
    c["m.dof_root_c"] = jnp.asarray(np.maximum(m.body_rootid[m.dof_bodyid], 0), jnp.int32)
    # collider kind masks (bool selectors)
    from ppo_tpu.physics.collision import make_kind_masks

    for name, v in make_kind_masks(ctx.slots.kind).items():
        c[f"s.{name}"] = jnp.asarray(v)
    # CRB upper-triangle ancestor mask as float: the mega kernel
    # (physics/mega.py) takes it as an operand instead of a trace-time literal
    c["k.anc_triu"] = jnp.asarray(
        np.triu(np.asarray(ctx.mask)[np.asarray(m.dof_bodyid)].T), dtype
    )
    return c


def inject(m, ctx, consts: dict):
    """Shallow-replace array fields with their traced counterparts."""
    m2 = dataclasses.replace(
        m,
        opt=dataclasses.replace(m.opt, gravity=consts["m.gravity"]),
        geom_bodyid=consts["m.geom_bodyid_c"],
        **{f: consts[f"m.{f}"] for f in MODEL_FIELDS},
    )
    m2.body_root_c = consts["m.body_root_c"]
    m2.dof_root_c = consts["m.dof_root_c"]
    # static copy for code that unrolls geoms in Python (physics/lanes.py)
    m2.geom_bodyid_np = np.asarray(m.geom_bodyid)
    slots2 = ctx.slots._replace(
        **{f: consts[f"s.{f}"] for f in SLOT_FIELDS + INT_SLOT_FIELDS}
    )
    meta2 = ctx.meta._replace(**{f: consts[f"e.{f}"] for f in META_FIELDS + INT_META_FIELDS})
    from ppo_tpu.physics.collision import KIND_MASK_NAMES

    kind_masks = {k: consts[f"s.{k}"] for k in KIND_MASK_NAMES}
    ctx2 = ctx._replace(
        slots=slots2, meta=meta2, mask=consts["anc_mask"], kind_masks=kind_masks
    )
    return m2, ctx2


def eye3(dtype):
    """3x3 identity built from iota (no array literal)."""
    r = jnp.arange(3)  # iota, computed
    return (r[:, None] == r[None, :]).astype(dtype)
