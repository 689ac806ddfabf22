"""Whole-substep Pallas mega-kernel: VMEM-resident physics (opt-in).

STATUS (measured, round 3): this kernel compiles, matches the XLA path
bit-for-bit-close (tests/test_mega.py), and sustains ~590k env-steps/s at
4096 HalfCheetah envs — on par with the flat-batch XLA lane path but 2x
SLOWER than the tile-2D XLA layout (1.14M, docs/PERF.md round 3). Once tiles
are full, XLA's fusion scheduling beats Mosaic straight-line code for this
op mix (thousands of tiny vector ops), and intermediate HBM traffic turns
out not to be the binding constraint. Kept as `batch_impl="mega"` opt-in:
it is the reference implementation for VMEM-resident physics and documents
the Mosaic portability rules (gathers, scatters, relayouts) that any future
kernel work on this pipeline must follow.

This module runs the ENTIRE substep pipeline (kinematics -> com -> CRB -> RNE
-> passive/actuation -> qacc_smooth -> collision -> constraint rows -> Newton
-> integration) as ONE Pallas kernel per block of envs, generalizing the
approach proven by the solver kernel (physics/solver.py): all intermediates
live in VMEM for the kernel's duration, HBM sees only qpos/qvel/ctrl/warmstart
in and out (~27 floats per env per substep) plus the model constants (a few
KB). The kernel body literally calls the lane-major functions — under
`types.KERNEL_MODE` they emit Mosaic-friendly forms (static gathers unrolled
to slice-stacks, scatters built as row lists, the Newton solve inlined instead
of nested pallas_call) but compute identical math, so equivalence is pinned by
running the same functions in both modes (tests/test_mega.py).

Integrator split (compile-size control):
  EULER models (HalfCheetah): the whole step including the implicit-damping
    solve and position integration runs in-kernel.
  RK4 models (Hopper/Ant/Humanoid): the kernel computes one forward_l stage
    (qacc); the 4-stage RK4 combination + integration run between kernel calls
    in plain XLA (tiny [nq, B] elementwise work, ~1% of the traffic).

Model constants enter as kernel operands, never as embedded array literals
(same discipline as physics/consts.py — the tunneled runtime's dispatch
pathology, and Mosaic's limited constant support, both forbid them).

Humanoid's constraint system (569 rows x 23 dofs at 138 contact slots) does
not fit the VMEM block budget; `supported()` returns False for it and callers
keep the plain lane-major XLA path.

Reference behavior covered: MujocoEnv::mujocoStep's mj_step loop
(/root/reference/libs/gymcpp/mujoco/mujoco_env.h:97-108), here as lockstep
batched physics instead of per-env serial stepping.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ppo_tpu.physics import consts as pconsts
from ppo_tpu.physics import lanes
from ppo_tpu.physics.collision import KIND_MASK_NAMES, make_kind_masks
from ppo_tpu.physics.model import Model
from ppo_tpu.physics.types import EULER, KERNEL_MODE

# Float model/slot/meta fields that become kernel operands (the int/structural
# fields steer Python-level unrolling and stay static numpy inside the kernel).
_SLOT_FLOAT_FIELDS = ["size1", "size2", "includemargin", "point"]

# VMEM budget for one block's live intermediates (bytes). The true peak is
# Mosaic's to decide; this conservative estimate picks the lane-block size.
_VMEM_BUDGET = 9 * 2**20

# Tests force interpret-mode Pallas on CPU (validates the kernel trace itself,
# not just the fallback math).
FORCE_INTERPRET = [False]


def _live_bytes_per_lane(m: Model, ctx) -> int:
    """Rough peak VMEM per env lane: the big [*, B] intermediates of the
    constraint/solver section plus slack for the smooth-dynamics section."""
    S = ctx.meta.n_slots
    NR = ctx.meta.n_rows
    ne = ctx.meta.n_limit + S * NR
    nv, nbody = m.nv, m.nbody
    floats = (
        3 * ne * nv          # J + two solver copies
        + 4 * S * nv * 3     # jacp/jacd/rel/cross
        + S * NR * nv        # Jrows
        + 4 * nv * nv        # M, H-products, CRB crb
        + 4 * nbody * 36     # cinert + crb accumulation
        + 30 * nv + 20 * nbody + 12 * S * 9 + 200
    )
    return 4 * floats


def pick_block(m: Model, ctx, B: int) -> int | None:
    per_lane = _live_bytes_per_lane(m, ctx)
    for bb in (512, 256, 128):
        if B % bb == 0 and per_lane * bb <= _VMEM_BUDGET:
            return bb
    return None


def supported(m: Model, ctx, solver_type: str, B: int | None = None) -> bool:
    """Mega path covers the lane-eligible subset whose constraint system fits
    the VMEM block budget (everything but Humanoid among the four models)."""
    if not lanes.lanes_supported(m, ctx, solver_type):
        return False
    if ctx.meta.needs_jacr:  # condim>3 rows use the 4D formulation
        return False
    return pick_block(m, ctx, B or 128) is not None


# ---------------------------------------------------------------------------
# operand packing
# ---------------------------------------------------------------------------


def operand_keys(ctx) -> list[str]:
    keys = [f"m.{f}" for f in pconsts.MODEL_FIELDS] + ["m.gravity"]
    keys += [f"s.{f}" for f in _SLOT_FLOAT_FIELDS]
    keys += [f"e.{f}" for f in pconsts.META_FIELDS]
    # kind masks PRE-SHAPED per use rank (see lanes._kind_sel): (S,1),
    # (S,1,1) as "<name>3", (S,1,1,1) as "<name>4" — in-kernel expansions of
    # (S,) fuse into Mosaic-unsupported relayouts, host reshapes are free
    for name in KIND_MASK_NAMES:
        keys += [f"k.{name}", f"k.{name}3", f"k.{name}4"]
    keys += ["k.anc_triu"]
    return keys


def host_operands(m: Model, ctx, consts: dict | None, dtype) -> dict:
    """Operand dict from the env's device-resident consts (preferred: no
    array literals in the program) or from the static model (CPU tests)."""
    out = {}
    for f in pconsts.MODEL_FIELDS:
        k = f"m.{f}"
        out[k] = consts[k] if consts else jnp.asarray(getattr(m, f), dtype)
    out["m.gravity"] = consts["m.gravity"] if consts else jnp.asarray(m.opt.gravity, dtype)
    for f in _SLOT_FLOAT_FIELDS:
        k = f"s.{f}"
        out[k] = consts[k] if consts else jnp.asarray(getattr(ctx.slots, f), dtype)
    for f in pconsts.META_FIELDS:
        k = f"e.{f}"
        out[k] = consts[k] if consts else jnp.asarray(getattr(ctx.meta, f), dtype)
    # the host-numpy mask derivations only run when consts don't already
    # carry them (ADVICE r3: they were recomputed on every trace)
    masks = None if consts else make_kind_masks(np.asarray(ctx.slots.kind))
    for name in KIND_MASK_NAMES:
        src = consts[f"s.{name}"] if consts else jnp.asarray(masks[name])
        mf = src.astype(dtype)  # float 0/1: i1 VMEM tiles/broadcasts avoided
        out[f"k.{name}"] = mf[:, None]
        out[f"k.{name}3"] = mf[:, None, None]
        out[f"k.{name}4"] = mf[:, None, None, None]
    # anc_triu is a DERIVED static mask, not part of env consts; route it
    # through a device_put outside jit (env __init__) when consts exist.
    if consts is not None and "k.anc_triu" in consts:
        out["k.anc_triu"] = consts["k.anc_triu"]
    else:
        from ppo_tpu.physics import smooth

        mask = smooth.ancestor_mask(m)
        anc = np.triu(mask[np.asarray(m.dof_bodyid)].T).astype(np.float32)
        out["k.anc_triu"] = jnp.asarray(anc, dtype)
    return out


def _inject_kernel(m: Model, ctx, loaded: dict):
    """consts.inject analogue for kernel tracing: float fields from loaded
    refs, int/structural fields left as static numpy."""
    m2 = dataclasses.replace(
        m,
        opt=dataclasses.replace(m.opt, gravity=loaded["m.gravity"]),
        **{f: loaded[f"m.{f}"] for f in pconsts.MODEL_FIELDS},
    )
    # callers pass the STATIC model (int fields numpy); keep the unroll stash
    m2.geom_bodyid_np = np.asarray(getattr(m, "geom_bodyid_np", m.geom_bodyid))
    slots2 = ctx.slots._replace(
        **{f: loaded[f"s.{f}"] for f in _SLOT_FLOAT_FIELDS}
    )
    meta2 = ctx.meta._replace(**{f: loaded[f"e.{f}"] for f in pconsts.META_FIELDS})
    # masks stay f32, pre-shaped per rank: lanes._kind_sel uses them in
    # arithmetic selects (Mosaic cannot insert minor dims on i1 vectors)
    kind_masks = {}
    for name in KIND_MASK_NAMES:
        for suf in ("", "3", "4"):
            kind_masks[name + suf] = loaded[f"k.{name}{suf}"]
    return m2, ctx._replace(slots=slots2, meta=meta2, kind_masks=kind_masks)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _build_call(m: Model, ctx, keys, op_shapes, iterations, bb, B, dtype,
                mode: str, interpret: bool):
    """pallas_call computing one Euler substep (`mode='step'`) or one
    forward_l stage (`mode='forward'`) for a block of envs."""
    from jax.experimental import pallas as pl

    nq, nv, nu = m.nq, m.nv, m.nu
    n_state_in = 4  # qpos, qvel, ctrl, warmstart

    def kernel(*refs):
        state_refs = refs[:n_state_in]
        const_refs = refs[n_state_in : n_state_in + len(keys)]
        out_refs = refs[n_state_in + len(keys):]
        qp = state_refs[0][...]
        qv = state_refs[1][...]
        ct = state_refs[2][...]
        ws = state_refs[3][...]
        loaded = {
            k: r[...].reshape(op_shapes[k]) for k, r in zip(keys, const_refs)
        }
        # enforce the synchronous-tracing assumption behind the mutable
        # KERNEL_MODE/KERNEL_CONSTS cells (ADVICE r3): a concurrent trace
        # from another thread would see kernel-mode forms leak into its XLA
        # program, so fail loudly instead
        import threading

        assert not KERNEL_MODE[0], (
            "nested/concurrent Pallas kernel tracing: KERNEL_MODE is already "
            f"set (owner thread {KERNEL_MODE[1] if len(KERNEL_MODE) > 1 else '?'}, "
            f"this thread {threading.get_ident()})"
        )
        KERNEL_MODE[:] = [True, threading.get_ident()]
        lanes.KERNEL_CONSTS["anc_triu"] = loaded["k.anc_triu"]
        try:
            m2, ctx2 = _inject_kernel(m, ctx, loaded)
            if mode == "step":
                qp2, qv2, ws2 = lanes.step_l(m2, ctx2, qp, qv, ct, iterations, ws)
                out_refs[0][...] = qp2
                out_refs[1][...] = qv2
                out_refs[2][...] = ws2
            else:
                fwd = lanes.forward_l(m2, ctx2, qp, qv, ct, iterations, ws)
                out_refs[0][...] = fwd.qacc
        finally:
            KERNEL_MODE[:] = [False]
            lanes.KERNEL_CONSTS.clear()

    state_specs = [
        pl.BlockSpec((nq, bb), lambda i: (0, i)),
        pl.BlockSpec((nv, bb), lambda i: (0, i)),
        pl.BlockSpec((nu, bb), lambda i: (0, i)),
        pl.BlockSpec((nv, bb), lambda i: (0, i)),
    ]

    def _const_spec(shape2d):
        nd = len(shape2d)
        return pl.BlockSpec(shape2d, lambda i, _nd=nd: (0,) * _nd)

    const_specs = []
    op2d_shapes = []
    for k in keys:
        s = op_shapes[k]
        s2 = (1,) + tuple(s) if len(s) == 1 else tuple(s)
        op2d_shapes.append(s2)
        const_specs.append(_const_spec(s2))

    if mode == "step":
        out_specs = [
            pl.BlockSpec((nq, bb), lambda i: (0, i)),
            pl.BlockSpec((nv, bb), lambda i: (0, i)),
            pl.BlockSpec((nv, bb), lambda i: (0, i)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((nq, B), dtype),
            jax.ShapeDtypeStruct((nv, B), dtype),
            jax.ShapeDtypeStruct((nv, B), dtype),
        ]
    else:
        out_specs = [pl.BlockSpec((nv, bb), lambda i: (0, i))]
        out_shape = [jax.ShapeDtypeStruct((nv, B), dtype)]

    def call(qp, qv, ct, ws, ops2d):
        return pl.pallas_call(
            kernel,
            grid=(B // bb,),
            in_specs=state_specs + const_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(qp, qv, ct, ws, *ops2d)

    return call


def _ops_to_2d(keys, ops: dict):
    out = []
    for k in keys:
        a = ops[k]
        out.append(a[None] if a.ndim == 1 else a)
    return out


def substeps_batched(m: Model, ctx, qpos, qvel, ctrl, warmstart, iterations,
                     n_sub, consts: dict | None = None, interpret=None):
    """Drop-in for lanes.substeps_batched on the mega path: batch-first
    [B, n] in/out, lane layout + Pallas kernels inside."""
    if n_sub == 0:
        return qpos, qvel, warmstart
    dtype = qpos.dtype
    B = qpos.shape[0]
    bb = pick_block(m, ctx, B)
    assert bb is not None, "caller must check mega.supported()"
    if interpret is None:
        interpret = FORCE_INTERPRET[0] or jax.default_backend() == "cpu"

    ops = host_operands(m, ctx, consts, dtype)
    keys = operand_keys(ctx)
    op_shapes = {k: tuple(ops[k].shape) for k in keys}
    ops2d = _ops_to_2d(keys, ops)

    qp, qv, ct, ws = qpos.T, qvel.T, ctrl.T, warmstart.T

    if m.opt.integrator == EULER:
        call = _build_call(m, ctx, keys, op_shapes, iterations, bb, B, dtype,
                           "step", interpret)

        def one(qp, qv, ws):
            qp2, qv2, ws2 = call(qp, qv, ct, ws, ops2d)
            return qp2, qv2, ws2
    else:
        fcall = _build_call(m, ctx, keys, op_shapes, iterations, bb, B, dtype,
                            "forward", interpret)
        h = m.opt.timestep

        def one(qp, qv, ws):
            # RK4 combination (lanes._rk4_l) with the forward stage in-kernel
            (qacc0,) = fcall(qp, qv, ct, ws, ops2d)
            Fv = [qv]
            Fa = [qacc0]
            for i in range(3):
                dv = sum(a * v for a, v in zip(lanes._RK4_A[i], Fv) if a)
                da = sum(a * acc for a, acc in zip(lanes._RK4_A[i], Fa) if a)
                qp_i = lanes.integrate_pos_l(m, qp, dv, h)
                qv_i = qv + h * da
                (qacc_i,) = fcall(qp_i, qv_i, ct, Fa[-1], ops2d)
                Fv.append(qv_i)
                Fa.append(qacc_i)
            dv = sum(b * v for b, v in zip(lanes._RK4_B, Fv))
            da = sum(b * a for b, a in zip(lanes._RK4_B, Fa))
            qp2 = lanes.integrate_pos_l(m, qp, dv, h)
            qv2 = qv + h * da
            return qp2, qv2, Fa[-1]

    if n_sub == 1:
        qp, qv, ws = one(qp, qv, ws)
    else:
        def body(carry, _):
            qp, qv, ws = carry
            return one(qp, qv, ws), None

        (qp, qv, ws), _ = jax.lax.scan(body, (qp, qv, ws), None, length=n_sub)
    return qp.T, qv.T, ws.T
