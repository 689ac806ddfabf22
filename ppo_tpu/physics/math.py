"""Quaternion / rotation / spatial-algebra helpers.

Works with either numpy or jax.numpy arrays (pure elementwise math). Quaternions
are (w, x, y, z). Spatial 6-vectors follow the [angular(3); linear(3)] layout so
every intermediate can be diffed against the installed MuJoCo in tests.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_mul(q1, q2):
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    # computed (no array literals: embedded constants poison dispatch on the
    # tunneled TPU backend — see ppo_tpu/physics/consts.py)
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def quat_rot(q, v):
    """Rotate vector v by quaternion q (active rotation, body->world)."""
    qv = q[..., 1:]
    w = q[..., 0:1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_rot_inv(q, v):
    """Rotate v by the inverse of q (world->body)."""
    qv = q[..., 1:]
    w = q[..., 0:1]
    t = 2.0 * jnp.cross(-qv, v)
    return v + w * t + jnp.cross(-qv, t)


def quat_to_mat(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def quat_exp(phi):
    """exp map: rotation vector (3,) -> quaternion, q = [cos(|phi|/2), sin(...)*phi_hat]."""
    angle = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    # Safe normalization for tiny angles.
    small = angle < 1e-12
    e0 = jnp.zeros_like(phi).at[..., 0].set(1.0)
    axis = jnp.where(small, e0, phi / jnp.where(small, 1.0, angle))
    half = angle[..., 0] / 2.0
    w = jnp.cos(half)
    xyz = axis * jnp.sin(half)[..., None]
    return jnp.concatenate([w[..., None], xyz], axis=-1)


def quat_integrate(q, omega, dt):
    """mju_quatIntegrate: q <- q * exp(omega * dt), omega in local frame."""
    return normalize_quat(quat_mul(q, quat_exp(omega * dt)))


def normalize_quat(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_z2vec(v):
    """Quaternion rotating the z-axis onto the (unit) vector v (mju_quatZ2Vec)."""
    z = jnp.zeros_like(v).at[..., 2].set(1.0)
    cross = jnp.cross(z, v)
    sin_a = jnp.linalg.norm(cross)
    cos_a = v[..., 2]
    # handle parallel / antiparallel
    angle = jnp.arctan2(sin_a, cos_a)
    ex = jnp.zeros_like(v).at[..., 0].set(1.0)
    axis = jnp.where(sin_a < 1e-12, ex, cross / jnp.where(sin_a < 1e-12, 1.0, sin_a))
    return quat_exp(axis * angle)


def motion_cross(v, u):
    """Spatial motion cross product v x u, both [ang; lin]."""
    ang = jnp.cross(v[..., :3], u[..., :3])
    lin = jnp.cross(v[..., :3], u[..., 3:]) + jnp.cross(v[..., 3:], u[..., :3])
    return jnp.concatenate([ang, lin], axis=-1)


def force_cross(v, f):
    """Spatial force cross product v x* f, v motion [ang; lin], f force [ang(torque); lin]."""
    ang = jnp.cross(v[..., :3], f[..., :3]) + jnp.cross(v[..., 3:], f[..., 3:])
    lin = jnp.cross(v[..., :3], f[..., 3:])
    return jnp.concatenate([ang, lin], axis=-1)


def spd_solve(M, b, iters=None):
    """x = M^-1 b for SPD M via Jacobi-preconditioned conjugate gradients.

    Replaces cho_factor/cho_solve in the hot path: BATCHED small Cholesky +
    triangular solves execute pathologically slowly on the tunneled TPU
    runtime (measured ~15x the cost of the equivalent elementwise work,
    dominating the whole physics step), while CG is matvecs + elementwise
    ops only. n CG iterations on an n x n SPD system reproduce the direct
    solve to machine precision for these well-conditioned mass / Newton-
    Hessian matrices — the same scheme the lane-major Pallas kernel uses
    (solver._newton_lanes).

    M: [n, n]; b: [n] or [n, k] (k simultaneous right-hand sides).

    Default 2n iterations: exact-arithmetic CG terminates at n, but floating-
    point rounding delays termination on the worse-conditioned mass matrices
    (measured: humanoid cond(M)~3e3, n iters -> 5e1 abs error, 2n -> 3e-12).

    Accuracy envelope (tests/test_spd_solve.py): on REAL contact Hessians
    H = M + J'diag(d)J harvested from Ant/Humanoid states, rel error < 1e-8
    (f64) / < 1e-3 (f32); Jacobi preconditioning absorbs stiff-row scale (d up
    to 1e5-1e6). Known limit: adversarial dense systems with cond >= 1e6 do
    NOT converge in 2n f32 iterations — if such Hessians ever arise, the
    Newton solver's exact line search with its cost-decrease safeguard
    (solver.py) degrades convergence instead of correctness, and the
    trajectory parity suites bound the end-to-end effect.
    """
    import jax

    n = M.shape[-1]
    iters = iters or 2 * n
    diag = jnp.diagonal(M)
    if b.ndim == 2:
        diag = diag[:, None]
    Pinv = 1.0 / diag

    def matvec(p):
        return jnp.tensordot(M, p, axes=([1], [0]))

    x = jnp.zeros_like(b)
    r = b
    z = Pinv * r
    p = z
    rz = jnp.sum(r * z, 0)

    # unrolled (iters is small and static); a lax.scan here makes the nested
    # scan structure (CG in substep in frame-skip in rollout) pathologically
    # slow to compile on the remote-compile runtime
    for _ in range(iters):
        hp = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * hp, 0), 1e-30)
        x = x + alpha * p
        r = r - alpha * hp
        z = Pinv * r
        rz2 = jnp.sum(r * z, 0)
        beta = rz2 / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        rz = rz2
    return x
