"""Measure simultaneous active contact-slot counts per env (round-5 top-k
contact selection sizing): random-action rollouts on the lanes path, report
max / p99.9 of sum(active slots) per vector step. Chip or CPU."""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from ppo_tpu.envs import make_env
from ppo_tpu.physics import lanes

for eid in ["HalfCheetah-v5", "Hopper-v5", "Ant-v5", "Humanoid-v4"]:
    env = make_env(eid, solver_iterations=4)
    m, ctx = env.model, env.ctx
    B = 128
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    state, obs = jax.vmap(env.reset, in_axes=(0, None))(keys, env.consts)
    qpos0, qvel0 = state.qpos, state.qvel

    def count_active(qpos):
        kin = lanes.kinematics_l(m, qpos.T)
        con = lanes.collide_l(m, kin.geom_xpos, kin.geom_xmat, ctx.slots, ctx.kind_masks)
        return jnp.sum(con.active, 0)

    n_sub = int(getattr(env, "frame_skip", 5))

    def rollout(qpos, qvel, key, steps):
        ws = jnp.zeros_like(qvel)

        def body(carry, _):
            qpos, qvel, ws, key = carry
            key, k = jax.random.split(key)
            ctrl = jax.random.uniform(k, (B, m.nu), minval=-1.0, maxval=1.0)
            qp, qv, ws = lanes.substeps_batched(
                m, ctx, qpos, qvel, ctrl, ws, 4, n_sub, tile2d=False
            )
            # divergence reset to keep states physical
            bad = ~jnp.isfinite(qp).all(1) | (jnp.abs(qp).max(1) > 1e3)
            qp = jnp.where(bad[:, None], qpos0, qp)
            qv = jnp.where(bad[:, None], qvel0, qv)
            return (qp, qv, ws, key), count_active(qp)

        (_, _, _, _), counts = jax.lax.scan(body, (qpos, qvel, ws, key), None, length=steps)
        return counts

    counts = jax.jit(rollout, static_argnums=3)(qpos0, qvel0, jax.random.PRNGKey(1), 300)
    h = np.asarray(counts)
    print(
        f"{eid}: S={ctx.meta.n_slots} max_active={h.max()} "
        f"p99.9={np.percentile(h, 99.9):.1f} p99={np.percentile(h, 99):.1f} "
        f"mean={h.mean():.2f}",
        flush=True,
    )
