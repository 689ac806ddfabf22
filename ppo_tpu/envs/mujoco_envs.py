"""The four locomotion environments on the pure-JAX physics engine.

Each env reproduces the reference's gymcpp implementation exactly:
  HalfCheetah-v5: libs/gymcpp/mujoco/half_cheetah_v5.h (obs 17, fs 5, Euler)
  Hopper-v5:      libs/gymcpp/mujoco/hopper_v5.h       (obs 11, fs 4, RK4)
  Ant-v5:         libs/gymcpp/mujoco/ant_v5.h          (obs 105, fs 5, RK4)
  Humanoid-v4:    libs/gymcpp/mujoco/humanoid_v4.h     (obs 376, fs 5, RK4)

API: env.reset(key) -> (EnvState, obs); env.step(state, action) ->
(EnvState, obs, reward, terminated, truncated). Pure functions — vmap over the
leading axis of EnvState for lockstep vectorization; no per-env threads
(replaces ParVectorEnv's thread pool, gym.h:276-366).

Note on staleness parity: gymnasium/gymcpp read `cfrc_ext`, `cinert`, `cvel`,
`qfrc_actuator` and `xpos` from mjData *after* mj_step, where they reflect the
last substep's pre-integration state. We reproduce that by deriving those
observables from the final substep's ForwardOut.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppo_tpu.physics import forward, smooth
from ppo_tpu.physics import consts as pconsts
from ppo_tpu.physics.model import Model, gym_asset_path, load_model


@struct.dataclass
class EnvState:
    qpos: jax.Array
    qvel: jax.Array
    t: jax.Array                  # elapsed steps in episode (int32)
    key: jax.Array                # per-env RNG key
    x_before: jax.Array           # body-x / com-x used for velocity rewards
    qacc_warmstart: jax.Array     # previous step's qacc (mjData.qacc_warmstart)
    # cumulative count of f32 divergence-guard activations (observability:
    # a solver regression that NaNs frequently must be visible in metrics,
    # not just as shorter episodes) — preserved across autoresets
    nonfinite: jax.Array = None


class StepExtras(NamedTuple):
    """Last-substep forward quantities needed by obs/reward."""
    fwd: forward.ForwardOut
    cfrc_ext: jax.Array | None
    ctrl: jax.Array | None = None


# Duck-typed stand-ins for the ForwardOut attribute paths the obs builders
# read (fwd.kin.xpos / fwd.kin.xipos / fwd.com.cinert / fwd.vel.cvel /
# fwd.qacc), carrying the lanes final substep's batch-first observables
# (lanes.final_substep_aux) through the vmapped _post_step.
class _AuxKin(NamedTuple):
    xpos: jax.Array
    xipos: jax.Array


class _AuxCom(NamedTuple):
    cinert: jax.Array


class _AuxVel(NamedTuple):
    cvel: jax.Array


class _AuxFwd(NamedTuple):
    kin: _AuxKin
    com: _AuxCom
    vel: _AuxVel
    qacc: jax.Array


class MujocoEnv:
    """Shared machinery: physics substepping, reset noise scaffolding."""

    frame_skip: int = 5
    max_episode_steps: int = 1000
    action_low: float = -1.0
    action_high: float = 1.0
    needs_cfrc: bool = False
    # per-model default for dynamic top-k contact-slot selection on the lanes
    # path (lanes.select_topk_contacts): sized from measured simultaneous-
    # contact counts with ~2x headroom (runs_curves/count_contacts.py).
    # None = keep the full static slot table.
    contact_topk_default: int | None = None

    def __init__(self, dtype=jnp.float32, solver_iterations: int | None = None,
                 solver_type: str = "newton", batch_impl: str = "auto",
                 contact_topk: int | None = None):
        self.dtype = dtype
        self.batch_impl = batch_impl
        self.model: Model = smooth.set_const(load_model(gym_asset_path(self.xml)))
        topk = self.contact_topk_default if contact_topk is None else (contact_topk or None)
        self.ctx = forward.make_context(self.model, topk=topk)
        self.solver_type = solver_type
        # 4 warmstarted Newton iterations track MuJoCo trajectories as tightly
        # as 15 cold ones (tests/test_physics_step.py::
        # test_warmstart_low_iterations_trajectory) — the throughput default
        default_iters = 4 if solver_type == "newton" else self.model.opt.solver_iterations
        self.iterations = solver_iterations or default_iters
        self.dt = self.model.opt.timestep * self.frame_skip
        self.nq, self.nv, self.nu = self.model.nq, self.model.nv, self.model.nu
        # device-resident constants: passed through jit boundaries as arguments
        # so compiled programs embed no array literals (see physics/consts.py)
        self.consts = pconsts.extract(self.model, self.ctx, self.dtype)

    def _inject(self, consts):
        if consts is None:
            return self.model, self.ctx
        return pconsts.inject(self.model, self.ctx, consts)

    # -- physics ----------------------------------------------------------
    def _substeps(self, m, ctx, qpos, qvel, ctrl, warmstart):
        # first frame_skip-1 substeps under scan (one step body in the graph),
        # final substep unrolled so its ForwardOut feeds obs/reward staleness
        if self.frame_skip > 1:
            def body(carry, _):
                qp, qv, ws = carry
                qp2, qv2, fwd = forward.step(
                    m, ctx, qp, qv, ctrl, self.iterations, self.solver_type, ws
                )
                return (qp2, qv2, fwd.qacc), None

            (qpos, qvel, warmstart), _ = jax.lax.scan(
                body, (qpos, qvel, warmstart), None, length=self.frame_skip - 1
            )
        qpos, qvel, last_fwd = forward.step(
            m, ctx, qpos, qvel, ctrl, self.iterations, self.solver_type, warmstart
        )
        extras = StepExtras(
            fwd=last_fwd,
            cfrc_ext=(
                forward.rne_post_constraint(m, last_fwd.com, last_fwd.vel, last_fwd)
                if self.needs_cfrc else None
            ),
            ctrl=ctrl,
        )
        return qpos, qvel, extras

    def _forward_only(self, qpos, qvel, consts=None):
        """mj_forward after reset (fills kinematic observables)."""
        m, ctx = self._inject(consts)
        return forward.forward(
            m, qpos, qvel, jnp.zeros(self.nu, self.dtype),
            ctx, self.iterations, self.solver_type,
        )

    # -- common reset -----------------------------------------------------
    def reset(self, key, consts=None):
        m, ctx = self._inject(consts)
        key, sub = jax.random.split(key)
        qpos, qvel = self._reset_noise(m, sub)
        fwd = forward.forward(
            m, qpos, qvel, jnp.zeros(self.nu, self.dtype),
            ctx, self.iterations, self.solver_type,
        )
        state = EnvState(
            qpos=qpos, qvel=qvel, t=jnp.zeros((), jnp.int32), key=key,
            x_before=self._x_metric(m, qpos, fwd),
            qacc_warmstart=fwd.qacc,
            nonfinite=jnp.zeros((), jnp.int32),
        )
        extras = StepExtras(
            fwd=fwd, cfrc_ext=self._reset_cfrc(m, fwd), ctrl=jnp.zeros(self.nu, self.dtype)
        )
        return state, self._obs(m, qpos, qvel, extras)

    def _reset_cfrc(self, m, fwd):
        if not self.needs_cfrc:
            return None
        return forward.rne_post_constraint(m, fwd.com, fwd.vel, fwd)

    def _x_metric(self, m, qpos, fwd):
        return qpos[0]

    # -- common step ------------------------------------------------------
    def step(self, state: EnvState, action, consts=None):
        m, ctx = self._inject(consts)
        ctrl = jnp.clip(
            action.astype(self.dtype),
            jnp.asarray(m.actuator_ctrlrange[:, 0], self.dtype),
            jnp.asarray(m.actuator_ctrlrange[:, 1], self.dtype),
        )
        qpos, qvel, extras = self._substeps(
            m, ctx, state.qpos, state.qvel, ctrl, state.qacc_warmstart
        )
        return self._post_step(m, state, qpos, qvel, ctrl, extras, extras.fwd.qacc)

    def _post_step(self, m, state, qpos, qvel, ctrl, extras, qacc_next):
        x_after = self._x_metric(m, qpos, extras.fwd if extras is not None else None)
        x_velocity = (x_after - state.x_before) / self.dt
        reward, terminated = self._reward_done(qpos, qvel, ctrl, x_velocity, extras)
        t = state.t + 1
        truncated = t >= self.max_episode_steps
        obs = self._obs(m, qpos, qvel, extras)

        # f32 divergence guard (TPU-native robustness extension): MuJoCo runs
        # in f64 where solver blow-ups are practically impossible; in f32 a
        # marginally-stable contact state (large warmstarted qacc) can
        # occasionally diverge to non-finite values. Map that to termination
        # with sanitized outputs — physically the body has left any healthy
        # range, so this is the same outcome the healthy-state check encodes —
        # instead of letting one env's NaN poison the whole lockstep batch
        # (observed: Humanoid-v4, 64 envs, iteration 1 NaNs the PPO update).
        finite = (
            jnp.isfinite(qpos).all() & jnp.isfinite(qvel).all()
            & jnp.isfinite(obs).all() & jnp.isfinite(reward)
        )
        terminated = terminated | ~finite
        reward = jnp.where(finite, reward, 0.0).astype(self.dtype)
        obs = jnp.where(finite, obs, 0.0)
        new_state = EnvState(
            # keep the stored state steppable: a done env is stepped once more
            # (masked) by the vector autoreset before being replaced
            qpos=jnp.where(finite, qpos, jnp.asarray(m.qpos0, self.dtype)),
            qvel=jnp.where(finite, qvel, jnp.zeros_like(qvel)),
            t=t, key=state.key,
            x_before=jnp.where(finite, x_after, 0.0).astype(self.dtype),
            qacc_warmstart=jnp.where(finite, qacc_next, 0.0).astype(self.dtype),
            nonfinite=(state.nonfinite if state.nonfinite is not None
                       else jnp.zeros((), jnp.int32)) + (~finite).astype(jnp.int32),
        )
        return new_state, obs, reward, terminated, truncated

    # -- batched step (lane-major physics hot path) ------------------------
    @property
    def lanes_eligible(self) -> bool:
        from ppo_tpu.physics import lanes

        return lanes.lanes_supported(self.model, self.ctx, self.solver_type)

    def step_batch(self, state: EnvState, action, consts=None):
        """Lockstep step of a batched EnvState [B, ...] — semantically
        identical to `vmap(step)` but with the physics substeps running in
        lane-major layout (physics/lanes.py), the bandwidth-optimal layout on
        TPU — and, where the model fits the VMEM block budget, inside the
        whole-substep Pallas mega-kernel (physics/mega.py). Envs needing
        last-substep observables (cfrc_ext, cinert, cvel) run the final
        substep on the reference path so the staleness-parity reads are
        untouched; the remaining substeps use the lane/mega path."""
        from ppo_tpu.physics import lanes, mega

        if self.batch_impl not in ("auto", "lanes", "mega") or not self.lanes_eligible:
            return jax.vmap(self.step, in_axes=(0, 0, None))(state, action, consts)
        m, ctx = self._inject(consts)
        B = state.qpos.shape[0]
        # "auto" = lane-major XLA with the tile-2D batch layout (fastest
        # measured: 1.15M env-steps/s vs 590k for the whole-substep Pallas
        # kernel at 4096 envs — XLA's fusions win once tiles are full);
        # "mega" opts into the VMEM-resident Pallas kernel (physics/mega.py)
        use_mega = (
            self.batch_impl == "mega"
            and (self.dtype == jnp.float32  # Mosaic has no f64...
                 or mega.FORCE_INTERPRET[0])  # ...but interpret mode does
            and mega.supported(self.model, self.ctx, self.solver_type, B)
            and (jax.default_backend() != "cpu" or mega.FORCE_INTERPRET[0])
        )
        if use_mega:
            def substep_fn(qp, qv, ct_, ws_, n):
                return mega.substeps_batched(
                    self.model, self.ctx, qp, qv, ct_, ws_,
                    self.iterations, n, consts=consts,
                )
        else:
            def substep_fn(qp, qv, ct_, ws_, n):
                return lanes.substeps_batched(
                    m, ctx, qp, qv, ct_, ws_, self.iterations, n
                )
        ctrl = jnp.clip(
            action.astype(self.dtype),
            jnp.asarray(m.actuator_ctrlrange[:, 0], self.dtype),
            jnp.asarray(m.actuator_ctrlrange[:, 1], self.dtype),
        )
        if self.needs_cfrc:
            qpos, qvel, ws = substep_fn(
                state.qpos, state.qvel, ctrl, state.qacc_warmstart,
                self.frame_skip - 1,
            )
            # final substep stays on the lanes path too (round 5): the
            # previous vmapped-reference final substep cost ~4x the other
            # four substeps combined (batch-first layout, docs/PERF.md);
            # lanes.final_substep_aux returns the same mjData-visible
            # observables (cfrc_ext/cinert/cvel/xpos/xipos) batch-first
            qpos, qvel, qacc_next, auxb = lanes.final_substep_aux(
                m, ctx, qpos, qvel, ctrl, ws, self.iterations
            )
            fwd_duck = _AuxFwd(
                kin=_AuxKin(xpos=auxb.xpos, xipos=auxb.xipos),
                com=_AuxCom(cinert=auxb.cinert),
                vel=_AuxVel(cvel=auxb.cvel),
                qacc=qacc_next,
            )
            extras = StepExtras(fwd=fwd_duck, cfrc_ext=auxb.cfrc_ext, ctrl=ctrl)
            return jax.vmap(
                self._post_step, in_axes=(None, 0, 0, 0, 0, 0, 0)
            )(m, state, qpos, qvel, ctrl, extras, qacc_next)

        qpos, qvel, qacc_next = substep_fn(
            state.qpos, state.qvel, ctrl, state.qacc_warmstart, self.frame_skip,
        )
        return jax.vmap(
            self._post_step, in_axes=(None, 0, 0, 0, 0, None, 0)
        )(m, state, qpos, qvel, ctrl, None, qacc_next)


class HalfCheetah(MujocoEnv):
    """half_cheetah_v5.h: reward = x_vel - 0.1*sum(ctrl^2); never terminates."""

    xml = "half_cheetah.xml"
    frame_skip = 5
    obs_dim, act_dim = 17, 6
    contact_topk_default = 8      # S=16 slots; measured max 5 simultaneous

    def _reset_noise(self, m, key):
        k1, k2 = jax.random.split(key)
        qpos = jnp.asarray(m.qpos0, self.dtype) + jax.random.uniform(
            k1, (self.nq,), self.dtype, -0.1, 0.1
        )
        qvel = 0.1 * jax.random.normal(k2, (self.nv,), self.dtype)
        return qpos, qvel

    def _obs(self, m, qpos, qvel, extras):
        return jnp.concatenate([qpos[1:], qvel])

    def _reward_done(self, qpos, qvel, ctrl, x_velocity, extras):
        ctrl_cost = 0.1 * jnp.sum(ctrl * ctrl)
        return x_velocity - ctrl_cost, jnp.zeros((), bool)


class Hopper(MujocoEnv):
    """hopper_v5.h: reward = x_vel + healthy - 1e-3*sum(ctrl^2); unhealthy ends."""

    xml = "hopper.xml"
    frame_skip = 4
    obs_dim, act_dim = 11, 3
    contact_topk_default = 6      # S=11 slots; measured max 5 simultaneous

    def _reset_noise(self, m, key):
        k1, k2 = jax.random.split(key)
        qpos = jnp.asarray(m.qpos0, self.dtype) + jax.random.uniform(
            k1, (self.nq,), self.dtype, -5e-3, 5e-3
        )
        qvel = jax.random.uniform(k2, (self.nv,), self.dtype, -5e-3, 5e-3)
        return qpos, qvel

    def _obs(self, m, qpos, qvel, extras):
        return jnp.concatenate([qpos[1:], jnp.clip(qvel, -10.0, 10.0)])

    def _healthy(self, qpos, qvel):
        z, angle = qpos[1], qpos[2]
        healthy = (z >= 0.7) & (jnp.abs(angle) <= 0.2)
        healthy &= jnp.all(jnp.abs(qpos[2:]) <= 100.0)
        healthy &= jnp.all(jnp.abs(qvel) <= 100.0)
        return healthy

    def _reward_done(self, qpos, qvel, ctrl, x_velocity, extras):
        healthy = self._healthy(qpos, qvel)
        reward = x_velocity + healthy.astype(x_velocity.dtype) - 1e-3 * jnp.sum(ctrl * ctrl)
        return reward, ~healthy


class Ant(MujocoEnv):
    """ant_v5.h: obs 105 (qpos[2:], qvel, clip(cfrc_ext[1:], +-1));
    reward = x_vel + healthy - 0.5*ctrl^2 - 5e-4*sum(clip(cfrc)^2)."""

    xml = "ant.xml"
    frame_skip = 5
    obs_dim, act_dim = 105, 8
    needs_cfrc = True
    contact_topk_default = 12     # S=25 slots; measured max 5 simultaneous

    def _reset_noise(self, m, key):
        k1, k2 = jax.random.split(key)
        qpos = jnp.asarray(m.qpos0, self.dtype) + jax.random.uniform(
            k1, (self.nq,), self.dtype, -0.1, 0.1
        )
        qvel = 0.1 * jax.random.normal(k2, (self.nv,), self.dtype)
        return qpos, qvel

    def _x_metric(self, m, qpos, fwd):
        return fwd.kin.xpos[1][0]  # torso body x (stale read, gymnasium parity)

    def _obs(self, m, qpos, qvel, extras):
        cfrc = jnp.clip(extras.cfrc_ext[1:], -1.0, 1.0).reshape(-1)
        return jnp.concatenate([qpos[2:], qvel, cfrc])

    def _healthy(self, qpos, qvel):
        z = qpos[2]
        finite = jnp.all(jnp.isfinite(qpos)) & jnp.all(jnp.isfinite(qvel))
        return finite & (z >= 0.2) & (z <= 1.0)

    def _reward_done(self, qpos, qvel, ctrl, x_velocity, extras):
        healthy = self._healthy(qpos, qvel)
        ctrl_cost = 0.5 * jnp.sum(ctrl * ctrl)
        cfrc = jnp.clip(extras.cfrc_ext, -1.0, 1.0)
        contact_cost = 5e-4 * jnp.sum(cfrc * cfrc)
        reward = x_velocity + healthy.astype(x_velocity.dtype) - ctrl_cost - contact_cost
        return reward, ~healthy


class Humanoid(MujocoEnv):
    """humanoid_v4.h: obs 376 (qpos[2:], qvel, cinert, cvel, qfrc_actuator,
    cfrc_ext); reward = 1.25*xv + 5*healthy - 0.1*sum(ctrl^2); z outside
    (1.0, 2.0) terminates. x-velocity is of the center of mass."""

    xml = "humanoid.xml"
    frame_skip = 5
    obs_dim, act_dim = 376, 17
    action_low, action_high = -0.4, 0.4
    needs_cfrc = True
    contact_topk_default = 16     # S=138 slots; see count_contacts.log

    def _reset_noise(self, m, key):
        k1, k2 = jax.random.split(key)
        qpos = jnp.asarray(m.qpos0, self.dtype) + jax.random.uniform(
            k1, (self.nq,), self.dtype, -1e-2, 1e-2
        )
        qvel = jax.random.uniform(k2, (self.nv,), self.dtype, -1e-2, 1e-2)
        return qpos, qvel

    def _x_metric(self, m, qpos, fwd):
        # mass center of the robot (gymnasium mass_center): stale xipos read
        mass = jnp.asarray(m.body_mass, self.dtype)
        return jnp.sum(mass[:, None] * fwd.kin.xipos, axis=0)[0] / jnp.sum(mass)

    def _cinert_packed(self, fwd):
        ci = fwd.com.cinert  # [nbody, 6, 6]
        tl = ci[:, :3, :3]
        inert = jnp.stack(
            [tl[:, 0, 0], tl[:, 1, 1], tl[:, 2, 2], tl[:, 0, 1], tl[:, 0, 2], tl[:, 1, 2]], -1
        )
        # m*c from the TR block m*skew(c): mcx=TR[2,1], mcy=TR[0,2], mcz=TR[1,0]
        mc = jnp.stack([ci[:, 2, 3 + 1], ci[:, 0, 3 + 2], ci[:, 1, 3 + 0]], -1)
        mass = ci[:, 3, 3:4]
        return jnp.concatenate([inert, mc, mass], -1)  # [nbody, 10]

    def _obs(self, m, qpos, qvel, extras):
        fwd = extras.fwd
        qfrc_actuator = smooth.actuator_forces(m, extras.ctrl)
        return jnp.concatenate([
            qpos[2:],
            qvel,
            self._cinert_packed(fwd).reshape(-1),
            fwd.vel.cvel.reshape(-1),
            qfrc_actuator,
            extras.cfrc_ext.reshape(-1),
        ])

    def _healthy(self, qpos):
        z = qpos[2]
        return (z > 1.0) & (z < 2.0)

    def _reward_done(self, qpos, qvel, ctrl, x_velocity, extras):
        healthy = self._healthy(qpos)
        # healthy_reward is unconditional when terminate_when_unhealthy
        # (humanoid_v4.h:102: `terminate_when_unhealthy_ or isHealthy()`)
        reward = 1.25 * x_velocity + 5.0 - 0.1 * jnp.sum(ctrl * ctrl)
        return reward, ~healthy


_REGISTRY = {
    "HalfCheetah-v5": HalfCheetah,
    "Hopper-v5": Hopper,
    "Ant-v5": Ant,
    "Humanoid-v4": Humanoid,
}


def make_env(env_id: str, dtype=jnp.float32, **kw) -> MujocoEnv:
    return _REGISTRY[env_id](dtype=dtype, **kw)
