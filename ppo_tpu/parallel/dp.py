"""Data-parallel PPO over a jax.sharding.Mesh via shard_map.

TPU-native redesign of the reference's hand-rolled MPI+NCCL data parallelism
(src/ac_ppo_continuous_action.cpp:281-407, src/distributed.cpp):

- env shards: each mesh slot steps `num_envs / n_devices` lockstep envs
  (the per-rank `num_envs_per_device` split, ac_ppo...cpp:398-407);
- params/optimizer replicated — identical init keys replace the rank-0
  broadcast (ac_ppo...cpp:551-553);
- per-minibatch gradient `pmean` inside the jitted update, applied BEFORE grad
  clipping, matching the allreduce-then-clip order (ac_ppo...cpp:874-888);
- distributed advantage normalization with Bessel correction
  (ac_ppo...cpp:833-848) via ops.ppo_loss.normalize_advantages(axis_name);
- loss metrics pmean'd before logging (ac_ppo...cpp:894-901).

The same code runs on a single-host virtual device mesh (CPU, for tests), one
real chip, or a multi-host slice: XLA lays the collectives onto ICI/DCN.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ppo_tpu.algos import ppo
from ppo_tpu.config import PPOConfig
from ppo_tpu.envs.vector import VectorEnv


AXIS = "dp"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise RuntimeError(
            f"mesh wants {n} devices but jax.devices() has {len(devs)}. For a "
            "virtual CPU mesh set jax.config.update('jax_platforms', 'cpu') "
            "and XLA_FLAGS=--xla_force_host_platform_device_count=N BEFORE "
            "jax initializes (env-var JAX_PLATFORMS alone may not apply here "
            "because the runtime imports jax early)."
        )
    return Mesh(np.array(devs[:n]), (AXIS,))


def local_config(cfg: PPOConfig, n_devices: int) -> PPOConfig:
    assert cfg.num_envs % n_devices == 0, "n_devices must divide num_envs"
    # the per-device view: local env shard, num_devices=1 (divisibility
    # validation runs against the GLOBAL config; the local copy describes one
    # device's slice and must not re-check global divisibility)
    local = dataclasses.replace(
        cfg, num_envs=cfg.num_envs // n_devices, num_devices=1
    )
    return local.recompute()


def _runner_specs(rs: ppo.RunnerState):
    """Partition specs: params/opt/iteration replicated, env/obs/done sharded,
    per-device keys stacked on the mesh axis."""

    def spec_like(path_is_env, leaf):
        return P(AXIS) if path_is_env else P()

    env_specs = jax.tree.map(lambda _: P(AXIS), rs.env)
    # device-resident model constants inside VectorState are replicated
    if getattr(rs.env, "consts", None) is not None:
        env_specs = env_specs.replace(
            consts=jax.tree.map(lambda _: P(), rs.env.consts)
        )
    return ppo.RunnerState(
        params=jax.tree.map(lambda _: P(), rs.params),
        opt_state=jax.tree.map(lambda _: P(), rs.opt_state),
        env=env_specs,
        obs=P(AXIS),
        done=P(AXIS),
        key=P(AXIS),
        iteration=P(),
    )


def put_global(tree, specs, mesh: Mesh):
    """Place host values onto a (possibly multi-process) mesh.

    Unlike jax.device_put, this also works when the mesh spans devices of
    OTHER processes (a real multi-host slice): every process computes the same
    global host value (same seed ≙ rank-0 broadcast) and contributes only its
    addressable shards.
    """
    def mk(x, s):
        sh = NamedSharding(mesh, s)
        arr = np.asarray(jax.device_get(x))
        return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])

    return jax.tree.map(mk, tree, specs)


def init_distributed_runner_state(cfg, venv: VectorEnv, model, optimizer, key, mesh: Mesh):
    """Global init then shard: env axis split across the mesh, params replicated."""
    rs = ppo.init_runner_state(cfg, venv, model, optimizer, key)
    n = mesh.shape[AXIS]
    # one key per device slot
    rs = rs.replace(key=jax.random.split(rs.key, n))
    specs = _runner_specs(rs)
    return put_global(rs, specs, mesh), specs


def make_distributed_train_iteration(cfg: PPOConfig, venv_local: VectorEnv, model,
                                     optimizer, mesh: Mesh):
    """Jitted global-iteration function over the mesh.

    `venv_local` must be built with num_envs / n_devices envs; `cfg` is the
    GLOBAL config (the per-device config is derived here).
    """
    n = mesh.shape[AXIS]
    cfg_local = local_config(cfg, n)
    inner = ppo.make_train_iteration(cfg_local, venv_local, model, optimizer, axis_name=AXIS)

    def device_fn(rs: ppo.RunnerState):
        # shard_map hands us the per-device block; unwrap the stacked key
        rs = rs.replace(key=rs.key[0])
        rs, out = inner(rs)
        rs = rs.replace(key=rs.key[None])
        # metric allreduce before logging (ac_ppo...cpp:894-901)
        stats = jax.tree.map(lambda x: jax.lax.pmean(x, AXIS), out.stats)
        out = out._replace(
            stats=stats,
            mean_reward=jax.lax.pmean(out.mean_reward, AXIS),
            mean_return=jax.lax.pmean(out.mean_return, AXIS),
            nonfinite=jax.lax.psum(out.nonfinite, AXIS),
        )
        return rs, out

    def run(rs, specs):
        out_specs = ppo.IterationOut(
            stats=jax.tree.map(lambda _: P(), ppo.PPOStats(*[0.0] * 7)),
            episode_return=P(None, AXIS),
            episode_length=P(None, AXIS),
            episode_done=P(None, AXIS),
            mean_reward=P(),
            mean_return=P(),
            nonfinite=P(),
        )
        f = shard_map(
            device_fn, mesh=mesh, in_specs=(specs,), out_specs=(specs, out_specs),
            check_vma=False,
        )
        return f(rs)

    return run


# --- AC-style (separate collect/update) data parallelism --------------------
# Used by train_ac_ppo and train_cnn: the two closures are shard_map'd
# independently so the host can pipeline them (collect iteration k+1 while
# updating with rollout k), preserving the reference AC-PPO's structure
# (src/ac_ppo_continuous_action.cpp:624-890) with pmean in place of NCCL.

def env_state_specs(env_state):
    """Partition specs for a VectorState/DictVectorState: env axis sharded,
    unbatched model constants replicated."""
    specs = jax.tree.map(lambda _: P(AXIS), env_state)
    consts = getattr(env_state, "consts", None)
    if consts is not None:
        specs = specs.replace(consts=jax.tree.map(lambda _: P(), consts))
    return specs


def _rollout_specs():
    from ppo_tpu.algos.ac_ppo import Rollout

    return Rollout(
        obs=P(None, AXIS), dones=P(None, AXIS), actions=P(None, AXIS),
        logprobs=P(None, AXIS), values=P(None, AXIS), rewards=P(None, AXIS),
        next_obs=P(AXIS), next_done=P(AXIS), infos=P(None, AXIS),
    )


def shard_ac_fns(mesh: Mesh, collect_local, update_local, env_specs):
    """shard_map-wrap AC-style closures built for the LOCAL env count.

    collect_local(params, env_state, obs, done, key) -> (env_state, obs, done,
    key, Rollout) with a per-device key (stacked [n, 2] at the global level);
    update_local must be built with axis_name=AXIS so gradients are pmean'd
    before clipping and advantage normalization is distributed.
    """
    ro_specs = _rollout_specs()

    def collect_dev(params, env_state, obs, done, key):
        env_state, obs, done, k, ro = collect_local(params, env_state, obs, done, key[0])
        return env_state, obs, done, k[None], ro

    collect = shard_map(
        collect_dev, mesh=mesh,
        in_specs=(P(), env_specs, P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(env_specs, P(AXIS), P(AXIS), P(AXIS), ro_specs),
        check_vma=False,
    )

    def update_dev(params, opt_state, ro, key):
        params, opt_state, stats = update_local(params, opt_state, ro, key)
        # metric allreduce before logging (ac_ppo...cpp:894-901)
        return params, opt_state, jax.tree.map(lambda x: jax.lax.pmean(x, AXIS), stats)

    update = shard_map(
        update_dev, mesh=mesh,
        in_specs=(P(), P(), ro_specs, P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(collect), jax.jit(update, donate_argnums=(0, 1))


def shard_ac_state(mesh: Mesh, env_state, obs, done, key, params, opt_state):
    """Place globally-initialized state onto the mesh: env axis sharded,
    params/optimizer replicated (same-key init ≙ rank-0 broadcast,
    ac_ppo...cpp:551-553), one collection key per mesh slot."""
    def put(tree, specs):
        return put_global(tree, specs, mesh)

    n = mesh.shape[AXIS]
    env_state = put(env_state, env_state_specs(env_state))
    obs = put(obs, jax.tree.map(lambda _: P(AXIS), obs))
    done = put(done, P(AXIS))
    keys = put(jax.random.split(key, n), P(AXIS))
    params = put(params, jax.tree.map(lambda _: P(), params))
    opt_state = put(opt_state, jax.tree.map(lambda _: P(), opt_state))
    return env_state, obs, done, keys, params, opt_state


def fetch_host(tree):
    """Host copy of device values that also works when arrays are sharded or
    replicated over OTHER processes' devices (plain device_get raises for
    non-addressable shards). Single-process: identical to jax.device_get."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(tree, tiled=True)
    return jax.device_get(tree)
