"""AC-PPO trainer CLI — replaces `ac_ppo_continuous_action` end to end.

Beta policy with baked observation statistics, Atari-style defaults (lr 2.5e-4,
8 envs x 128 steps, 4 minibatches, 4 epochs, clip 0.1, ent 0.01 —
src/ac_ppo_continuous_action.cpp:60-76), optional overlapped rollout/update
(--pipelined 1; off by default — see ACPPOConfig.pipelined), per-iteration
checkpoints, rank-style TB logging, --estimate_mean_std pass, and a final
deterministic ("mean" sample type) eval like ac_ppo...cpp:965-1001.
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ppo_tpu.algos import ac_ppo, ppo
from ppo_tpu.config import PPOConfig, parse_config
from ppo_tpu.envs import VectorEnv, make_env
from ppo_tpu.train_ppo import build_model
from ppo_tpu.utils import checkpoint as ckpt
from ppo_tpu.utils.tb import SummaryWriter


@dataclasses.dataclass
class ACPPOConfig(PPOConfig):
    # AC-PPO defaults (ac_ppo_continuous_action.cpp:60-76)
    learning_rate: float = 2.5e-4
    num_envs: int = 8
    num_steps: int = 128
    num_minibatches: int = 4
    update_epochs: int = 4
    clip_coef: float = 0.1
    ent_coef: float = 0.01
    num_eval_runs: int = 128            # ac_ppo_continuous_action.cpp:76
    agent: str = "beta"
    # Overlapped rollout/update is opt-in: it hides the whole update behind
    # collection (measured 0.23 s/iter vs 0.31 s serial, HalfCheetah 64x128
    # on the chip, round 5) but trains each rollout with a one-iteration-
    # stale policy, which is NOT what the reference does (its async is
    # per-env WITHIN collection, ac_ppo...cpp:641-698; the iteration boundary
    # is a full barrier at :706). Measured cost of the staleness (round-5
    # same-seed 1M-step HalfCheetah A/B, runs_curves/ac_pipe_1m.log /
    # ac_serial_1m.log): eval 722.3 pipelined vs 747.2 serial, a ~3% return
    # gap for ~25% more throughput. (Round 3's alarming "eval 7 vs 360" was
    # a 262k-step-budget threshold artifact — the pipelined learning curve
    # was rising normally, just ~1/3 behind; see docs/PERF.md round-5 notes.)
    # Serial stays the default for reference fidelity.
    pipelined: bool = False
    estimate_mean_std: bool = False


def train(cfg: ACPPOConfig, verbose: bool = True):
    from ppo_tpu import select_platform

    select_platform(getattr(cfg, "device", "auto"), cfg.num_envs)
    import jax as _jax

    verbose = verbose and _jax.process_index() == 0  # rank-0 prints (ac_ppo...cpp:624)
    if cfg.use_dd_ppo_preempt and verbose:
        # N/A-by-design here: on-device lockstep vmap collection has no
        # per-env stragglers to preempt (every env advances in the same XLA
        # program). The preemption protocol IS wired where stragglers exist —
        # host-driven external-simulator collection (train_cnn --external_env,
        # algos/host_collect.py), matching the reference's per-env collector
        # threads (ac_ppo_continuous_action.cpp:680-722).
        print("use_dd_ppo_preempt: no-op for lockstep on-device collection; "
              "see train_cnn --external_env for the host-driven path")
    # fail fast on a bad resume target, before any compilation
    resume_path, resume_it = (None, -1)
    if cfg.resume_from:
        resume_path, resume_it = ckpt.resolve_checkpoint(cfg.resume_from)
        if resume_path is None:
            raise FileNotFoundError(f"no checkpoint under {cfg.resume_from}")

    # deterministic run folder across ranks; per-rank event files with
    # rank-0-only hyperparameters (ac_ppo_continuous_action.cpp:420-423)
    ts = int(time.time())
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        ts = int(multihost_utils.broadcast_one_to_all(jnp.int32(ts)))
    run_name = f"{cfg.env_id}__{cfg.exp_name}__{cfg.seed}__{ts}"
    folder = os.path.join(cfg.exp_folder, run_name)
    rank = jax.process_index()
    writer = SummaryWriter(folder, suffix=f".rank{rank}" if jax.process_count() > 1 else "")
    if rank == 0:
        writer.add_text("hyperparameters", cfg.to_markdown())
        with open(os.path.join(folder, "config.json"), "w") as f:
            f.write(cfg.to_json())

    env = make_env(cfg.env_id, dtype=jnp.float32, solver_iterations=cfg.solver_iterations,
                   contact_topk=None if cfg.contact_topk < 0 else cfg.contact_topk,
                   batch_impl=cfg.batch_impl)
    venv = VectorEnv(env, cfg.num_envs, clip_actions=cfg.clip_actions)  # normalization baked into model
    model = build_model(cfg, env)
    optimizer = ppo.make_optimizer(cfg)

    key = jax.random.PRNGKey(cfg.seed)
    key, k_env, k_model = jax.random.split(key, 3)
    env_state, obs = venv.reset(k_env)
    params = model.init_params(k_model, venv.obs_dim, dtype=venv.dtype)
    opt_state = optimizer.init(params)

    if cfg.estimate_mean_std:
        mean, std = ac_ppo.estimate_mean_std(cfg, venv, model, params, key)
        np.set_printoptions(precision=4, suppress=True, linewidth=200)
        print("observation_mean =", np.array2string(mean, separator=", "))
        print("observation_std  =", np.array2string(std, separator=", "))
        return None, None

    # resume model+optimizer BEFORE any device placement: restore_state yields
    # host numpy leaves, which shard_ac_state then places onto the mesh —
    # valid under multi-process jax.distributed too (ADVICE round 1: feeding
    # restored host arrays straight into the shard_map'd jit relied on
    # unverified auto-replication)
    start_iter = 1
    if resume_path is not None:
        restored = ckpt.restore_state(resume_path, {"params": params, "opt_state": opt_state})
        params, opt_state = restored["params"], restored["opt_state"]
        start_iter = resume_it + 1
        writer.add_scalar("charts/restart", 1.0, (start_iter - 1) * cfg.batch_size)

    if cfg.num_devices > 1:
        # mesh data parallelism: env shards per device, pmean'd grads — the
        # reference's mpirun multi-GPU path (ac_ppo...cpp:281-407)
        from ppo_tpu.parallel import dp

        mesh = dp.make_mesh(cfg.num_devices)
        cfg_local = dp.local_config(cfg, cfg.num_devices)
        venv_local = VectorEnv(env, cfg_local.num_envs, clip_actions=cfg.clip_actions)
        key, k_coll = jax.random.split(key)
        env_state, obs, done0, ckey, params, opt_state = dp.shard_ac_state(
            mesh, env_state, obs, jnp.zeros(venv.num_envs, bool), k_coll, params, opt_state
        )
        collect, update = dp.shard_ac_fns(
            mesh,
            ac_ppo.make_collect_fn(cfg_local, venv_local, model),
            ac_ppo.make_update_fn(cfg_local, model, optimizer, axis_name=dp.AXIS),
            dp.env_state_specs(env_state),
        )
    else:
        ckey = None
        # donate the env state: the previous iteration's buffers are dead
        # (params are NOT donated — the update still reads them). The donated
        # state needs PRIVATE const buffers: env_state.consts aliases
        # env.consts, which eval/render still read outside the jit.
        if getattr(env_state, "consts", None) is not None:
            env_state = env_state.replace(consts=jax.tree.map(jnp.copy, env_state.consts))
        collect = jax.jit(ac_ppo.make_collect_fn(cfg, venv, model), donate_argnums=(1,))
        # Donating params here is safe even in pipelined mode, where the
        # NEXT collect reading the same buffer is already in flight: dispatch
        # order sequences the donated buffer's reuse after its pending reads
        # (verified round 5 — same-seed pipelined runs with and without
        # params donation are bit-identical per-iteration, runs_curves/
        # ac_pipe_donate.log vs ac_pipe_nodonate.log).
        update = jax.jit(ac_ppo.make_update_fn(cfg, model, optimizer), donate_argnums=(0, 1))

    done = done0 if cfg.num_devices > 1 else jnp.zeros(venv.num_envs, bool)
    pending = None  # rollout awaiting its update (pipelined mode)
    global_step = (start_iter - 1) * cfg.batch_size
    start = time.time()
    windowed: list[float] = []     # best-model tracking (ac_ppo_carla.cpp:456-474)
    best_score = -np.inf

    from ppo_tpu.utils.tictoc import TicToc

    tt = TicToc(verbose=verbose and not cfg.pipelined)
    from ppo_tpu.utils.progress import progress_range

    for iteration in progress_range(start_iter, cfg.num_iterations + 1, enabled=verbose):
        it_start = time.perf_counter()
        key, k_up = jax.random.split(key)
        # dispatch collection with the CURRENT policy snapshot
        tt.tic()
        if ckey is not None:  # DP mode threads a per-device key stack
            env_state, obs, done, ckey, rollout = collect(params, env_state, obs, done, ckey)
        else:
            env_state, obs, done, key, rollout = collect(params, env_state, obs, done, key)
        if not cfg.pipelined:
            # phase timing (TicToc parity, ac_ppo...cpp:754/:892): a data-
            # dependent scalar fetch is the only trustworthy sync on this
            # runtime; do NOT fetch between dispatches in pipelined mode or
            # the collect/update overlap would be serialized away
            float(jax.device_get(rollout.rewards[0, 0]))
            tt.toc("Time for collection:")
        if cfg.pipelined:
            # update consumes the PREVIOUS rollout -> XLA may overlap it with
            # the in-flight collection (policy one iteration stale, like AC-PPO)
            if pending is not None:
                params, opt_state, stats = update(params, opt_state, pending, k_up)
            else:
                stats = None
            pending = rollout
        else:
            tt.tic()
            params, opt_state, stats = update(params, opt_state, rollout, k_up)
            if verbose:
                float(jax.device_get(stats.total_loss))
                tt.toc("Time for training:")

        global_step += cfg.batch_size
        from ppo_tpu.parallel.dp import fetch_host

        infos = fetch_host(rollout.infos)
        d = infos["done"]
        if d.any():
            rets = infos["episode_return"][d]
            lens = infos["episode_length"][d]
            # every finished episode gets a scalar, like the reference
            # (ac_ppo_continuous_action.cpp:725-748) — no silent down-sampling
            for r, l in zip(rets, lens):
                writer.add_scalar("charts/episodic_return", float(r), global_step)
                writer.add_scalar("charts/episodic_length", float(l), global_step)
            windowed.extend(rets.tolist())
            windowed = windowed[-100:]
            avg = float(np.mean(windowed))
            writer.add_scalar("charts/windowed_avg_return", avg, global_step)
            if len(windowed) >= 10 and avg > best_score:
                best_score = avg
                ckpt.save_best({"params": params}, folder)
        if stats is not None:
            s = fetch_host(stats)
            writer.add_scalar("losses/value_loss", float(s.value_loss), global_step)
            writer.add_scalar("losses/policy_loss", float(s.policy_loss), global_step)
            writer.add_scalar("losses/entropy", float(s.entropy), global_step)
            writer.add_scalar("losses/approx_kl", float(s.approx_kl), global_step)
            writer.add_scalar("losses/clipfrac", float(s.clipfrac), global_step)
        writer.add_scalar("charts/learning_rate", ppo.current_lr(cfg, iteration - 1), global_step)
        sps = int((global_step - (start_iter - 1) * cfg.batch_size) / (time.time() - start))
        writer.add_scalar("charts/SPS", sps, global_step)
        if verbose:
            kl = f" kl {float(s.approx_kl):.4f} clipfrac {float(s.clipfrac):.3f}" \
                if stats is not None else ""
            print(f"iter {iteration}/{cfg.num_iterations} SPS {sps} "
                  f"({time.perf_counter() - it_start:.3f}s){kl}")
        if cfg.checkpoint_every and iteration % cfg.checkpoint_every == 0:
            ckpt.save_state({"params": params, "opt_state": opt_state}, folder, iteration)
        # in-training visualization (render=human): periodic GIF dump like
        # train_ppo — the reference's GLFW window applies to this trainer too
        if cfg.render == "human" and rank == 0:
            from ppo_tpu.train_ppo import render_rollout_gif

            every = cfg.render_interval or max(1, cfg.num_iterations // 10)
            if iteration % every == 0:
                render_rollout_gif(
                    env, model, params, jax.random.PRNGKey(cfg.eval_seed),
                    os.path.join(folder, f"train_{iteration:09d}.gif"),
                    verbose=verbose,
                )

    # drain the pipeline — and log the final update's stats instead of
    # discarding them (the last rollout's losses are as real as any other's)
    if cfg.pipelined and pending is not None:
        key, k_up = jax.random.split(key)
        params, opt_state, stats = update(params, opt_state, pending, k_up)
        from ppo_tpu.parallel.dp import fetch_host

        s = fetch_host(stats)
        writer.add_scalar("losses/value_loss", float(s.value_loss), global_step)
        writer.add_scalar("losses/policy_loss", float(s.policy_loss), global_step)
        writer.add_scalar("losses/entropy", float(s.entropy), global_step)
        writer.add_scalar("losses/approx_kl", float(s.approx_kl), global_step)
        writer.add_scalar("losses/clipfrac", float(s.clipfrac), global_step)

    ckpt.save_final({"params": params, "opt_state": opt_state}, folder)

    if jax.process_count() > 1:
        # multi-host: evaluate offline from the saved checkpoint instead
        if verbose and jax.process_index() == 0:
            print("multi-process run: skipping in-trainer final eval "
                  "(use the checkpoint with a single-process eval)")
        writer.close()
        return params, []

    # final eval with deterministic actions (sample_type="mean", ac_ppo...cpp:965-1001)
    eval_cfg = dataclasses.replace(cfg, sample_type="mean" if cfg.agent == "beta" else "sample")
    returns = ppo.evaluate(
        eval_cfg, venv, model, params, jax.random.PRNGKey(cfg.eval_seed), norm_state=env_state
    )
    # per-episode eval scalars like the reference (ac_ppo...cpp:965-1001)
    for i, r in enumerate(returns):
        writer.add_scalar("eval/episodic_return", float(r), i)
    if len(returns):
        writer.add_scalar("eval/avg_return", float(np.mean(returns)), 0)
        if verbose:
            print(f"eval avg return over {len(returns)} episodes: {np.mean(returns):.2f}")
    if cfg.render == "human" and rank == 0:
        from ppo_tpu.train_ppo import render_rollout_gif

        render_rollout_gif(env, model, params, jax.random.PRNGKey(cfg.eval_seed),
                           os.path.join(folder, "eval.gif"), verbose=verbose)
    writer.close()
    return params, returns


def main(argv=None):
    from ppo_tpu import force_platform_from_env

    force_platform_from_env()
    cfg = parse_config(argv, cls=ACPPOConfig)
    train(cfg)


if __name__ == "__main__":
    main()
