"""Synchronous PPO trainer CLI — replaces `ppo_continuous_action` end to end.

Same flag surface as the reference binary (src/ppo_continuous_action.cpp:199-266),
same wrapper stack (RecordStats -> NormObs -> clip(+-10) -> NormReward(gamma) ->
clip(+-10), lines 41-49), same TB scalar names, per-iteration checkpoints with
stale-file cleanup, and a final stochastic eval reusing the training envs.

Run: python -m ppo_tpu.train_ppo --env_id HalfCheetah-v5 --total_timesteps 1000000
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ppo_tpu.algos import ppo
from ppo_tpu.config import PPOConfig, parse_config
from ppo_tpu.envs import VectorEnv, make_env
from ppo_tpu.models import BetaActorCritic, GaussianActorCritic
from ppo_tpu.utils import checkpoint as ckpt
from ppo_tpu.utils.tictoc import TicToc
from ppo_tpu.utils.tb import SummaryWriter


def build_model(cfg: PPOConfig, env):
    if cfg.agent == "gaussian":
        return GaussianActorCritic(act_dim=env.act_dim)
    if cfg.agent == "beta":
        from ppo_tpu.hardcoded_obs_stats import get_obs_stats

        mean, std = get_obs_stats(cfg.env_id, env.obs_dim)
        return BetaActorCritic(
            act_dim=env.act_dim, action_low=env.action_low, action_high=env.action_high,
            obs_mean=tuple(mean), obs_std=tuple(std),
        )
    raise ValueError(f"unknown agent {cfg.agent}")


def train(cfg: PPOConfig, verbose: bool = True):
    from ppo_tpu import select_platform

    select_platform(getattr(cfg, "device", "auto"), cfg.num_envs)
    import jax as _jax

    verbose = verbose and _jax.process_index() == 0  # rank-0 prints (ac_ppo...cpp:624)
    # resolve the resume target up front so a bad path fails before any
    # env construction / compilation
    resume_path, resume_it = (None, -1)
    if cfg.resume_from:
        resume_path, resume_it = ckpt.resolve_checkpoint(cfg.resume_from)
        if resume_path is None:
            raise FileNotFoundError(f"no checkpoint under {cfg.resume_from}")

    # deterministic run folder across ranks (checkpoint/resume paths must
    # agree); per-rank event files with rank-0-only hyperparameter text
    # (ac_ppo_continuous_action.cpp:420-423 semantics)
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
    use_wrappers = cfg.agent == "gaussian"  # AC-PPO bakes normalization into the model
    venv = VectorEnv(
        env, cfg.num_envs, clip_actions=cfg.clip_actions,
        normalize_obs=use_wrappers, normalize_reward=use_wrappers, gamma=cfg.gamma,
    )
    model = build_model(cfg, env)
    optimizer = ppo.make_optimizer(cfg)

    if cfg.num_devices > 1:
        # data-parallel: envs sharded over the mesh, params replicated, grads
        # pmean'd in the update (replaces `mpirun -n N`, ac_ppo...cpp:299-303)
        from ppo_tpu.parallel import (
            init_distributed_runner_state,
            make_distributed_train_iteration,
            make_mesh,
        )

        mesh = make_mesh(cfg.num_devices)
        venv_local = VectorEnv(
            env, cfg.num_envs // cfg.num_devices, clip_actions=cfg.clip_actions,
            normalize_obs=use_wrappers, normalize_reward=use_wrappers, gamma=cfg.gamma,
        )
        rs, specs = init_distributed_runner_state(
            cfg, venv, model, optimizer, jax.random.PRNGKey(cfg.seed), mesh
        )
        run = make_distributed_train_iteration(cfg, venv_local, model, optimizer, mesh)
        # donate the runner state: params/opt/env buffers are dead after the
        # call, so XLA aliases them in place instead of allocating+copying
        train_iteration = jax.jit(lambda r: run(r, specs), donate_argnums=(0,))
    else:
        rs = ppo.init_runner_state(cfg, venv, model, optimizer, jax.random.PRNGKey(cfg.seed))
        train_iteration = jax.jit(ppo.make_train_iteration(cfg, venv, model, optimizer),
                                  donate_argnums=(0,))
    # the donated tree must own PRIVATE const buffers: rs.env.consts aliases
    # env.consts, which the final eval / renderer still read outside the jit —
    # donation would delete them under those readers
    if getattr(rs.env, "consts", None) is not None:
        rs = rs.replace(env=rs.env.replace(consts=jax.tree.map(jnp.copy, rs.env.consts)))

    # resume: full runner state (params, optimizer, env normalizers, RNG) —
    # the reference resumes model+optimizer only (ac_ppo_carla.cpp:226-255);
    # we also restore the wrapper statistics it documents as lost (ppo...cpp:595-599)
    start_iter = 1
    if resume_path is not None:
        rs = ckpt.restore_state(resume_path, rs)
        start_iter = int(rs.iteration) + 1 if resume_it == 0 else resume_it + 1
        writer.add_scalar("charts/restart", 1.0, (start_iter - 1) * cfg.batch_size)

    global_step = (start_iter - 1) * cfg.batch_size
    start = time.time()
    tt = TicToc(verbose=verbose)
    tracing = False
    from ppo_tpu.utils.progress import progress_range

    for iteration in progress_range(start_iter, cfg.num_iterations + 1, enabled=verbose):
        # XLA-op-depth tracing of post-warmup iterations (§5 profiling parity)
        if cfg.profile and iteration == min(cfg.num_iterations, start_iter + 2):
            jax.profiler.start_trace(os.path.join(folder, "profile"))
            tracing = True
        tt.tic()
        rs, out = train_iteration(rs)
        from ppo_tpu.parallel.dp import fetch_host

        out = fetch_host(out)  # multi-process-safe host copy (sharded episode stats)
        collect_train_time = tt.toc("Time for iteration:") if verbose else 0.0
        if cfg.profile and tracing and iteration >= min(cfg.num_iterations, start_iter + 4):
            jax.profiler.stop_trace()
            tracing = False
        global_step += cfg.batch_size

        # episodic stats (charts/*, same tags as the reference)
        done = out.episode_done
        if done.any():
            rets = out.episode_return[done]
            lens = out.episode_length[done]
            # every finished episode (ppo_continuous_action.cpp:410-433 logs
            # each info it sees; no silent down-sampling)
            for r, l in zip(rets, lens):
                writer.add_scalar("charts/episodic_return", float(r), global_step)
                writer.add_scalar("charts/episodic_length", float(l), global_step)
            writer.add_scalar(
                "charts/episodic_return_per_sec", float(rets.mean()), int(time.time() - start)
            )
        writer.add_scalar("charts/learning_rate", ppo.current_lr(cfg, iteration - 1), global_step)
        s = out.stats
        writer.add_scalar("losses/value_loss", float(s.value_loss), global_step)
        writer.add_scalar("losses/policy_loss", float(s.policy_loss), global_step)
        writer.add_scalar("losses/entropy", float(s.entropy), global_step)
        writer.add_scalar("losses/old_approx_kl", float(s.old_approx_kl), global_step)
        writer.add_scalar("losses/approx_kl", float(s.approx_kl), global_step)
        writer.add_scalar("losses/clipfrac", float(s.clipfrac), global_step)
        writer.add_scalar("losses/discounted_returns", float(out.mean_return), global_step)
        # divergence-guard observability (f32 NaN terminations mapped to done)
        writer.add_scalar("charts/nan_terminations", float(np.sum(out.nonfinite)), global_step)
        sps = int((global_step - (start_iter - 1) * cfg.batch_size) / (time.time() - start))
        writer.add_scalar("charts/SPS", sps, global_step)
        if verbose:
            print(f"iter {iteration}/{cfg.num_iterations} SPS {sps}")

        if cfg.checkpoint_every and iteration % cfg.checkpoint_every == 0:
            ckpt.save_state(rs, folder, iteration)
        # in-training visualization (reference renders every training step
        # when render=human, mujoco_env.h:110-134; a periodic GIF dump is the
        # headless analogue). Rank 0 only; ~10 dumps per run by default.
        if cfg.render == "human" and rank == 0:
            every = cfg.render_interval or max(1, cfg.num_iterations // 10)
            if iteration % every == 0:
                render_rollout_gif(
                    env, model, rs.params, jax.random.PRNGKey(cfg.eval_seed),
                    os.path.join(folder, f"train_{iteration:09d}.gif"),
                    rms=getattr(rs.env, "obs_rms", None), verbose=verbose,
                )

    ckpt.save_final(rs, folder)

    if jax.process_count() > 1:
        # multi-host: evaluate offline from the saved checkpoint instead
        if verbose and jax.process_index() == 0:
            print("multi-process run: skipping in-trainer final eval "
                  "(use the checkpoint with a single-process eval)")
        writer.close()
        return rs, []

    # final eval: training envs keep their normalization statistics
    returns = ppo.evaluate(
        cfg, venv, model, rs.params, jax.random.PRNGKey(cfg.eval_seed), norm_state=rs.env
    )
    for i, r in enumerate(returns):
        writer.add_scalar("eval/episodic_return", float(r), i)
    if len(returns):
        writer.add_scalar("eval/avg_return", float(np.mean(returns)), 0)
        if verbose:
            print(f"eval avg return over {len(returns)} episodes: {np.mean(returns):.2f}")

    if cfg.render == "human":
        # headless stand-in for the reference's GLFW training window
        # (mujoco_env.h:49-79): one policy episode rendered to <folder>/eval.gif
        render_eval_gif(cfg, env, venv, model, rs, os.path.join(folder, "eval.gif"),
                        verbose=verbose)
    writer.close()
    return rs, returns


def render_eval_gif(cfg, env, venv, model, rs, out_path, steps=300, verbose=True):
    render_rollout_gif(env, model, rs.params, jax.random.PRNGKey(cfg.eval_seed),
                       out_path, steps=steps, rms=rs.env.obs_rms, verbose=verbose)


def render_rollout_gif(env, model, params, key, out_path, steps=300, rms=None,
                       sample_kwargs=None, verbose=True):
    """One single-env policy rollout rendered to a GIF — the headless analogue
    of the reference's GLFW tracking-camera window (mujoco_env.h:49-79,
    110-134). Used for the final eval AND the periodic in-training dumps
    (render=human + render_interval). `rms` is the env-0 observation
    normalizer state when the wrapper stack is in play (sync PPO); the Beta
    agent's stats are baked into the model, so AC-PPO passes None."""
    from ppo_tpu.envs.render import Renderer, save_gif

    kwargs = sample_kwargs or {}

    @jax.jit
    def rollout(params, key):
        k0, key = jax.random.split(key)
        state, obs = env.reset(k0, env.consts)

        def body(carry, _):
            state, obs, key = carry
            key, ak = jax.random.split(key)
            o = obs
            if rms is not None:
                o = jnp.clip((o - rms.mean[0]) / jnp.sqrt(rms.var[0] + 1e-4), -10, 10)
            a = model.get_action_and_value(params, o[None].astype(jnp.float32), ak, **kwargs)[0][0]
            state, obs, _, _, _ = env.step(state, a, env.consts)
            return (state, obs, key), state.qpos

        (_, _, _), qtraj = jax.lax.scan(body, (state, obs, key), None, length=steps)
        return qtraj

    qtraj = np.asarray(rollout(params, key))
    frames = Renderer(env.model).render_trajectory(qtraj)
    save_gif(frames, out_path)
    if verbose:
        print(f"render=human: wrote {len(frames)} frames to {out_path}")


def main(argv=None):
    from ppo_tpu import force_platform_from_env

    force_platform_from_env()
    cfg = parse_config(argv)
    train(cfg)


if __name__ == "__main__":
    main()
