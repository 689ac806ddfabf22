"""Standalone checkpoint evaluation CLI.

The reference evaluates only inside the trainers (ppo_continuous_action.cpp:
589-626, ac_ppo...cpp:965-1001) and via the CARLA inference server; this tool
evaluates any saved run offline — the documented path for multi-host runs
(whose in-trainer eval is skipped) and for re-evaluating old checkpoints.

Restores the full RunnerState — params AND the training normalizer
statistics + RNG (the reference documents losing wrapper state,
ppo...cpp:595-599; our checkpoints carry it, utils/checkpoint.py).

    python -m ppo_tpu.eval --checkpoint runs/<run folder> [--episodes 10]
        [--sample_type mean] [--seed 10000] [--cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np


def main(argv=None):
    from ppo_tpu import force_platform_from_env

    force_platform_from_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="run folder or state_*.msgpack file (config.json beside it)")
    ap.add_argument("--episodes", type=int, default=None,
                    help="default: the run's num_eval_runs")
    ap.add_argument("--sample_type", default=None,
                    help="override action sampling for beta agents (sample|mean|roach)")
    ap.add_argument("--seed", type=int, default=None, help="default: the run's eval_seed")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from ppo_tpu.algos import ppo
    from ppo_tpu.config import PPOConfig
    from ppo_tpu.envs import VectorEnv, make_env
    from ppo_tpu.train_ppo import build_model
    from ppo_tpu.utils import checkpoint as ckpt

    path, iteration = ckpt.resolve_checkpoint(args.checkpoint)
    if path is None:
        raise FileNotFoundError(f"no checkpoint under {args.checkpoint}")
    cfg_path = os.path.join(os.path.dirname(path), "config.json")
    cfg_json = open(cfg_path).read()
    agent = json.loads(cfg_json).get("agent", "gaussian")

    if agent == "cnn_beta":
        # a train_cnn run: rebuild CNNConfig + Roach agent from its
        # config.json and evaluate offline, the trainer-side analogue of
        # routing episodes through ppo_carla_inference (cpp:95-115)
        from ppo_tpu import train_cnn
        from ppo_tpu.envs.vector import DictVectorEnv
        from ppo_tpu.models import RoachCNNActorCritic

        cfg = train_cnn.CNNConfig.from_json(cfg_json)
        # env fully determined by the run's config.json (image_size etc.),
        # never hardcoded — a future external-env checkpoint must fail loudly
        # here rather than silently eval on the wrong env
        if cfg.external_env:
            raise ValueError(
                "checkpoint was trained against external simulators "
                f"({cfg.external_env}); offline eval has no env to step — "
                "serve it with ppo_tpu.serve instead"
            )
        env = train_cnn.make_cnn_env(cfg)
        venv = DictVectorEnv(env, cfg.num_envs)
        model = RoachCNNActorCritic(
            act_dim=env.act_dim, image_encoder=cfg.image_encoder,
            beta_min_a_b_value=cfg.beta_min_a_b_value,
            compute_dtype=cfg.compute_dtype,
        )
        template = model.init_params(
            jax.random.PRNGKey(0), env.obs_shape, env.n_measurements,
            env.n_value_measurements,
        )
        restored = ckpt.restore_state(path, {"params": template})
        key = jax.random.PRNGKey(args.seed if args.seed is not None else cfg.eval_seed)
        returns = train_cnn.evaluate(
            cfg, venv, model, restored["params"], key,
            num_episodes=args.episodes,
            sample_type=args.sample_type or "mean",
        )
        cfg = dataclasses.replace(cfg, sample_type=args.sample_type or "mean")
    else:
        cfg = PPOConfig.from_json(cfg_json)
        if args.sample_type:
            cfg = dataclasses.replace(cfg, sample_type=args.sample_type)

        env = make_env(cfg.env_id, dtype=jnp.float32, solver_iterations=cfg.solver_iterations,
                       contact_topk=None if cfg.contact_topk < 0 else cfg.contact_topk)
        use_wrappers = cfg.agent == "gaussian"
        venv = VectorEnv(env, cfg.num_envs, clip_actions=True,
                         normalize_obs=use_wrappers, normalize_reward=use_wrappers)
        model = build_model(cfg, env)
        optimizer = ppo.make_optimizer(cfg)
        rs = ppo.init_runner_state(cfg, venv, model, optimizer, jax.random.PRNGKey(0))
        rs = ckpt.restore_state(path, rs)

        key = jax.random.PRNGKey(args.seed if args.seed is not None else cfg.eval_seed)
        returns = ppo.evaluate(
            cfg, venv, model, rs.params, key,
            num_episodes=args.episodes, norm_state=rs.env,
        )
    result = {
        "checkpoint": str(path),
        "iteration": iteration,
        "episodes": len(returns),
        "returns": [round(float(r), 2) for r in returns],
        "mean_return": round(float(np.mean(returns)), 2) if len(returns) else None,
        "sample_type": cfg.sample_type,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
