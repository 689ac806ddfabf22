"""Stepping->training gap attribution (VERDICT r3 weak #4).

The flagship stepping rate is ~1.1M env-steps/s but the FULL training
iteration at 2048x32 (4 minibatches x 2 epochs, the bench_scaling.py config)
ran at ~646k in round 3. This harness times the iteration's phases as
separately-jitted stages with the fetch-sync discipline of bench.py, plus two
update variants, to attribute the gap:

  collect        rollout scan (policy fwd + physics + wrappers)
  gae            reverse-scan advantage computation
  update         epochs x minibatches SGD, randperm GATHER minibatching
  update_nogather same, but each epoch pre-permutes the batch ONCE and scans
                 contiguous reshaped slices (same math: a uniform random
                 partition into minibatches either way)
  full           the production monolithic train_iteration (algos/ppo.py)

Prints one JSON line per row. Run on the real chip.
"""

import json
import os
import statistics
import time

import jax
import jax.numpy as jnp
import optax


def _fetch(x):
    return float(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def _time(fn, args, reps=5, chain=None):
    """Median seconds of fn(*args); `chain` maps the previous output to the
    next call's args so reps cannot overlap on the async runtime."""
    out = fn(*args)
    _fetch(out)
    times = []
    for _ in range(reps):
        if chain is not None:
            args = chain(out, args)
        t0 = time.perf_counter()
        out = fn(*args)
        _fetch(out)
        times.append(time.perf_counter() - t0)
    return statistics.median(times), out


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from ppo_tpu.algos import ac_ppo, ppo
    from ppo_tpu.config import PPOConfig
    from ppo_tpu.envs import VectorEnv, make_env
    from ppo_tpu.models import GaussianActorCritic
    from ppo_tpu.ops.gae import compute_gae
    from ppo_tpu.ops.ppo_loss import normalize_advantages, ppo_losses

    cfg = PPOConfig(
        env_id="HalfCheetah-v5", num_envs=2048, num_steps=32,
        num_minibatches=4, update_epochs=2, total_timesteps=10**9,
        solver_iterations=4,
    )
    env = make_env(cfg.env_id, dtype=jnp.float32, solver_iterations=cfg.solver_iterations)
    venv = VectorEnv(env, cfg.num_envs, normalize_obs=True, normalize_reward=True)
    model = GaussianActorCritic(act_dim=env.act_dim)
    optimizer = ppo.make_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    rs = ppo.init_runner_state(cfg, venv, model, optimizer, key)
    steps_per_iter = cfg.num_envs * cfg.num_steps

    rows = []

    # ---- full production iteration ---------------------------------------
    full = jax.jit(ppo.make_train_iteration(cfg, venv, model, optimizer))
    dt, _ = _time(lambda r: full(r)[0], (rs,), chain=lambda out, a: (out,))
    rows.append({"phase": "full", "ms": round(dt * 1e3, 2),
                 "env_steps_per_s": round(steps_per_iter / dt)})

    # ---- collect ----------------------------------------------------------
    collect = jax.jit(ac_ppo.make_collect_fn(cfg, venv, model))
    c_args = (rs.params, rs.env, rs.obs, rs.done, key)
    dt_c, c_out = _time(
        lambda *a: collect(*a), c_args,
        chain=lambda out, a: (a[0], out[0], out[1], out[2], out[3]),
    )
    rows.append({"phase": "collect", "ms": round(dt_c * 1e3, 2),
                 "env_steps_per_s": round(steps_per_iter / dt_c)})
    rollout = c_out[4]

    # ---- gae --------------------------------------------------------------
    @jax.jit
    def gae_only(params, rollout):
        next_value = model.get_value(params, rollout.next_obs)
        adv, ret = compute_gae(
            rollout.rewards, rollout.values, rollout.dones, next_value,
            rollout.next_done.astype(rollout.values.dtype), cfg.gamma, cfg.gae_lambda,
        )
        return adv, ret

    dt_g, _ = _time(lambda p, r: gae_only(p, r), (rs.params, rollout))
    rows.append({"phase": "gae", "ms": round(dt_g * 1e3, 2)})

    # ---- update (production: gather minibatching) -------------------------
    update = jax.jit(ac_ppo.make_update_fn(cfg, model, optimizer))
    dt_u, _ = _time(
        lambda p, o, r, k: update(p, o, r, k), (rs.params, rs.opt_state, rollout, key),
        chain=lambda out, a: (out[0], out[1], a[2], a[3]),
    )
    rows.append({"phase": "update_gather", "ms": round(dt_u * 1e3, 2)})

    # ---- update variant: permute-once-per-epoch, contiguous slices --------
    def make_update_nogather():
        def update2(params, opt_state, rollout, key):
            next_value = model.get_value(params, rollout.next_obs)
            advantages, returns = compute_gae(
                rollout.rewards, rollout.values, rollout.dones, next_value,
                rollout.next_done.astype(rollout.values.dtype), cfg.gamma, cfg.gae_lambda,
            )
            B = cfg.num_steps * cfg.num_envs
            b = (
                rollout.obs.reshape(B, -1), rollout.actions.reshape(B, -1),
                rollout.logprobs.reshape(B), advantages.reshape(B),
                returns.reshape(B), rollout.values.reshape(B),
            )
            mb = B // cfg.num_minibatches

            def update_mb(carry, mbatch):
                params, opt_state = carry
                b_obs, b_act, b_logp, b_adv, b_ret, b_val = mbatch

                def loss_fn(p):
                    _, newlogprob, entropy, newvalue = model.get_action_and_value(
                        p, b_obs, action=b_act
                    )
                    adv = normalize_advantages(b_adv)
                    stats = ppo_losses(
                        newlogprob, b_logp, entropy, newvalue, b_val, adv, b_ret,
                        cfg.clip_coef, cfg.ent_coef, cfg.vf_coef, cfg.clip_vloss,
                    )
                    return stats.total_loss, stats

                grads, stats = jax.grad(loss_fn, has_aux=True)(params)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state), stats

            def epoch(carry, k):
                # ONE gather of the whole batch per epoch; minibatches are
                # then contiguous reshape slices — same distribution as
                # per-minibatch index gathers (uniform random partition)
                inds = jax.random.permutation(k, B)
                bp = jax.tree.map(
                    lambda x: x[inds].reshape((cfg.num_minibatches, mb) + x.shape[1:]), b
                )
                return jax.lax.scan(update_mb, carry, bp)

            (params, opt_state), stats = jax.lax.scan(
                epoch, (params, opt_state), jax.random.split(key, cfg.update_epochs)
            )
            return params, opt_state, jax.tree.map(lambda x: x[-1, -1], stats)

        return update2

    update_ng = jax.jit(make_update_nogather())
    dt_u2, _ = _time(
        lambda p, o, r, k: update_ng(p, o, r, k), (rs.params, rs.opt_state, rollout, key),
        chain=lambda out, a: (out[0], out[1], a[2], a[3]),
    )
    rows.append({"phase": "update_nogather", "ms": round(dt_u2 * 1e3, 2)})

    # ---- full iteration with donation (production CLI path) ---------------
    full_don = jax.jit(ppo.make_train_iteration(cfg, venv, model, optimizer),
                       donate_argnums=(0,))
    rs2 = ppo.init_runner_state(cfg, venv, model, optimizer, jax.random.PRNGKey(1))
    dt_d, _ = _time(lambda r: full_don(r)[0], (rs2,), chain=lambda out, a: (out,))
    rows.append({"phase": "full_donated", "ms": round(dt_d * 1e3, 2),
                 "env_steps_per_s": round(steps_per_iter / dt_d)})

    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
