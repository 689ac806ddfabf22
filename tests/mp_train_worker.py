"""Worker for tests/test_multiprocess.py: one process of a 2-process
jax.distributed CPU cluster running a real distributed PPO iteration.

This is the actual multi-host code path (gRPC rendezvous + cross-process
collectives) — the TPU-native equivalent of the reference's
`mpirun -n N ac_ppo_continuous_action` (README.md:57-63) exercised without
a pod, per SURVEY.md §4's "multi-node without a cluster" gap.

Usage: python mp_train_worker.py <process_id> <num_processes> <coord_port> <out_dir>
"""

import hashlib
import pathlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, port, out_dir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    # form the cross-process (gloo) collective context while the processes are
    # still in lockstep — the first heavy jit can skew them past the 30 s
    # rendezvous window otherwise
    multihost_utils.sync_global_devices("startup")

    from ppo_tpu.algos import ppo
    from ppo_tpu.config import PPOConfig
    from ppo_tpu.envs import VectorEnv, make_env
    from ppo_tpu.models import GaussianActorCritic
    from ppo_tpu.parallel import dp

    n_dev = jax.device_count()
    assert n_dev == nproc, (n_dev, nproc)
    cfg = PPOConfig(
        env_id="HalfCheetah-v5", num_envs=n_dev * 2, num_steps=4,
        num_minibatches=2, update_epochs=1, total_timesteps=n_dev * 16,
        solver_iterations=3,
    )
    mesh = dp.make_mesh(n_dev)
    env = make_env(cfg.env_id, dtype=jnp.float32, solver_iterations=cfg.solver_iterations)
    venv_g = VectorEnv(env, cfg.num_envs, normalize_obs=True, normalize_reward=True)
    venv_l = VectorEnv(env, cfg.num_envs // n_dev, normalize_obs=True, normalize_reward=True)
    model = GaussianActorCritic(act_dim=env.act_dim)
    optimizer = ppo.make_optimizer(cfg)

    # same seed on every process == the reference's rank-0 param broadcast
    rs, specs = dp.init_distributed_runner_state(
        cfg, venv_g, model, optimizer, jax.random.PRNGKey(0), mesh
    )
    run = dp.make_distributed_train_iteration(cfg, venv_l, model, optimizer, mesh)
    rs2, out = jax.jit(lambda r: run(r, specs))(rs)
    jax.block_until_ready(rs2.params)

    # every process hashes its local view of the replicated params
    leaves = jax.tree.leaves(rs2.params)
    h = hashlib.sha256()
    for leaf in leaves:
        local = np.asarray(leaf.addressable_data(0))
        assert np.all(np.isfinite(local))
        h.update(local.tobytes())
    stats_ok = np.isfinite(float(out.stats.total_loss.addressable_data(0)))

    # multi-process checkpointing: every process gathers, process 0 writes,
    # everyone restores the same bytes (rank-0 semantics, ac_ppo...cpp:904-926)
    from jax.experimental import multihost_utils

    from ppo_tpu.utils import checkpoint as ckpt

    path = ckpt.save_state(rs2, pathlib.Path(out_dir, "ckpt"), 1)
    multihost_utils.sync_global_devices("ckpt_written")
    assert path.is_file(), path
    template = multihost_utils.process_allgather(rs2, tiled=True)
    restored = ckpt.restore_state(path, template)
    for a, b in zip(jax.tree.leaves(template.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # RESUME under data parallelism (ADVICE round 1): the restored host-numpy
    # runner state must be routed back onto the mesh via put_global, then
    # training continues — one more distributed iteration from the restored
    # state, finite and hash-identical across processes
    rs3 = dp.put_global(restored, specs, mesh)
    rs4, out2 = jax.jit(lambda r: run(r, specs))(rs3)
    jax.block_until_ready(rs4.params)
    h2 = hashlib.sha256()
    for leaf in jax.tree.leaves(rs4.params):
        local = np.asarray(leaf.addressable_data(0))
        assert np.all(np.isfinite(local))
        h2.update(local.tobytes())
    assert int(jax.device_get(rs4.iteration.addressable_data(0)).ravel()[0]) == 2

    pathlib.Path(out_dir, f"proc{pid}.txt").write_text(
        f"{h.hexdigest()} stats_ok={stats_ok} resume={h2.hexdigest()}\n"
    )
    print(f"proc {pid}: {h.hexdigest()[:16]} resume {h2.hexdigest()[:16]} ok", flush=True)


if __name__ == "__main__":
    main()
