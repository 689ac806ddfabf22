"""ppo_tpu — a TPU-native actor-learner PPO framework.

A from-scratch JAX/XLA re-design of the capabilities of autonomousvision/ppo.cpp
(reference mounted at /root/reference):

- ``ppo_tpu.ops``      — RL math: distributions, GAE, PPO losses, running statistics.
- ``ppo_tpu.physics``  — pure-JAX vectorized rigid-body physics engine (MJX-style),
                         replacing the reference's C++ MuJoCo binding (gymcpp).
- ``ppo_tpu.envs``     — functional environments (HalfCheetah-v5, Hopper-v5, Ant-v5,
                         Humanoid-v4), vectorized autoreset, wrappers.
- ``ppo_tpu.models``   — actor-critic networks (Gaussian MLP, Beta MLP, Roach CNN).
- ``ppo_tpu.algos``    — PPO / AC-PPO trainers (rollout via lax.scan, overlapped
                         rollout/update pipelining).
- ``ppo_tpu.parallel`` — device-mesh sharding, collectives, distributed utilities.
- ``ppo_tpu.utils``    — TensorBoard event writing, timing, checkpointing, config.
"""

__version__ = "0.1.0"


def force_platform_from_env():
    """Honor JAX_PLATFORMS at CLI entry points even when the device plugin
    clobbers it: this runtime's TPU plugin rewrites jax_platforms to
    'axon,cpu' at interpreter start (sitecustomize register()), so
    `JAX_PLATFORMS=cpu python -m ppo_tpu.train_ppo ...` would silently run
    on the TPU. jax.config.update after import is the override that wins.
    The plugin's own value ('axon', also the ambient env default) is left
    alone so in-process callers (tests forcing CPU via conftest) are not
    fought. Called by every trainer/server main(), not at import time."""
    import os

    want = os.environ.get("JAX_PLATFORMS", "")
    if want and want != "axon":
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:  # backend already initialized: leave it be
            pass
        _warn_on_platform_mismatch(want)


def _warn_on_platform_mismatch(want: str) -> None:
    """If a requested platform did not take effect (backend already
    initialized before the update), say so instead of silently running on the
    accelerator — the exact pitfall .claude/skills/verify documents for
    ad-hoc scripts that import jax before calling us."""
    import jax

    got = jax.default_backend()
    wanted_first = want.split(",")[0]
    # the TPU plugin's platform name is 'axon'; accept 'tpu' as an alias
    aliases = {"tpu": {"tpu", "axon"}}.get(wanted_first, {wanted_first})
    if got not in aliases:
        import sys

        print(
            f"ppo_tpu: JAX_PLATFORMS={want!r} requested but the backend is "
            f"already {got!r} (jax initialized before the override); the run "
            "stays on that backend",
            file=sys.stderr,
        )


def select_platform(device: str, num_envs: int) -> None:
    """Apply the reference's device guidance (README.md:83-84,
    src/ppo_continuous_action.cpp:291-295): tiny-batch MuJoCo configs run on
    host CPU, large lockstep batches on the accelerator. Only ever DOWNGRADES
    to CPU — it never forces the accelerator, so an explicit JAX_PLATFORMS=cpu
    (verification runs) or a test-conftest CPU force is always respected."""
    import os

    if os.environ.get("JAX_PLATFORMS", "") not in ("", "axon"):
        return  # explicit user platform choice wins
    go_cpu = device == "cpu" or (device == "auto" and num_envs < 4)
    if not go_cpu:
        return
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # backend already initialized: leave it be
        pass
    # only warn when CPU was an explicit request; the auto heuristic staying
    # on an already-initialized accelerator is acceptable
    if device == "cpu":
        _warn_on_platform_mismatch("cpu")
