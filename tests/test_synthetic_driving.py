"""Synthetic driving env: obs interface, dynamics sanity, termination."""

import jax
import jax.numpy as jnp
import numpy as np

from ppo_tpu.envs.synthetic_driving import SyntheticDriving


def test_obs_interface():
    env = SyntheticDriving()
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["bev_semantics"].shape == env.obs_shape
    assert obs["bev_semantics"].dtype == jnp.uint8
    assert obs["measurements"].shape == (env.n_measurements,)
    assert obs["value_measurements"].shape == (env.n_value_measurements,)
    # road and car visible in the render
    bev = np.asarray(obs["bev_semantics"])
    assert (bev[..., 0] > 0).any(), "road channel empty"
    assert (bev[..., 2] > 0).any(), "car channel empty"


def test_forward_progress_reward():
    env = SyntheticDriving()
    state, _ = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    total = 0.0
    for _ in range(20):
        # accelerate straight along the road heading
        state, obs, r, term, trunc = step(state, jnp.asarray([0.0, 1.0]))
        total += float(r)
        if bool(term):
            break
    assert total > 0.0, f"straight driving should earn progress, got {total}"


def test_offroad_terminates():
    env = SyntheticDriving()
    state, _ = env.reset(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    terminated = False
    for _ in range(200):
        # hard constant steering drives off the road
        state, obs, r, term, trunc = step(state, jnp.asarray([1.0, 1.0]))
        if bool(term):
            terminated = True
            break
    assert terminated, "hard steering should leave the road"
