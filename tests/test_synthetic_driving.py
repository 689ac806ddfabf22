"""Synthetic driving env: obs interface, dynamics sanity, termination."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.slow  # ~20 s; bf16 numerics, niche for the fast tier
def test_cnn_bf16_compute_matches_f32():
    """compute_dtype=bfloat16 (mixed precision for the MXU) keeps the same
    f32 param tree — checkpoints interchange — and its outputs track the f32
    path within bf16 resolution."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ppo_tpu.envs.synthetic_driving import SyntheticDriving
    from ppo_tpu.models import RoachCNNActorCritic

    env = SyntheticDriving()
    m32 = RoachCNNActorCritic(act_dim=env.act_dim)
    m16 = RoachCNNActorCritic(act_dim=env.act_dim, compute_dtype="bfloat16")
    params = m32.init_params(
        jax.random.PRNGKey(0), env.obs_shape, env.n_measurements, env.n_value_measurements
    )
    # same param tree: the bf16 model restores f32 checkpoints directly
    p16 = m16.init_params(
        jax.random.PRNGKey(0), env.obs_shape, env.n_measurements, env.n_value_measurements
    )
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a.shape, b.shape), params, p16)
    assert all(
        leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(p16)
    ), "bf16 compute must keep f32 params"

    key = jax.random.PRNGKey(1)
    bev = jax.random.randint(key, (4,) + env.obs_shape, 0, 255, jnp.uint8)
    meas = jax.random.normal(key, (4, env.n_measurements), jnp.float32)
    vmeas = jax.random.normal(key, (4, env.n_value_measurements), jnp.float32)
    a32, b32, v32 = m32.apply(params, bev, meas, vmeas)
    a16, b16, v16 = m16.apply(params, bev, meas, vmeas)
    assert v16.dtype == jnp.float32  # heads stay f32
    np.testing.assert_allclose(np.asarray(a16), np.asarray(a32), rtol=0.1, atol=0.1)
    np.testing.assert_allclose(np.asarray(v16), np.asarray(v32), rtol=0.2, atol=0.2)
    assert np.all(np.isfinite(np.asarray(a16))) and np.all(np.isfinite(np.asarray(v16)))
