"""Headless renderer tests — the stand-in for the reference's GLFW human
render mode (mujoco_env.h:49-79, 110-134): same 640x480 side-view tracking
camera, rasterized offscreen into uint8 RGB frames."""

import numpy as np
import pytest

from ppo_tpu.envs import make_env
from ppo_tpu.envs.render import Renderer, save_gif, SKY


@pytest.mark.parametrize("env_id", ["HalfCheetah-v5", "Hopper-v5", "Ant-v5", "Humanoid-v4"])
def test_render_frame(env_id):
    env = make_env(env_id)
    r = Renderer(env.model)
    frame = r.render(np.asarray(env.model.qpos0))
    assert frame.shape == (480, 640, 3) and frame.dtype == np.uint8
    # sky at the top, ground at the bottom, and some robot pixels in between
    assert np.all(frame[0, 0] == SKY)
    assert not np.all(frame[-1, -1] == SKY)
    n_sky = np.all(frame == SKY, axis=-1).sum()
    n_ground = frame.shape[0] * frame.shape[1] - n_sky
    assert n_ground > 1000
    # geom pixels: something that's neither sky nor the two ground colors
    uniq = {tuple(c) for c in frame.reshape(-1, 3)[:: max(1, frame.size // 30000)]}
    assert len(uniq) >= 3, f"only {uniq}"


def test_render_tracks_root(tmp_path):
    """The camera follows qpos[0] (mujoco_env.h:115-121): translating the
    root slide joint must leave the rendered image (almost) unchanged."""
    env = make_env("HalfCheetah-v5")
    r = Renderer(env.model)
    q0 = np.asarray(env.model.qpos0).copy()
    q1 = q0.copy()
    q1[0] += 7.0  # move forward by a whole number of 1m checker periods
    f0, f1 = r.render(q0), r.render(q1)
    assert np.mean(np.abs(f0.astype(int) - f1.astype(int))) < 1.0

    save_gif([f0, f1], tmp_path / "t.gif", fps=2)
    assert (tmp_path / "t.gif").stat().st_size > 0


@pytest.mark.slow
def test_in_training_gif_dumps(tmp_path):
    """render=human produces periodic train_%09d.gif artifacts DURING
    training (the headless analogue of the reference's every-step GLFW
    window, mujoco_env.h:110-134) plus the final eval.gif — in both the
    sync-PPO and AC-PPO trainers."""
    import dataclasses
    import glob
    import os

    from ppo_tpu.config import PPOConfig
    from ppo_tpu.train_ac_ppo import ACPPOConfig, train as train_ac
    from ppo_tpu.train_ppo import train as train_sync

    common = dict(
        env_id="HalfCheetah-v5", num_envs=2, num_steps=8, num_minibatches=2,
        update_epochs=1, total_timesteps=32, solver_iterations=2,
        num_eval_runs=1, render="human", render_interval=2,
        checkpoint_every=0, exp_folder=str(tmp_path),
    )
    train_sync(PPOConfig(exp_name="viz_sync", **common), verbose=False)
    run = glob.glob(os.path.join(tmp_path, "*viz_sync*"))[0]
    # 2 iterations, interval 2 -> one in-training dump + the final eval gif
    assert os.path.exists(os.path.join(run, "train_000000002.gif"))
    assert os.path.exists(os.path.join(run, "eval.gif"))

    train_ac(ACPPOConfig(exp_name="viz_ac", **common), verbose=False)
    run = glob.glob(os.path.join(tmp_path, "*viz_ac*"))[0]
    assert os.path.exists(os.path.join(run, "train_000000002.gif"))
    assert os.path.exists(os.path.join(run, "eval.gif"))
