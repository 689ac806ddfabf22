"""Ensemble inference server: checkpoint loading + socket round-trip."""

import socket
import threading

import jax
import numpy as np
import pytest


def test_ensemble_serve_roundtrip(tmp_path):
    from ppo_tpu.envs.synthetic_driving import SyntheticDriving
    from ppo_tpu.models import RoachCNNActorCritic
    from ppo_tpu.serve import recv_parts, send_parts, serve
    from ppo_tpu.utils import checkpoint as ckpt

    env = SyntheticDriving()
    model = RoachCNNActorCritic(act_dim=env.act_dim)
    # two ensemble members
    for seed in (0, 1):
        params = model.init_params(
            jax.random.PRNGKey(seed), env.obs_shape, env.n_measurements, env.n_value_measurements
        )
        ckpt.save_state({"params": params}, tmp_path, seed, keep_old=True)

    path = str(tmp_path / "serve.sock")
    t = threading.Thread(target=serve, args=(str(tmp_path), path), kwargs={"once": True})
    t.start()
    import os, time

    for _ in range(100):
        if os.path.exists(path):
            break
        time.sleep(0.05)
    cl = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    cl.connect(path)
    send_parts(cl, [b"mean"])  # handshake: deterministic sample type

    B = 3
    bev = np.zeros((B,) + env.obs_shape, np.uint8)
    meas = np.zeros((B, env.n_measurements), np.float32)
    vmeas = np.zeros((B, env.n_value_measurements), np.float32)
    send_parts(cl, [bev, meas, vmeas])
    reply = recv_parts(cl)
    assert len(reply) == 4
    action = np.frombuffer(reply[0], np.float32).reshape(B, env.act_dim)
    value = np.frombuffer(reply[1], np.float32)
    assert np.all((action >= -1) & (action <= 1))
    assert value.shape == (B,)
    cl.close()
    t.join()
