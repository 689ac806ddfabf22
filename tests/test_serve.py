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
    t = threading.Thread(target=serve, args=(str(tmp_path), path),
                         kwargs={"max_sessions": 1})
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
    send_parts(cl, [])  # route finished -> session ends
    cl.close()
    t.join()


def test_serve_config_roundtrip_nondefault_encoder(tmp_path):
    """ppo_carla_inference.cpp:66-69 parity: the server reconstructs the
    trained architecture from the folder's config.json — a roach_ln2 ensemble
    must be served with the roach_ln2 encoder (different param tree)."""
    from ppo_tpu.envs.synthetic_driving import SyntheticDriving
    from ppo_tpu.models import RoachCNNActorCritic
    from ppo_tpu.serve import EnsemblePolicy
    from ppo_tpu.train_cnn import CNNConfig
    from ppo_tpu.utils import checkpoint as ckpt

    env = SyntheticDriving()
    cfg = CNNConfig(image_encoder="roach_ln2", beta_min_a_b_value=2.0)
    model = RoachCNNActorCritic(
        act_dim=env.act_dim, image_encoder=cfg.image_encoder,
        beta_min_a_b_value=cfg.beta_min_a_b_value,
    )
    params = model.init_params(
        jax.random.PRNGKey(0), env.obs_shape, env.n_measurements, env.n_value_measurements
    )
    ckpt.save_state({"params": params}, tmp_path, 0, keep_old=True)
    (tmp_path / "config.json").write_text(cfg.to_json())

    policy = EnsemblePolicy(str(tmp_path), "mean")
    assert policy.model.image_encoder == "roach_ln2"
    assert policy.model.beta_min_a_b_value == 2.0
    B = 2
    a, v, al, be = policy(
        np.zeros((B,) + env.obs_shape, np.uint8),
        np.zeros((B, env.n_measurements), np.float32),
        np.zeros((B, env.n_value_measurements), np.float32),
    )
    assert a.shape == (B, env.act_dim)
    # with the default (wrong) encoder the checkpoint would not even restore:
    with pytest.raises(Exception):
        wrong = RoachCNNActorCritic(act_dim=env.act_dim, image_encoder="roach")
        template = wrong.init_params(
            jax.random.PRNGKey(0), env.obs_shape, env.n_measurements, env.n_value_measurements
        )
        restored = ckpt.restore_state(
            ckpt.resolve_checkpoint(str(tmp_path))[0], {"params": template}
        )
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(a.shape, b.shape),
                     restored["params"], template)


def test_serve_accept_loop_two_sessions(tmp_path):
    """ppo_carla_inference.cpp:130-143 parity: after a route finishes (empty
    frame), the server accepts the NEXT connection instead of exiting."""
    from ppo_tpu.envs.synthetic_driving import SyntheticDriving
    from ppo_tpu.models import RoachCNNActorCritic
    from ppo_tpu.serve import recv_parts, send_parts, serve
    from ppo_tpu.utils import checkpoint as ckpt

    env = SyntheticDriving()
    model = RoachCNNActorCritic(act_dim=env.act_dim)
    params = model.init_params(
        jax.random.PRNGKey(0), env.obs_shape, env.n_measurements, env.n_value_measurements
    )
    ckpt.save_state({"params": params}, tmp_path, 0, keep_old=True)

    path = str(tmp_path / "serve2.sock")
    t = threading.Thread(target=serve, args=(str(tmp_path), path),
                         kwargs={"max_sessions": 2})
    t.start()
    import os, time

    for _ in range(100):
        if os.path.exists(path):
            break
        time.sleep(0.05)

    B = 2
    bev = np.zeros((B,) + env.obs_shape, np.uint8)
    meas = np.zeros((B, env.n_measurements), np.float32)
    vmeas = np.zeros((B, env.n_value_measurements), np.float32)
    replies = []
    for _ in range(2):  # two sequential routes
        cl = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        cl.connect(path)
        send_parts(cl, [b"mean"])
        send_parts(cl, [bev, meas, vmeas])
        replies.append(recv_parts(cl))
        send_parts(cl, [])  # route finished
        cl.close()
    t.join(timeout=30)
    assert not t.is_alive()
    assert len(replies) == 2 and all(len(r) == 4 for r in replies)
    # deterministic "mean" actions: both routes served by the SAME cached
    # ensemble must agree exactly
    np.testing.assert_array_equal(
        np.frombuffer(replies[0][0], np.float32), np.frombuffer(replies[1][0], np.float32)
    )
