"""External-env training path: config handshake, bridge interop, DD-PPO
preemption end-to-end.

A threaded mock simulator speaks the 8-part protocol of
libs/gymcpp/carla/carla_gym.h:90-137 over the native bridge socket; the CNN
trainer trains real iterations against it through the C++ client
(native/extenv.cc), exercising the handshake (ac_ppo_carla.cpp:105-126),
per-env collector threads, and the preemption truncate/refill semantics
(ac_ppo_continuous_action.cpp:680-722, 805-810).
"""

import json
import socket
import threading
import time

import numpy as np
import pytest

from ppo_tpu.serve import recv_parts, send_parts


class MockSimulator(threading.Thread):
    """One simulator process stand-in: serves a single env socket."""

    def __init__(self, path, obs_shape, n_meas, n_vmeas, act_dim,
                 step_delay=0.0, episode_len=1000):
        super().__init__(daemon=True)
        self.path = path
        self.obs_shape = obs_shape
        self.n_meas, self.n_vmeas, self.act_dim = n_meas, n_vmeas, act_dim
        self.step_delay = step_delay
        self.episode_len = episode_len
        self.got_config = None
        self.n_steps = 0
        self._srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._srv.bind(path)
        self._srv.listen(1)

    def _obs_parts(self, reward=0.0, term=False, trunc=False):
        bev = np.full(self.obs_shape, self.n_steps % 255, np.uint8)
        meas = np.full(self.n_meas, 0.1, np.float32)
        vmeas = np.full(self.n_vmeas, 0.2, np.float32)
        return [
            bev.tobytes(), meas.tobytes(), vmeas.tobytes(),
            np.float32(reward).tobytes(),
            bytes([term]), bytes([trunc]),
            np.int32(self.n_steps).tobytes(), np.int32(0).tobytes(),
        ]

    def run(self):
        conn, _ = self._srv.accept()
        t = 0
        try:
            while True:
                parts = recv_parts(conn)
                if not parts:
                    break
                if parts[0] == b"config":
                    self.got_config = json.loads(parts[1].decode())
                    send_parts(conn, [b"ok"])
                elif parts[0] == b"reset":
                    t = 0
                    send_parts(conn, self._obs_parts())
                else:
                    action = np.frombuffer(parts[0], np.float32)
                    assert action.shape == (self.act_dim,)
                    if self.step_delay:
                        time.sleep(self.step_delay)
                    t += 1
                    self.n_steps += 1
                    term = t >= self.episode_len
                    send_parts(conn, self._obs_parts(reward=float(action.sum()), term=term))
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()
            self._srv.close()


def _run_train(tmp_path, num_envs, extra, sims_delay):
    from ppo_tpu.envs.synthetic_driving import SyntheticDriving
    from ppo_tpu.train_cnn import CNNConfig, train

    env = SyntheticDriving()
    sims, addrs = [], []
    for i in range(num_envs):
        path = str(tmp_path / f"sim{i}.sock")
        sim = MockSimulator(
            path, env.obs_shape, env.n_measurements, env.n_value_measurements,
            env.act_dim, step_delay=sims_delay[i], episode_len=6,
        )
        sim.start()
        sims.append(sim)
        addrs.append(path)

    cfg = CNNConfig(
        num_envs=num_envs, num_steps=8, num_minibatches=2, update_epochs=1,
        total_timesteps=2 * 8 * num_envs, external_env=",".join(addrs),
        exp_folder=str(tmp_path / "runs"), checkpoint_every=0, **extra,
    )
    train(cfg, verbose=False)
    return sims


@pytest.mark.slow
def test_external_training_two_iterations(tmp_path):
    sims = _run_train(tmp_path, num_envs=2, extra={}, sims_delay=[0.0, 0.0])
    for sim in sims:
        # config handshake delivered the full trainer config before reset
        assert sim.got_config is not None
        assert sim.got_config["num_steps"] == 8
        # both envs stepped through both iterations (8 steps each, minus the
        # autoreset interposals)
        assert sim.n_steps >= 10


@pytest.mark.slow
def test_external_training_dd_ppo_preempt(tmp_path):
    """An artificially slowed env gets preempted: the fast env finishes,
    bumps the counter store, and the slow env breaks early — training still
    completes with min_collected_steps < num_steps."""
    import ppo_tpu.parallel.preempt as preempt

    # free port for the store
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    sims = _run_train(
        tmp_path, num_envs=2,
        extra={"use_dd_ppo_preempt": True, "tcp_store_port": port,
               "dd_ppo_preempt_threshold": 0.4, "dd_ppo_min_perc": 0.25},
        sims_delay=[0.0, 0.25],
    )
    fast, slow = sims
    # the slow simulator served fewer steps than requested: preemption fired
    assert slow.n_steps < fast.n_steps
    assert slow.n_steps < 16  # 2 iterations x num_steps would be ~14-16 unpreempted
