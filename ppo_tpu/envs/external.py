"""Trainer-usable external-environment adapter over the native C++ bridge.

The reference trains against a real external simulator through a zmq pair
socket: a JSON config is pushed to each leaderboard process before the env
exists (src/carla/ac_ppo_carla.cpp:105-126), then reset/step exchange 8-part
multipart messages (libs/gymcpp/carla/carla_gym.h:69-137):

  [0] bev_semantics       uint8  [C*H*W]
  [1] measurements        float32[M]
  [2] value_measurements  float32[V]
  [3] reward              float32[1]
  [4] termination         uint8[1] (bool)
  [5] truncation          uint8[1] (bool)
  [6] n_steps             int32[1]   (Roach extras, unused like the reference)
  [7] suggest             int32[1]

This module reproduces that exchange over the framework's native socket
bridge (native/extenv.cc + utils/native.ExternalEnvClient — length-prefixed
multipart over unix/TCP sockets instead of zmq ipc; same message layout).
Deviation from the reference, documented: the config handshake rides the same
socket as the env traffic (first exchange after connect) instead of a separate
`<port>.conf_lock` socket — one connection per env, same ordering guarantee
(config reaches the simulator before the first reset).

Requests are explicit because the transport is not a zmq pair:
  config:  send [b"config", config_json] -> recv [ack]
  reset:   send [b"reset"]               -> recv 8 parts
  step:    send [action float32 raw]     -> recv 8 parts
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class ExtObs(NamedTuple):
    bev_semantics: np.ndarray       # uint8 [H, W, C]
    measurements: np.ndarray        # float32 [M]
    value_measurements: np.ndarray  # float32 [V]


class ExternalEnv:
    """One external simulator instance, reset/step like a gymcpp Environment."""

    def __init__(self, obs_shape, n_measurements, n_value_measurements, act_dim,
                 path=None, host=None, port=0, config_json=None,
                 action_low=-1.0, action_high=1.0):
        from ppo_tpu.utils.native import ExternalEnvClient

        self.obs_shape = tuple(obs_shape)
        self.n_measurements = n_measurements
        self.n_value_measurements = n_value_measurements
        self.act_dim = act_dim
        self.action_low = action_low
        self.action_high = action_high
        self._client = ExternalEnvClient(path=path, host=host, port=port)
        if config_json is not None:
            # config handshake (ac_ppo_carla.cpp:105-126 semantics)
            self._client.send_parts([b"config", config_json.encode()])
            ack = self._client.recv_parts()
            if not ack:
                raise ConnectionError("external env config handshake failed")

    def _decode(self, parts):
        bev = np.frombuffer(parts[0], np.uint8).reshape(self.obs_shape)
        meas = np.frombuffer(parts[1], np.float32).reshape(self.n_measurements)
        vmeas = np.frombuffer(parts[2], np.float32).reshape(self.n_value_measurements)
        reward = float(np.frombuffer(parts[3], np.float32)[0])
        term = bool(parts[4][0])
        trunc = bool(parts[5][0])
        return ExtObs(bev, meas, vmeas), reward, term, trunc

    def reset(self, seed: int = 0):
        """The external simulator owns seeding (carla_gym.h:69: 'CARLA env is
        seeded in the python code'); `seed` is accepted for interface parity."""
        self._client.send_parts([b"reset"])
        obs, _, _, _ = self._decode(self._client.recv_parts())
        return obs

    def step(self, action: np.ndarray):
        a = np.clip(
            np.asarray(action, np.float32).reshape(self.act_dim),
            self.action_low, self.action_high,
        )
        self._client.send_parts([a.tobytes()])
        return self._decode(self._client.recv_parts())

    def close(self):
        self._client.close()
