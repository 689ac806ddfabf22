"""Synthetic driving environment: the CARLA stand-in CNN stress config.

The reference's CARLA env is an external simulator behind a ZeroMQ bridge
(libs/gymcpp/carla/carla_gym.h) and stays out of scope per BASELINE.json; its
slot is a CNN-policy stress config with synthetic 84x84x3 driving-style
observations. This env is a fully on-device dict-obs task with the same
observation interface as the CARLA pipeline:

  {bev_semantics: u8[H, W, C], measurements: f32[M], value_measurements: f32[V]}

Dynamics: a kinematic bicycle car on a procedurally-curving road. The BEV image
renders road / centerline / car in ego frame; measurements carry speed and
goal-direction features; value_measurements carry privileged progress info
(value-head-only inputs, the CaRL pattern). Reward = forward progress along the
road - lateral deviation cost; termination when off-road. Actions: [steer,
accel] in [-1, 1] through a Beta policy, accel<0 braking, like
carla_model.h:320-334's control convention.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

CHANNELS = 3
N_MEASUREMENTS = 8
N_VALUE_MEASUREMENTS = 4
DT = 0.1
ROAD_HALF_WIDTH = 4.0
MAX_STEPS = 500
WHEELBASE = 2.5
MAX_SPEED = 20.0
PX_PER_M = 1.2


@struct.dataclass
class DrivingState:
    x: jax.Array          # world position
    y: jax.Array
    yaw: jax.Array
    speed: jax.Array
    s: jax.Array          # arc-length progress
    curve_phase: jax.Array
    curve_amp: jax.Array
    t: jax.Array
    key: jax.Array


def _road_center(s, phase, amp):
    """Lateral offset of the road centerline at arc-length s."""
    return amp * jnp.sin(0.02 * s + phase) + 0.5 * amp * jnp.sin(0.0053 * s + 2.0 * phase)


def _road_heading(s, phase, amp):
    d = amp * 0.02 * jnp.cos(0.02 * s + phase) + 0.5 * amp * 0.0053 * jnp.cos(0.0053 * s + 2.0 * phase)
    return jnp.arctan(d)


class SyntheticDriving:
    """Functional env with the CARLA dict-observation interface.

    `image_size` selects the BEV resolution: 84 is the BASELINE stress
    config; 192 matches the Roach encoders' native CARLA input
    (carla_model.h:44-106 are sized for 192x192 BEV). Pixel density scales
    with resolution so both sizes see the same physical field of view.
    """

    n_measurements = N_MEASUREMENTS
    n_value_measurements = N_VALUE_MEASUREMENTS
    act_dim = 2
    action_low = -1.0
    action_high = 1.0
    max_episode_steps = MAX_STEPS

    def __init__(self, dtype=jnp.float32, image_size=84):
        self.dtype = dtype
        self.image_size = int(image_size)
        self.obs_shape = (self.image_size, self.image_size, CHANNELS)
        self.px_per_m = PX_PER_M * (self.image_size / 84.0)

    def reset(self, key):
        key, k1, k2, k3 = jax.random.split(key, 4)
        amp = jax.random.uniform(k1, (), self.dtype, 5.0, 15.0)
        phase = jax.random.uniform(k2, (), self.dtype, 0.0, 6.28)
        lat0 = jax.random.uniform(k3, (), self.dtype, -1.0, 1.0)
        state = DrivingState(
            x=jnp.zeros((), self.dtype), y=_road_center(0.0, phase, amp) + lat0,
            yaw=_road_heading(0.0, phase, amp), speed=jnp.asarray(5.0, self.dtype),
            s=jnp.zeros((), self.dtype), curve_phase=phase, curve_amp=amp,
            t=jnp.zeros((), jnp.int32), key=key,
        )
        return state, self._obs(state)

    # -- rendering ---------------------------------------------------------
    def _obs(self, st: DrivingState):
        dtype = self.dtype
        # ego-frame sample grid: rows ahead of the car, cols lateral
        h = w = self.image_size
        iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(dtype)
        ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(dtype)
        fwd = (h * 0.75 - iy) / self.px_per_m     # meters ahead (+) / behind (-)
        lat = (ix - w / 2) / self.px_per_m        # meters right (+)
        cos_y, sin_y = jnp.cos(st.yaw), jnp.sin(st.yaw)
        wx = st.x + fwd * cos_y - lat * sin_y
        wy = st.y + fwd * sin_y + lat * cos_y
        # road occupancy: |wy - center(wx)| < half width (s ~ x for rendering)
        center = _road_center(wx, st.curve_phase, st.curve_amp)
        dy = wy - center
        road = (jnp.abs(dy) < ROAD_HALF_WIDTH).astype(jnp.uint8) * 128
        lane = (jnp.abs(dy) < 0.3).astype(jnp.uint8) * 255
        car = ((jnp.abs(fwd) < 2.0) & (jnp.abs(lat) < 1.0)).astype(jnp.uint8) * 255
        bev = jnp.stack([road, lane, car], -1)

        heading = _road_heading(st.s, st.curve_phase, st.curve_amp)
        heading_err = st.yaw - heading
        lat_err = st.y - _road_center(st.x, st.curve_phase, st.curve_amp)
        measurements = jnp.stack([
            st.speed / MAX_SPEED,
            jnp.sin(heading_err), jnp.cos(heading_err),
            lat_err / ROAD_HALF_WIDTH,
            jnp.sin(st.yaw), jnp.cos(st.yaw),
            st.curve_amp / 15.0,
            jnp.asarray(1.0, dtype),
        ]).astype(dtype)
        value_measurements = jnp.stack([
            st.s / 1000.0,
            st.t.astype(dtype) / MAX_STEPS,
            st.speed / MAX_SPEED,
            lat_err / ROAD_HALF_WIDTH,
        ]).astype(dtype)
        return {
            "bev_semantics": bev,
            "measurements": measurements,
            "value_measurements": value_measurements,
        }

    # -- dynamics ----------------------------------------------------------
    def step(self, st: DrivingState, action):
        steer = jnp.clip(action[0], -1.0, 1.0) * 0.5           # max steering angle
        accel = jnp.clip(action[1], -1.0, 1.0) * 4.0           # m/s^2; negative = brake
        speed = jnp.clip(st.speed + accel * DT, 0.0, MAX_SPEED)
        yaw = st.yaw + speed / WHEELBASE * jnp.tan(steer) * DT
        x = st.x + speed * jnp.cos(yaw) * DT
        y = st.y + speed * jnp.sin(yaw) * DT
        s = st.s + speed * jnp.cos(yaw - _road_heading(st.s, st.curve_phase, st.curve_amp)) * DT

        lat_err = y - _road_center(x, st.curve_phase, st.curve_amp)
        offroad = jnp.abs(lat_err) > ROAD_HALF_WIDTH
        progress = (s - st.s) / DT / MAX_SPEED
        reward = progress - 0.1 * jnp.abs(lat_err) / ROAD_HALF_WIDTH - 2.0 * offroad.astype(self.dtype)

        t = st.t + 1
        new = DrivingState(
            x=x, y=y, yaw=yaw, speed=speed, s=s,
            curve_phase=st.curve_phase, curve_amp=st.curve_amp, t=t, key=st.key,
        )
        return new, self._obs(new), reward, offroad, t >= MAX_STEPS
