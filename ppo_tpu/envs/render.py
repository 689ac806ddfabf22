"""Headless software renderer — the TPU-native stand-in for the reference's
GLFW "human" render mode (libs/gymcpp/mujoco/mujoco_env.h:49-79, 110-134).

The reference opens a 640x480 GLFW window with a tracking camera fixed at
lookat = (qpos[0], qpos[1], 0.5), distance 5, azimuth 90 (side view),
elevation 0 (mujoco_env.h:110-126). TPU hosts are headless, so the
equivalent surface here is offscreen: the same camera, rasterized on the
host into uint8 RGB frames (PIL painter's algorithm over projected geoms)
that can be saved as PNG/GIF. Physics stays on device; rendering pulls only
qpos, runs FK on the CPU backend, and never touches the accelerator.

CLI (rolls out a policy from a checkpoint and writes a GIF):
    python -m ppo_tpu.envs.render --env_id HalfCheetah-v5 \
        [--checkpoint runs/.../model_final.msgpack] --steps 200 --out roll.gif
"""

from __future__ import annotations

import functools

import numpy as np

from ppo_tpu.physics.types import PLANE, SPHERE, CAPSULE, BOX

WIDTH, HEIGHT = 640, 480          # GLFW window size (mujoco_env.h:56)
CAM_DISTANCE = 5.0                # mujoco_env.h:123
CAM_HEIGHT = 0.5                  # lookat z (mujoco_env.h:121)
FOVY_DEG = 45.0                   # mjVISUAL default global fovy
SKY = np.array([235, 243, 250], np.uint8)
GROUND_A = np.array([150, 136, 120], np.uint8)
GROUND_B = np.array([132, 120, 106], np.uint8)


def _convex_hull(pts):
    """Andrew's monotone chain; pts [n,2] -> hull vertex list (ccw)."""
    pts = sorted(set(map(tuple, np.round(pts, 3))))
    if len(pts) <= 2:
        return list(pts)

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(p)
        return out

    lower, upper = half(pts), half(pts[::-1])
    return lower[:-1] + upper[:-1]


class Renderer:
    """Side-view tracking-camera renderer for one physics model."""

    def __init__(self, model, width: int = WIDTH, height: int = HEIGHT):
        self.m = model
        self.width, self.height = width, height
        self.focal = 0.5 * height / np.tan(0.5 * np.deg2rad(FOVY_DEG))
        self._fk = None  # lazy: jitted CPU-backend kinematics

    # -- geometry ----------------------------------------------------------
    def _kinematics(self, qpos: np.ndarray):
        """geom world poses from qpos, on the CPU backend (no TPU dispatch)."""
        import jax

        cpu = jax.local_devices(backend="cpu")[0]
        if self._fk is None:
            from ppo_tpu.physics.smooth import kinematics

            def fk(q):
                kin = kinematics(self.m, q)
                return kin.geom_xpos, kin.geom_xmat

            with jax.default_device(cpu):
                self._fk = jax.jit(fk)
        with jax.default_device(cpu):
            xpos, xmat = self._fk(np.asarray(qpos, np.float32))
        return np.asarray(xpos), np.asarray(xmat)

    def _camera(self, qpos: np.ndarray):
        """Camera basis replicating mujoco_env.h:115-125: lookat follows
        (qpos[0], qpos[1], 0.5); azimuth 90 / elevation 0 => the camera sits
        at lookat - (0, distance, 0) looking along +y, x right, z up."""
        lookat = np.array([float(qpos[0]), float(qpos[1]), CAM_HEIGHT])
        eye = lookat - np.array([0.0, CAM_DISTANCE, 0.0])
        fwd = np.array([0.0, 1.0, 0.0])
        right = np.array([1.0, 0.0, 0.0])
        up = np.array([0.0, 0.0, 1.0])
        return eye, fwd, right, up

    def _project(self, pts, eye, fwd, right, up):
        """World [n,3] -> (pixel [n,2], depth [n])."""
        rel = np.atleast_2d(pts) - eye
        depth = rel @ fwd
        z = np.maximum(depth, 1e-3)
        x = (rel @ right) / z * self.focal + self.width / 2.0
        y = self.height / 2.0 - (rel @ up) / z * self.focal
        return np.stack([x, y], -1), depth

    # -- rasterization -----------------------------------------------------
    def render(self, qpos: np.ndarray) -> np.ndarray:
        """One frame: uint8 RGB [height, width, 3]."""
        from PIL import Image, ImageDraw

        m = self.m
        xpos, xmat = self._kinematics(qpos)
        eye, fwd, right, up = self._camera(qpos)

        img = Image.new("RGB", (self.width, self.height), tuple(SKY))
        draw = ImageDraw.Draw(img)
        self._draw_ground(draw, eye, fwd, right, up)

        order = np.argsort(-((xpos - eye) @ fwd))  # painter: far -> near
        for g in order:
            gtype = int(m.geom_type[g])
            if gtype == PLANE:
                continue  # drawn as ground
            rgba = m.geom_rgba[g]
            color = tuple(int(255 * c) for c in rgba[:3])
            edge = tuple(int(178 * c) for c in rgba[:3])
            size = m.geom_size[g]
            p, R = xpos[g], xmat[g]
            if gtype == SPHERE:
                self._draw_sphere(draw, p, size[0], color, edge, eye, fwd, right, up)
            elif gtype == CAPSULE:
                a = p - R[:, 2] * size[1]
                b = p + R[:, 2] * size[1]
                self._draw_capsule(draw, a, b, size[0], color, edge, eye, fwd, right, up)
            elif gtype == BOX:
                self._draw_box(draw, p, R, size, color, edge, eye, fwd, right, up)
        return np.asarray(img, np.uint8)

    def _draw_ground(self, draw, eye, fwd, right, up):
        """z=0 plane: horizon fill + 1 m checker strips for motion cues."""
        pix, _ = self._project(np.array([[eye[0], eye[1] + CAM_DISTANCE, 0.0]]),
                               eye, fwd, right, up)
        horizon = int(np.clip(pix[0, 1], 0, self.height))
        draw.rectangle([0, horizon, self.width, self.height], fill=tuple(GROUND_A))
        # checker strips: world-x stripes projected at the lookat depth
        x0 = np.floor(eye[0] - 12)
        for k in range(26):
            xa, xb = x0 + k, x0 + k + 0.5
            pts = np.array([[xa, eye[1] + CAM_DISTANCE, 0.0],
                            [xb, eye[1] + CAM_DISTANCE, 0.0]])
            pp, _ = self._project(pts, eye, fwd, right, up)
            if pp[1, 0] < 0 or pp[0, 0] > self.width:
                continue
            draw.rectangle([pp[0, 0], horizon, pp[1, 0], self.height],
                           fill=tuple(GROUND_B))

    def _draw_sphere(self, draw, p, r, color, edge, eye, fwd, right, up):
        pix, depth = self._project(p[None], eye, fwd, right, up)
        rp = r / max(float(depth[0]), 1e-3) * self.focal
        x, y = pix[0]
        draw.ellipse([x - rp, y - rp, x + rp, y + rp], fill=color, outline=edge)

    def _draw_capsule(self, draw, a, b, r, color, edge, eye, fwd, right, up):
        pix, depth = self._project(np.stack([a, b]), eye, fwd, right, up)
        ra = r / max(float(depth[0]), 1e-3) * self.focal
        rb = r / max(float(depth[1]), 1e-3) * self.focal
        (xa, ya), (xb, yb) = pix
        d = np.array([xb - xa, yb - ya])
        n = np.linalg.norm(d)
        if n > 1e-6:
            perp = np.array([-d[1], d[0]]) / n
            quad = [tuple(np.array([xa, ya]) + perp * ra),
                    tuple(np.array([xb, yb]) + perp * rb),
                    tuple(np.array([xb, yb]) - perp * rb),
                    tuple(np.array([xa, ya]) - perp * ra)]
            draw.polygon(quad, fill=color, outline=edge)
        draw.ellipse([xa - ra, ya - ra, xa + ra, ya + ra], fill=color, outline=edge)
        draw.ellipse([xb - rb, yb - rb, xb + rb, yb + rb], fill=color, outline=edge)

    def _draw_box(self, draw, p, R, size, color, edge, eye, fwd, right, up):
        signs = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                          for sz in (-1, 1)], float)
        corners = p + (signs * size[:3]) @ R.T
        pix, _ = self._project(corners, eye, fwd, right, up)
        hull = _convex_hull(pix)
        if len(hull) >= 3:
            draw.polygon([tuple(v) for v in hull], fill=color, outline=edge)

    def render_trajectory(self, qpos_traj) -> list[np.ndarray]:
        return [self.render(q) for q in np.asarray(qpos_traj)]


def save_gif(frames, path: str, fps: int = 25) -> None:
    from PIL import Image

    ims = [Image.fromarray(np.asarray(f)) for f in frames]
    ims[0].save(path, save_all=True, append_images=ims[1:],
                duration=int(1000 / fps), loop=0)


def main(argv=None):
    import argparse

    import jax
    import jax.numpy as jnp

    from ppo_tpu.envs import make_env

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--env_id", default="HalfCheetah-v5")
    ap.add_argument("--checkpoint", default=None,
                    help="model checkpoint to roll out (random actions if omitted)")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="rollout.gif")
    ap.add_argument("--fps", type=int, default=25)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    env = make_env(args.env_id, dtype=jnp.float32)
    consts = env.consts
    policy = None
    if args.checkpoint:
        import os

        from ppo_tpu.algos import ppo
        from ppo_tpu.config import PPOConfig
        from ppo_tpu.envs import VectorEnv
        from ppo_tpu.train_ppo import build_model
        from ppo_tpu.utils import checkpoint as ckpt

        path, _ = ckpt.resolve_checkpoint(args.checkpoint)
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {args.checkpoint}")
        cfg_path = os.path.join(os.path.dirname(path), "config.json")
        cfg = PPOConfig.from_json(open(cfg_path).read())
        venv = VectorEnv(env, cfg.num_envs,
                         normalize_obs=cfg.agent == "gaussian",
                         normalize_reward=cfg.agent == "gaussian")
        model = build_model(cfg, env)
        optimizer = ppo.make_optimizer(cfg)
        rs = ppo.init_runner_state(cfg, venv, model, optimizer, jax.random.PRNGKey(0))
        rs = ckpt.restore_state(path, rs)
        params = rs.params
        rms = rs.env.obs_rms

        def policy(obs, key):
            o = obs
            if rms is not None:  # training normalizer, env-0 statistics
                o = jnp.clip((o - rms.mean[0]) / jnp.sqrt(rms.var[0] + 1e-4), -10, 10)
            o = o.astype(jnp.float32)
            return model.get_action_and_value(params, o[None], key)[0][0]

    key = jax.random.PRNGKey(args.seed)
    key, rk = jax.random.split(key)
    reset = jax.jit(env.reset)
    step = jax.jit(env.step)
    state, obs = reset(rk, consts)
    traj = [np.asarray(state.qpos)]
    for _ in range(args.steps):
        key, ak = jax.random.split(key)
        if policy is None:
            action = jax.random.uniform(
                ak, (env.act_dim,), minval=env.action_low, maxval=env.action_high
            )
        else:
            action = policy(obs, ak)
        state, obs, _, term, trunc = step(state, action, consts)
        traj.append(np.asarray(state.qpos))
        if bool(term) or bool(trunc):
            key, rk = jax.random.split(key)
            state, obs = reset(rk, consts)

    frames = Renderer(env.model).render_trajectory(np.stack(traj))
    save_gif(frames, args.out, args.fps)
    print(f"wrote {len(frames)} frames to {args.out}")


if __name__ == "__main__":
    main()
