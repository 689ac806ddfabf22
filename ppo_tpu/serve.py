"""Model inference server — the `ppo_carla_inference` analogue.

Loads EVERY `state*.msgpack` checkpoint in a folder as an ensemble
(ppo_carla_inference.cpp:95-115), serves a socket loop that receives dict
observations and returns the ensemble-mean action / value / alpha / beta
(ppo_carla_inference.cpp:163-179). The requested sample type (deterministic
"mean"/"roach" or stochastic "sample") is sent by the client at handshake
(ppo_carla_inference.cpp:88-90). Unlike the reference's TODO ("parallelize
ensemble"), members are evaluated in ONE batched vmap'd forward.

Protocol (length-prefixed multipart over a unix or TCP socket):
  frame   := uint32 n_parts, then per part: uint64 nbytes + raw bytes
  request := [bev u8 raw, measurements f32 raw, value_measurements f32 raw]
  reply   := [action f32, value f32, alpha f32, beta f32]
  empty request (n_parts == 0) mid-session => route finished
  (ppo_carla_inference.cpp:134-143): the connection closes and the server
  accepts the next route. An empty frame AT HANDSHAKE => server shutdown.
"""

from __future__ import annotations

import argparse
import glob
import os
import socket
import struct

import jax
import jax.numpy as jnp
import numpy as np

from ppo_tpu.models import RoachCNNActorCritic
from ppo_tpu.utils import checkpoint as ckpt


# ---- framing --------------------------------------------------------------

def send_parts(sock, parts):
    sock.sendall(struct.pack("<I", len(parts)))
    for p in parts:
        b = np.asarray(p).tobytes()
        sock.sendall(struct.pack("<Q", len(b)))
        sock.sendall(b)


def recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def recv_parts(sock):
    (n,) = struct.unpack("<I", recv_exact(sock, 4))
    parts = []
    for _ in range(n):
        (ln,) = struct.unpack("<Q", recv_exact(sock, 8))
        parts.append(recv_exact(sock, ln))
    return parts


# ---- ensemble -------------------------------------------------------------

def load_serve_config(folder: str, conf_file: str = ""):
    """Reconstruct the trained architecture like ppo_carla_inference.cpp:66-69:
    read `config.json` (explicit --path_to_conf_file wins, else the checkpoint
    folder's copy written by train_cnn) so a non-default encoder /
    beta_min_a_b_value ensemble is served with the right agent."""
    from ppo_tpu.train_cnn import CNNConfig

    path = conf_file or os.path.join(folder, "config.json")
    if os.path.exists(path):
        with open(path) as f:
            return CNNConfig.from_json(f.read())
    return CNNConfig()


class EnsemblePolicy:
    def __init__(self, folder: str, sample_type: str = "mean", conf_file: str = ""):
        from ppo_tpu.train_cnn import make_cnn_env

        cfg = load_serve_config(folder, conf_file)
        env = make_cnn_env(cfg)  # obs shapes from the run's config.json
        self.env = env
        self.model = RoachCNNActorCritic(
            act_dim=env.act_dim, image_encoder=cfg.image_encoder,
            beta_min_a_b_value=cfg.beta_min_a_b_value,
            compute_dtype=cfg.compute_dtype,
        )
        template = self.model.init_params(
            jax.random.PRNGKey(0), env.obs_shape, env.n_measurements, env.n_value_measurements
        )
        paths = sorted(glob.glob(os.path.join(folder, "state*.msgpack")))
        if not paths:
            raise FileNotFoundError(f"no state*.msgpack checkpoints in {folder}")
        members = []
        for p in paths:
            restored = ckpt.restore_state(p, {"params": template})
            members.append(restored["params"])
        # stack members -> one batched forward over the ensemble axis
        self.params = jax.tree.map(lambda *xs: jnp.stack(xs), *members)
        self.n_members = len(members)
        self.sample_type = sample_type

        def infer(params, bev, meas, vmeas, key):
            def one(p, k):
                return self.model.get_action_and_value(
                    p, bev, meas, vmeas, key=k, sample_type=sample_type
                )

            keys = jax.random.split(key, self.n_members)
            action, _, _, value, alpha, beta = jax.vmap(one)(params, keys)
            return (
                jnp.mean(action, 0), jnp.mean(value, 0),
                jnp.mean(alpha, 0), jnp.mean(beta, 0),
            )

        self._infer = jax.jit(infer)
        self._key = jax.random.PRNGKey(0)

    def __call__(self, bev, measurements, value_measurements):
        self._key, k = jax.random.split(self._key)
        a, v, al, be = self._infer(
            self.params, jnp.asarray(bev), jnp.asarray(measurements),
            jnp.asarray(value_measurements), k,
        )
        return np.asarray(a), np.asarray(v), np.asarray(al), np.asarray(be)


def serve(folder: str, address, conf_file: str = "",
          max_sessions: int | None = None):
    """Accept loop over routes (ppo_carla_inference.cpp:130-143): each
    accepted connection is one route/session — handshake (sample type),
    request loop until an empty frame marks the route finished — then the
    server waits for the next route. An empty frame AT HANDSHAKE shuts the
    server down. Ensemble policies are cached per sample type across
    sessions, so repeated routes skip the checkpoint reload. `max_sessions`
    bounds the loop for scripted use (None = serve forever, like the
    reference's while(true))."""
    from ppo_tpu.train_cnn import make_cnn_env

    env = make_cnn_env(load_serve_config(folder, conf_file))
    if isinstance(address, str):
        sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        if os.path.exists(address):
            os.unlink(address)
    else:
        sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    sock.bind(address)
    sock.listen(4)
    H, W, C = env.obs_shape
    policies: dict[str, EnsemblePolicy] = {}
    sessions = 0
    shutdown = False
    while not shutdown and (max_sessions is None or sessions < max_sessions):
        conn, _ = sock.accept()
        try:
            # handshake: sample type from the eval agent (cpp:88-90);
            # an empty handshake frame is the shutdown signal
            hs = recv_parts(conn)
            if not hs:
                shutdown = True
                continue
            sample_type = hs[0].decode()
            if sample_type not in policies:
                policies[sample_type] = EnsemblePolicy(
                    folder, sample_type, conf_file=conf_file
                )
            policy = policies[sample_type]
            while True:
                parts = recv_parts(conn)
                if not parts:
                    break  # route finished (cpp:134-143) -> next session
                bev = np.frombuffer(parts[0], np.uint8).reshape(-1, H, W, C)
                meas = np.frombuffer(parts[1], np.float32).reshape(-1, env.n_measurements)
                vmeas = np.frombuffer(parts[2], np.float32).reshape(-1, env.n_value_measurements)
                a, v, al, be = policy(bev, meas, vmeas)
                send_parts(conn, [a.astype(np.float32), v.astype(np.float32),
                                  al.astype(np.float32), be.astype(np.float32)])
        except ConnectionError:
            pass  # client vanished mid-route: keep serving the next one
        finally:
            conn.close()
        sessions += 1
    sock.close()


def main(argv=None):
    from ppo_tpu import force_platform_from_env

    force_platform_from_env()
    p = argparse.ArgumentParser()
    p.add_argument("--path_to_conf_file", type=str, default="")
    p.add_argument("--folder", type=str, required=True)
    p.add_argument("--ipc_path", type=str, default="/tmp")
    p.add_argument("--port", type=int, default=0)
    args = p.parse_args(argv)
    if args.port:
        serve(args.folder, ("127.0.0.1", args.port), conf_file=args.path_to_conf_file)
    else:
        serve(args.folder, os.path.join(args.ipc_path, "ppo_tpu_serve.sock"),
              conf_file=args.path_to_conf_file)


if __name__ == "__main__":
    main()
