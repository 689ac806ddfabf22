"""DD-PPO straggler-preemption counter service (host level).

Re-implementation of the reference's ZeroMQ "TCP store" (include/tcp_store.h):
rank 0 hosts a counter server; collectors increment it when they finish their
rollout and poll it to decide whether to preempt a slow rollout early
(ac_ppo_continuous_action.cpp:680-693). On TPU, per-env stragglers cannot
exist on-chip (lockstep vmap stepping), so the counter is only meaningful
ACROSS HOSTS of a multi-host mesh: a host that finished its iteration bumps
the counter, and slow hosts can truncate their host-side driving loop. Like
the reference, it is off by default (`use_dd_ppo_preempt`, README.md:85-87).

Protocol (length-prefixed single-byte commands over TCP, mirroring
tcp_store.h:33-89): b"i" increment -> returns count, b"r" reset -> 0,
b"g" get -> count.
"""

from __future__ import annotations

import socket
import struct
import threading


class TCPStoreServer:
    """Counter server (rank-0 side), one thread per connection."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._count = 0
        self._lock = threading.Lock()
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self.port = self._sock.getsockname()[1]
        self._sock.listen(32)
        self._running = True
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        while self._running:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            threading.Thread(target=self._handle, args=(conn,), daemon=True).start()

    def _handle(self, conn):
        try:
            while True:
                cmd = conn.recv(1)
                if not cmd:
                    return
                with self._lock:
                    if cmd == b"i":
                        self._count += 1
                    elif cmd == b"r":
                        self._count = 0
                    val = self._count
                conn.sendall(struct.pack("<q", val))
        except OSError:
            pass
        finally:
            conn.close()

    def close(self):
        self._running = False
        try:
            self._sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self._sock.close()


class TCPStoreClient:
    """Counter client (every rank); `get` is cheap enough to poll per step.
    Thread-safe: the host collector's per-env threads share one client
    (the reference gives each env thread its own zmq client; one locked
    socket is equivalent for a counter protocol)."""

    def __init__(self, host: str, port: int):
        self._sock = socket.create_connection((host, port))
        self._lock = threading.Lock()

    def _cmd(self, c: bytes) -> int:
        with self._lock:
            return self._cmd_locked(c)

    def _cmd_locked(self, c: bytes) -> int:
        self._sock.sendall(c)
        buf = b""
        while len(buf) < 8:
            chunk = self._sock.recv(8 - len(buf))
            if not chunk:
                raise ConnectionError("store closed")
            buf += chunk
        return struct.unpack("<q", buf)[0]

    def increment(self) -> int:
        return self._cmd(b"i")

    def reset(self) -> int:
        return self._cmd(b"r")

    def get(self) -> int:
        return self._cmd(b"g")

    def close(self):
        self._sock.close()


def should_preempt(client: TCPStoreClient, num_peers: int, threshold: float) -> bool:
    """ac_ppo_continuous_action.cpp:680-688: preempt when the fraction of
    finished peers (collector threads across all ranks, or hosts for the
    host-level barrier) exceeds the threshold. The min-steps gate is the
    caller's (algos/host_collect.HostCollector._preempt)."""
    return client.get() / max(1, num_peers) > threshold
