"""Loader for the native C++ runtime library (builds on demand with make)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB = _NATIVE_DIR / "libppotpu_native.so"
_lib = None


def load(build: bool = True):
    """ctypes handle to libppotpu_native.so, building it if needed."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() and build:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True)
    lib = ctypes.CDLL(str(_LIB))
    lib.tb_open.restype = ctypes.c_void_p
    lib.tb_open.argtypes = [ctypes.c_char_p]
    lib.tb_scalar.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_float, ctypes.c_int64]
    lib.tb_text.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64]
    lib.tb_close.argtypes = [ctypes.c_void_p]
    lib.ee_connect.restype = ctypes.c_int
    lib.ee_connect.argtypes = [ctypes.c_char_p]
    lib.ee_connect_tcp.restype = ctypes.c_int
    lib.ee_connect_tcp.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.ee_send.restype = ctypes.c_int
    lib.ee_send.argtypes = [
        ctypes.c_int, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_char_p),
    ]
    lib.ee_recv_nparts.restype = ctypes.c_int
    lib.ee_recv_nparts.argtypes = [ctypes.c_int]
    lib.ee_recv_part_size.restype = ctypes.c_int64
    lib.ee_recv_part_size.argtypes = [ctypes.c_int]
    lib.ee_recv_part.restype = ctypes.c_int
    lib.ee_recv_part.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_uint64]
    lib.ee_close.argtypes = [ctypes.c_int]
    _lib = lib
    return lib


class NativeSummaryWriter:
    """TB writer backed by the C++ implementation (same API as utils.tb)."""

    def __init__(self, logdir: str):
        import socket
        import time

        os.makedirs(logdir, exist_ok=True)
        self._lib = load()
        path = os.path.join(
            logdir, f"events.out.tfevents.{int(time.time())}.{socket.gethostname()}"
        )
        self.path = path
        self._h = self._lib.tb_open(path.encode())
        if not self._h:
            raise OSError(f"tb_open failed for {path}")

    def add_scalar(self, tag: str, value: float, step: int):
        self._lib.tb_scalar(self._h, tag.encode(), float(value), int(step))

    def add_text(self, tag: str, text: str, step: int = 0):
        self._lib.tb_text(self._h, tag.encode(), text.encode(), int(step))

    def close(self):
        if self._h:
            self._lib.tb_close(self._h)
            self._h = None


class ExternalEnvClient:
    """Native-bridge client for external simulators (carla_gym.h analogue)."""

    def __init__(self, path: str | None = None, host: str | None = None, port: int = 0):
        self._lib = load()
        if path is not None:
            self._fd = self._lib.ee_connect(path.encode())
        else:
            self._fd = self._lib.ee_connect_tcp(host.encode(), port)
        if self._fd < 0:
            raise ConnectionError("external env connect failed")

    def send_parts(self, parts: list[bytes]):
        n = len(parts)
        sizes = (ctypes.c_uint64 * n)(*[len(p) for p in parts])
        bufs = (ctypes.c_char_p * n)(*parts)
        if self._lib.ee_send(self._fd, n, sizes, bufs) != 0:
            raise ConnectionError("ee_send failed")

    def recv_parts(self) -> list[bytes]:
        n = self._lib.ee_recv_nparts(self._fd)
        if n < 0:
            raise ConnectionError("ee_recv_nparts failed")
        out = []
        for _ in range(n):
            size = self._lib.ee_recv_part_size(self._fd)
            buf = ctypes.create_string_buffer(size)
            if self._lib.ee_recv_part(self._fd, buf, size) != 0:
                raise ConnectionError("ee_recv_part failed")
            out.append(buf.raw)
        return out

    def close(self):
        self._lib.ee_close(self._fd)
