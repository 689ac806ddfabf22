"""First-party TensorBoard event writer.

Replaces the reference's vendored C++ tensorboard_logger
(libs/tensorboard_logger/include/tensorboard_logger.h:88-161): writes TFRecord
event files readable by TensorBoard, with scalar and markdown-text summaries.
Protobuf messages are hand-encoded (wire format) and records framed with masked
CRC32C, so there is no protobuf/tensorboard dependency on the training path.
"""

from __future__ import annotations

import os
import socket
import struct
import time


# ---------------------------------------------------------------------------
# CRC32C (Castagnoli), table-driven; masked per TFRecord spec
# ---------------------------------------------------------------------------

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (0x82F63B78 if _c & 1 else 0)
    _CRC_TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# minimal protobuf wire-format encoding
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    n &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _double(field: int, v: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", v)


def _float(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


def _int64(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(v)


def _scalar_event(tag: str, value: float, step: int, wall_time: float) -> bytes:
    val = _len_delim(1, tag.encode()) + _float(2, value)         # Value{tag, simple_value}
    summary = _len_delim(1, val)                                 # Summary{value}
    return _double(1, wall_time) + _int64(2, step) + _len_delim(5, summary)


def _text_event(tag: str, text: str, step: int, wall_time: float) -> bytes:
    plugin = _len_delim(1, b"text")                              # PluginData{plugin_name}
    metadata = _len_delim(1, plugin)                             # SummaryMetadata{plugin_data}
    dim = _int64(1, 1)                                           # Dim{size:1}
    shape = _len_delim(2, dim)                                   # TensorShapeProto{dim}
    tensor = _int64(1, 7) + _len_delim(2, shape) + _len_delim(8, text.encode())  # DT_STRING
    val = _len_delim(1, tag.encode() + b"/text_summary"[0:0]) + _len_delim(9, metadata) + _len_delim(8, tensor)
    summary = _len_delim(1, val)
    return _double(1, wall_time) + _int64(2, step) + _len_delim(5, summary)


class SummaryWriter:
    """Scalar/text event writer with the standard tfevents file naming."""

    def __init__(self, logdir: str, suffix: str = ""):
        os.makedirs(logdir, exist_ok=True)
        fname = f"events.out.tfevents.{int(time.time())}.{socket.gethostname()}{suffix}"
        self.path = os.path.join(logdir, fname)
        self._f = open(self.path, "ab")
        self._write_event(
            _double(1, time.time()) + _len_delim(3, b"brain.Event:2")  # file_version
        )

    def _write_event(self, event: bytes):
        header = struct.pack("<Q", len(event))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(event)
        self._f.write(struct.pack("<I", _masked_crc(event)))
        self._f.flush()

    def add_scalar(self, tag: str, value: float, step: int):
        self._write_event(_scalar_event(tag, float(value), int(step), time.time()))

    def add_text(self, tag: str, text: str, step: int = 0):
        self._write_event(_text_event(tag, text, int(step), time.time()))

    def close(self):
        self._f.close()


class NullWriter:
    """No-op writer for non-zero ranks (rank-0 logging gating,
    ac_ppo_carla's single-events-file semantics)."""

    path = None

    def add_scalar(self, tag, value, step):
        pass

    def add_text(self, tag, text, step=0):
        pass

    def close(self):
        pass
