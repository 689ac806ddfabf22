"""Native C++ library: TB writer round-trip + external-env bridge interop."""

import os
import socket
import struct
import threading

import numpy as np
import pytest

pytest.importorskip("ctypes")


def test_native_tb_writer_readable(tmp_path):
    from ppo_tpu.utils.native import NativeSummaryWriter

    w = NativeSummaryWriter(str(tmp_path))
    w.add_text("hyperparameters", "|a|b|")
    for i in range(4):
        w.add_scalar("charts/native", 2.0 * i, i)
    w.close()

    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    acc = EventAccumulator(str(tmp_path))
    acc.Reload()
    ev = acc.Scalars("charts/native")
    assert [e.step for e in ev] == [0, 1, 2, 3]
    np.testing.assert_allclose([e.value for e in ev], [0, 2, 4, 6])
    assert "hyperparameters" in acc.Tags()["tensors"]


def test_extenv_bridge_interop(tmp_path):
    """C++ client <-> Python mock simulator over the multipart protocol."""
    from ppo_tpu.serve import recv_parts, send_parts
    from ppo_tpu.utils.native import ExternalEnvClient

    path = str(tmp_path / "env.sock")
    obs = np.arange(12, dtype=np.float32)

    def mock_server():
        srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        srv.bind(path)
        srv.listen(1)
        conn, _ = srv.accept()
        # reset request
        parts = recv_parts(conn)
        assert parts[0] == b"reset"
        send_parts(conn, [obs.tobytes()])
        # step request: echo action back as reward
        parts = recv_parts(conn)
        action = np.frombuffer(parts[0], np.float32)
        send_parts(conn, [obs.tobytes(), np.float32(action.sum()).tobytes(), b"\x00", b"\x01"])
        conn.close()
        srv.close()

    t = threading.Thread(target=mock_server)
    t.start()
    import time

    for _ in range(50):
        if os.path.exists(path):
            break
        time.sleep(0.02)
    client = ExternalEnvClient(path=path)
    client.send_parts([b"reset"])
    (obs_bytes,) = client.recv_parts()
    np.testing.assert_array_equal(np.frombuffer(obs_bytes, np.float32), obs)

    action = np.array([0.5, -0.25], np.float32)
    client.send_parts([action.tobytes()])
    reply = client.recv_parts()
    assert len(reply) == 4
    np.testing.assert_allclose(np.frombuffer(reply[1], np.float32)[0], 0.25)
    assert reply[2] == b"\x00" and reply[3] == b"\x01"
    client.close()
    t.join()
