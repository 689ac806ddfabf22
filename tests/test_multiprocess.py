"""Multi-process distributed training (real jax.distributed over gRPC).

The reference's multi-GPU story is `mpirun -n N` on one host
(README.md:57-63); SURVEY.md §4 flags "multi-node without a cluster" as the
rebuild's job. This test launches a genuine 2-process jax.distributed CPU
cluster (coordinator rendezvous replacing MPI_Init, cross-process collectives
replacing NCCL) and runs one distributed PPO iteration end to end, asserting
the replicated parameters come out bit-identical on both processes.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "mp_train_worker.py")


pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_training(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # one CPU device per process: the flag would otherwise multiply devices
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    repo_root = os.path.dirname(os.path.dirname(WORKER))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), str(tmp_path)],
            env=env, cwd=os.path.dirname(os.path.dirname(WORKER)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    h0 = (tmp_path / "proc0.txt").read_text().split()
    h1 = (tmp_path / "proc1.txt").read_text().split()
    assert h0[0] == h1[0], "replicated params diverged across processes"
    assert h0[1] == h1[1] == "stats_ok=True"
