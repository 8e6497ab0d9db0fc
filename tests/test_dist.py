"""Multi-host distributed layer tests: 2 OS processes x 4 virtual CPU
devices each, coordinated via jax.distributed — the CPU stand-in for a
2-host TPU pod (SURVEY.md section 4 implication; the reference has no
multi-node story to copy, this layer is net-new)."""

import os
import socket
import subprocess
import sys

import pytest

CRP_SEQ = "/root/reference/amos/small/crp177.seq"
CRP_OVL = "/root/reference/amos/small/crp177.ovl"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_golden(tmp_path):
    """Two jax.distributed processes produce the golden crp177.ovl
    byte-for-byte through the sharded overlap step."""
    port = _free_port()
    out = tmp_path / "out.ovl"
    procs = []
    logs = []
    for pid in range(2):
        log = open(tmp_path / f"worker{pid}.log", "w")
        logs.append(log)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env["JAX_PLATFORMS"] = "cpu"
        procs.append(subprocess.Popen(
            [
                sys.executable, "-m", "sequence_aligner_tpu.dist.worker",
                "--coordinator", f"127.0.0.1:{port}",
                "--nprocs", "2", "--pid", str(pid),
                "--cpu-devices", "4",
                "-i", CRP_SEQ, "-o", str(out), "--amos-parity",
                "--cap", "cap_head=262144", "--cap", "cap_tail=262144",
                "--cap", "cap_agg=65536", "--cap", "cap_out=8192",
            ],
            env=env, cwd="/root/repo", stdout=log, stderr=log,
        ))
    rcs = [p.wait(timeout=600) for p in procs]
    for log in logs:
        log.close()
    for pid, rc in enumerate(rcs):
        if rc != 0:
            body = open(tmp_path / f"worker{pid}.log").read()[-4000:]
            raise AssertionError(f"worker {pid} rc={rc}\n{body}")
    assert out.read_text() == open(CRP_OVL).read()
