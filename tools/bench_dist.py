#!/usr/bin/env python
"""2-process jax.distributed datapoint (VERDICT r4 #9): 8k reads over a
2-process x 4-virtual-CPU-device mesh, with sharded_overlap's coarse
stage timing (SEQALIGN_DIST_TIMING) and a byte-parity assert against the
single-device engine.  Emits DIST_BENCH_r5.json.

This measures the process-spanning mesh's real overhead — the
jax.distributed DCN-path coordination plus the driver's
process_allgather host round trips — as numbers, not an unknown.
Env: DIST_READS (8000).
"""

import json
import os
import re
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_READS = int(os.environ.get("DIST_READS", "8000"))


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def main():
    import tempfile

    from sequence_aligner_tpu.pipeline.datasets import c_ruddii_reads

    seqs = c_ruddii_reads(n_reads=N_READS, read_len=100)
    tmp = tempfile.mkdtemp(prefix="distbench")
    seq_path = os.path.join(tmp, "reads.seq")
    with open(seq_path, "w") as f:
        for q in seqs:
            f.write(f">r{q.id}\n{q.seq}\n")

    port = free_port()
    out_path = os.path.join(tmp, "out.ovl")
    procs, logs = [], []
    t0 = time.time()
    for pid in range(2):
        log_path = os.path.join(tmp, f"worker{pid}.log")
        logs.append(log_path)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["SEQALIGN_DIST_TIMING"] = "1"
        procs.append(subprocess.Popen(
            [
                sys.executable, "-m", "sequence_aligner_tpu.dist.worker",
                "--coordinator", f"127.0.0.1:{port}",
                "--nprocs", "2", "--pid", str(pid),
                "--cpu-devices", "4", "--amos-parity",
                "-i", seq_path, "-o", out_path,
            ],
            cwd=REPO, env=env,
            stderr=open(log_path, "w"), stdout=subprocess.DEVNULL,
        ))
    rcs = [p.wait(timeout=3600) for p in procs]
    wall = time.time() - t0
    assert rcs == [0, 0], (rcs, open(logs[0]).read()[-2000:])
    timing = None
    for lp in logs:
        m = re.search(r"# sharded_overlap timing (\{.*\})", open(lp).read())
        if m:
            timing = json.loads(m.group(1))
            break
    assert timing, "no timing line found"

    # byte-parity vs the single-device engine on the same input
    from sequence_aligner_tpu.core.settings import AlignSettings
    from sequence_aligner_tpu.io.ovl import write_ovl
    from sequence_aligner_tpu.models.overlapper import Overlapper

    ref_path = os.path.join(tmp, "ref.ovl")
    recs = Overlapper(AlignSettings.amos_parity()).run(seqs)
    write_ovl(recs, ref_path)
    same = open(out_path).read() == open(ref_path).read()
    out = dict(
        metric="dist_2proc_overlap_8k_cpu",
        n_reads=N_READS,
        n_processes=2,
        devices_per_process=4,
        backend="cpu (jax.distributed simulation of a 2-host pod)",
        wall_s_including_startup=round(wall, 2),
        sharded_overlap_timing_s=timing,
        byte_identical_vs_single_device=bool(same),
        note=(
            "stage timing from process 0: 'plan'/'pairs'/'align_dispatch' "
            "include compile + the cross-process allgather host round "
            "trips (parallel/shard.py sharded_overlap); wall includes "
            "2-process jax.distributed startup."
        ),
    )
    assert same, "2-process output differs from single-device engine"
    with open(os.path.join(REPO, "DIST_BENCH_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
