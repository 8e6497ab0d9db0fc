"""Full AMOS assembly pipeline driver.

Replicates the reference's Rake pipeline orchestration
(``Rakefile.rb:164-209``): bank creation -> overlap (our engine) ->
bank-transact -> tigger -> make-consensus -> bank2fasta, with per-stage
wall-clock timing (:197-208).  The heavy assembly stages stay external C++
binaries exactly as in the reference (SURVEY.md section 2.3).
"""

from __future__ import annotations

import dataclasses
import os
import shutil
import subprocess
import time

from sequence_aligner_tpu.core.records import Sequence
from sequence_aligner_tpu.core.settings import AlignSettings
from sequence_aligner_tpu.io.fasta import read_fasta
from sequence_aligner_tpu.io.ovl import write_ovl
from sequence_aligner_tpu.pipeline.datasets import AMOS_BIN, write_seq


@dataclasses.dataclass
class PipelineResult:
    contigs: list[Sequence]
    timings: dict[str, float]
    workdir: str
    n_overlaps: int

    @property
    def n_contigs(self) -> int:
        return len(self.contigs)


def unlock_bank(bank_dir: str) -> int:
    """Clear stale AMOS bank locks (the reference ships a Perl
    ``bank-unlock`` for this, amos/bank-unlock:36-60): removes ``*.lck``
    files and strips the ``locks = ...`` line content in ``*.ifo``
    headers.  Returns the number of locks cleared."""
    import glob
    import re

    n = 0
    for lck in glob.glob(os.path.join(bank_dir, "*.lck")):
        os.remove(lck)
        n += 1
    for ifo in glob.glob(os.path.join(bank_dir, "*.ifo")):
        text = open(ifo).read()
        new = re.sub(r"(?m)^(locks = ).+$", r"\1", text)
        if new != text:
            open(ifo, "w").write(new)
            n += 1
    return n


def _run(cmd: list[str], **kw) -> None:
    r = subprocess.run(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, **kw
    )
    if r.returncode != 0:
        raise RuntimeError(
            f"pipeline stage failed ({' '.join(cmd)}):\n{r.stdout[-2000:]}"
        )


def run_amos_pipeline(
    seqs: list[Sequence] | str,
    settings: AlignSettings,
    workdir: str,
    *,
    overlapper: str = "device",
    amos_bin: str = AMOS_BIN,
    keep_workdir: bool = True,
) -> PipelineResult:
    """Run the full assembly; overlapper in {'device', 'oracle', 'sharded',
    'amos'} ('amos' uses the bundled hash-overlap as the golden oracle,
    like the reference's pipeline:amos task, Rakefile.rb:98-150)."""
    os.makedirs(workdir, exist_ok=True)
    seq_path = os.path.join(workdir, "input.seq")
    bnk = os.path.join(workdir, "input.bnk")
    ovl = os.path.join(workdir, "input.ovl")
    fst = os.path.join(workdir, "input.fasta")
    if isinstance(seqs, str):
        shutil.copy(seqs, seq_path)
        seqs = read_fasta(seq_path)
    else:
        write_seq(seqs, seq_path)
    if os.path.exists(bnk):
        shutil.rmtree(bnk)

    timings: dict[str, float] = {}
    t0 = time.time()
    _run([f"{amos_bin}/toAmos_new", "-s", seq_path, "-b", bnk])
    timings["bank"] = time.time() - t0

    n_overlaps = 0
    t0 = time.time()
    if overlapper == "amos":
        _run([f"{amos_bin}/hash-overlap", bnk, "-B", "-x", "0.04", "-o", "40"])
        timings["overlap"] = time.time() - t0
    else:
        if overlapper == "oracle":
            from sequence_aligner_tpu.oracle.overlap import oracle_overlaps

            records = oracle_overlaps(seqs, settings)
        elif overlapper == "sharded":
            from sequence_aligner_tpu.parallel.shard import sharded_overlap

            records = sharded_overlap(seqs, settings)
        else:
            from sequence_aligner_tpu.models.overlapper import Overlapper

            records = Overlapper(settings).run(seqs)
        n_overlaps = write_ovl(records, ovl)
        timings["overlap"] = time.time() - t0
        t0 = time.time()
        _run([f"{amos_bin}/bank-transact", "-b", bnk, "-m", ovl])
        timings["transact"] = time.time() - t0

    t0 = time.time()
    _run([f"{amos_bin}/tigger", "-b", bnk])
    timings["tigger"] = time.time() - t0

    t0 = time.time()
    _run([f"{amos_bin}/make-consensus", "-e", "0.04", "-o", "40", "-B", "-b", bnk])
    timings["consensus"] = time.time() - t0

    t0 = time.time()
    with open(fst, "w") as f:
        r = subprocess.run(
            [f"{amos_bin}/bank2fasta", "-b", bnk], stdout=f,
            stderr=subprocess.PIPE, text=True,
        )
    if r.returncode != 0:
        raise RuntimeError(f"bank2fasta failed:\n{r.stderr[-2000:]}")
    timings["fasta"] = time.time() - t0

    contigs = read_fasta(fst)
    res = PipelineResult(
        contigs=contigs, timings=timings, workdir=workdir, n_overlaps=n_overlaps
    )
    if not keep_workdir:
        shutil.rmtree(workdir)
    return res
