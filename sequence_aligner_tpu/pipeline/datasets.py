"""Dataset paths and read simulation.

The bundled large bank (amos/c_ruddii.bnk) ships without its RED sequence
``.var`` blob (stripped as a large binary), so the original 32,000 reads are
unrecoverable; ``c_ruddii_reads`` reconstructs an equivalent dataset by
shredding the bundled single-contig genome (amos/c_ruddii.fasta, 159,659 bp)
into an even tiling — the same structure as the golden small dataset
(crp177: 100 bp reads every ~5 bp).  Optional per-base error simulation
exercises the non-exact alignment paths.
"""

from __future__ import annotations

import numpy as np

from sequence_aligner_tpu.core.records import Sequence
from sequence_aligner_tpu.io.fasta import read_fasta

REFERENCE = "/root/reference"
CRP_SEQ = f"{REFERENCE}/amos/small/crp177.seq"
CRP_OVL = f"{REFERENCE}/amos/small/crp177.ovl"
CRP_FASTA = f"{REFERENCE}/amos/small/crp177.fasta"
C_RUDDII_FASTA = f"{REFERENCE}/amos/c_ruddii.fasta"
AMOS_BIN = f"{REFERENCE}/bin"

_BASES = "ACTG"


def shred_genome(
    genome: str,
    n_reads: int,
    read_len: int,
    *,
    error_rate: float = 0.0,
    seed: int = 0,
) -> list[Sequence]:
    """Even tiling of ``genome`` into n_reads reads of read_len bp."""
    g = len(genome)
    if g < read_len:
        raise ValueError("genome shorter than read length")
    starts = np.floor(
        np.arange(n_reads, dtype=np.float64) * (g - read_len) / max(n_reads - 1, 1)
    ).astype(np.int64)
    rng = np.random.RandomState(seed)
    seqs = []
    for i, st in enumerate(starts):
        body = genome[st : st + read_len]
        if error_rate > 0:
            arr = list(body)
            n_err = rng.binomial(read_len, error_rate)
            for p in rng.randint(0, read_len, n_err):
                arr[p] = _BASES[rng.randint(0, 4)]
            body = "".join(arr)
        seqs.append(Sequence(i + 1, body))
    return seqs


def load_genome(path: str = C_RUDDII_FASTA) -> str:
    recs = read_fasta(path)
    return "".join(r.seq for r in recs)


def c_ruddii_reads(
    n_reads: int = 32000, read_len: int = 100, **kw
) -> list[Sequence]:
    """The c_ruddii-scale benchmark dataset (32,000 x 100 bp reads, matching
    the golden bank's RED.ifo object count)."""
    return shred_genome(load_genome(), n_reads, read_len, **kw)


def simulated_reads(
    n_reads: int,
    read_len: int = 100,
    *,
    coverage: float = 8.0,
    error_rate: float = 0.0,
    seed: int = 0,
) -> list[Sequence]:
    """Large-scale simulated dataset (BASELINE configs 4-5): a random
    genome sized for the requested coverage, shredded into n_reads reads.
    Random genomes are repeat-free, so candidate density stays realistic
    as N grows (a repeated real genome would explode k-mer collisions)."""
    rng = np.random.RandomState(seed)
    genome_len = max(int(n_reads * read_len / coverage), read_len + 1)
    genome = "".join(
        _BASES[i] for i in rng.randint(0, 4, genome_len)
    )
    return shred_genome(
        genome, n_reads, read_len, error_rate=error_rate, seed=seed + 1
    )


def write_seq(seqs: list[Sequence], path: str) -> None:
    """Write reads as a .seq/FASTA file consumable by toAmos_new."""
    with open(path, "w") as f:
        for q in seqs:
            f.write(f">r{q.id}\n{q.seq}\n")
