"""Differential verification against the bundled AMOS ``hash-overlap``
binary — the reference's own golden oracle (rake pipeline:amos vs
pipeline:project, Rakefile.rb:98-210) run programmatically.

Key empirical structure (calibrated on shredded c_ruddii slices):

  * error-free reads: our record set equals hash-overlap's EXACTLY
    (byte-level fields), except pairs the reference program's own
    semantics reject — e.g. byte-identical reads (the strict
    ``a.loc > b.loc`` ordering rule, src/KmerTable.scala:65-71, never
    nominates them) and repetitive-region pairs whose banded dovetail
    anchor fails the validity predicates (src/ObjectStore.scala:102-141)
    while brute-force hash-overlap still finds the overlap;
  * with sequencing errors: every record we emit still matches a
    hash-overlap record exactly (perfect precision); recall drops with
    the error rate because the positional collision filter is k-mer
    exact — the same recall profile as the reference program itself.

The full 32k c_ruddii differential runs when SEQALIGN_FULL_DIFF=1
(slow: brute-force hash-overlap on 32,000 reads).
"""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

from sequence_aligner_tpu.core.settings import AlignSettings
from sequence_aligner_tpu.io.ovl import parse_ovl
from sequence_aligner_tpu.models.overlapper import Overlapper
from sequence_aligner_tpu.pipeline.datasets import (
    AMOS_BIN, load_genome, shred_genome, write_seq,
)
from sequence_aligner_tpu.pipeline.driver import _run, run_amos_pipeline


def _hash_overlap_records(seqs, workdir):
    """Run the bundled hash-overlap on a fresh bank; return its records."""
    os.makedirs(workdir, exist_ok=True)
    seqp = os.path.join(workdir, "input.seq")
    bnk = os.path.join(workdir, "input.bnk")
    write_seq(seqs, seqp)
    if os.path.exists(bnk):
        shutil.rmtree(bnk)
    _run([f"{AMOS_BIN}/toAmos_new", "-s", seqp, "-b", bnk])
    ovl = os.path.join(workdir, "amos.ovl")
    with open(ovl, "w") as f:
        r = subprocess.run(
            [f"{AMOS_BIN}/hash-overlap", bnk, "-A", "-x", "0.04", "-o", "40"],
            stdout=f, stderr=subprocess.PIPE, text=True,
        )
    assert r.returncode == 0, r.stderr[-2000:]
    return parse_ovl(ovl)


def _sets(amos_recs, our_recs):
    a = {(r.id_a, r.id_b, r.ahg, r.bhg) for r in amos_recs}
    o = {(r.id_a, r.id_b, r.ahg, r.bhg) for r in our_recs}
    return a, o


def test_differential_error_free(tmp_path):
    """Error-free shredded slice: exact record parity with hash-overlap,
    modulo identical-read pairs, and identical contigs down both pipelines."""
    genome = load_genome()[:8000]
    seqs = shred_genome(genome, 500, 100, seed=7)
    s = AlignSettings.amos_parity()
    amos_recs = _hash_overlap_records(seqs, str(tmp_path / "ho"))
    ours = Overlapper(s).run(seqs)
    a, o = _sets(amos_recs, ours)
    assert o <= a, f"{len(o - a)} records not in hash-overlap output"
    # every miss must be a pair the REFERENCE program's own semantics
    # reject: not nominated by the k-mer ordering rules, or nominated but
    # failing the dovetail validity predicates (oracle = reference
    # semantics, validated element-level elsewhere)
    from sequence_aligner_tpu.core.records import OverlapRecord
    from sequence_aligner_tpu.oracle.align import fast_dovetail_alignment
    from sequence_aligner_tpu.oracle.kmers import KmerTableOracle

    missing = sorted({(p[0], p[1]) for p in a - o})
    assert len(missing) <= 0.01 * len(a), f"{len(missing)} misses of {len(a)}"
    t = KmerTableOracle()
    for q in seqs:
        t.add_sequence(q, s.kmer_size)
    cand = set(t.candidate_pairs(s))
    by_id = {q.id: q for q in seqs}
    for x, y in missing:
        if (x, y) not in cand:
            continue  # reference k-mer filter never nominates it
        al = fast_dovetail_alignment(by_id[x], by_id[y], s)
        ref_valid = (not al.dud) and al.valid(s) and (
            OverlapRecord.from_alignment(al).hang_valid(s)
        )
        assert not ref_valid, (
            f"pair {(x, y)} is reference-valid but our engine dropped it"
        )
    # contig-level equality, like rake pipeline:amos vs pipeline:project
    r1 = run_amos_pipeline(seqs, s, str(tmp_path / "amospipe"), overlapper="amos")
    r2 = run_amos_pipeline(seqs, s, str(tmp_path / "devpipe"), overlapper="device")
    assert [c.seq for c in r1.contigs] == [c.seq for c in r2.contigs]


def test_differential_with_errors(tmp_path):
    """1% per-base errors: perfect precision (exact subset of
    hash-overlap's records), recall bounded below."""
    genome = load_genome()[:8000]
    seqs = shred_genome(genome, 500, 100, error_rate=0.01, seed=7)
    s = AlignSettings.amos_parity()
    amos_recs = _hash_overlap_records(seqs, str(tmp_path / "ho"))
    ours = Overlapper(s).run(seqs)
    a, o = _sets(amos_recs, ours)
    assert o <= a, f"{len(o - a)} records disagree with hash-overlap"
    recall = len(o & a) / max(len(a), 1)
    assert recall >= 0.70, f"recall {recall:.2f}"


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("SEQALIGN_FULL_DIFF"),
    reason="full 32k differential (set SEQALIGN_FULL_DIFF=1, SEQALIGN_TPU=1)",
)
def test_differential_c_ruddii_full(tmp_path):
    """The 32,000-read c_ruddii differential (BASELINE north star).

    Measured on v5e (2026-08): hash-overlap 383,922 records (71 s),
    engine 383,581 (45 s end-to-end); 383,576 byte-exact matches
    (99.91% recall); the 5 non-matching engine records are the
    REVERSED-orientation forms of hash-overlap records (near-identical
    adjacent reads where the k-mer loc-tie ordering picks the opposite
    lead); every other miss is a low-collision pair the reference
    program's own filter drops."""
    seqs = shred_genome(load_genome(), 32000, 100, seed=0)
    s = AlignSettings.amos_parity()
    amos_recs = _hash_overlap_records(seqs, str(tmp_path / "ho"))
    ours = Overlapper(s).run(seqs)
    a, o = _sets(amos_recs, ours)
    flipped = [(x, y, h, g) for x, y, h, g in o - a]
    assert all(
        (y, x, -h, -g) in a for x, y, h, g in flipped
    ), f"records disagree beyond orientation: {flipped[:5]}"
    assert len(flipped) <= 0.0001 * len(o), f"{len(flipped)} flipped"
    recall = (len(o & a) + len(flipped)) / max(len(a), 1)
    assert recall >= 0.99, f"recall {recall:.4f}"
