"""Oracle semantics tests, anchored to the golden AMOS fixtures."""

import numpy as np
import pytest

from sequence_aligner_tpu.core.records import Sequence
from sequence_aligner_tpu.core.settings import AlignSettings
from sequence_aligner_tpu.io.ovl import records_equal
from sequence_aligner_tpu.oracle.align import DUD, fast_dovetail_alignment, local_alignment
from sequence_aligner_tpu.oracle.kmers import KmerTableOracle, generate_kmers, seq_hash
from sequence_aligner_tpu.oracle.overlap import build_table, oracle_overlaps


def test_seq_hash_packing():
    # A=00 C=01 T=10 G=11, big-endian shifts (src/ObjectStore.scala:48-67)
    assert seq_hash("A") == 0
    assert seq_hash("C") == 1
    assert seq_hash("T") == 2
    assert seq_hash("G") == 3
    assert seq_hash("AC") == 1
    assert seq_hash("CA") == 4
    assert seq_hash("GGGG") == 0xFF
    # 16 G's fill all 32 bits -> signed -1
    assert seq_hash("G" * 16) == -1
    # only the first 16 bases participate
    assert seq_hash("G" * 16 + "AAAA") == seq_hash("G" * 16)
    # unknown chars behave like 'A'
    assert seq_hash("NN") == 0


def test_generate_kmers_locs():
    s = Sequence(7, "ACGTACGT")  # len 8, k 4 -> 5 kmers, d = 4
    ks = generate_kmers(4, s)
    assert len(ks) == 5
    locs = [loc for _, loc in ks]
    assert locs == [np.float32(i) / np.float32(4) for i in range(5)]
    assert ks[0][0] == seq_hash("ACGT")
    assert ks[1][0] == seq_hash("CGTA")


def test_pair_counting_ordering_rule():
    # two reads overlapping: upstream read's shared kmers sit late (tail edge),
    # downstream read's sit early; lead must be the larger-loc occurrence
    s = AlignSettings(kmer_size=4, min_collisions=1)
    t = KmerTableOracle()
    #         0123456789
    a = Sequence(1, "TTTTTACGTG")  # ACGT at pos 5 -> loc 5/6 (tail edge)
    b = Sequence(2, "CACGTGTTTTTT")  # ACGT at pos 1 -> loc 1/8  (head edge)
    # make the mid occurrence via a third read where ACGT is central
    c = Sequence(3, "TTTACGTTTT")  # ACGT at pos 3 -> loc 3/6 = .5 (middle)
    for q in (a, b, c):
        t.add_sequence(q, 4)
    counts = t.calc_pair_data(s)
    # a(tail) x c(mid): a leads; b(head) x c(mid): c leads (loc .5 > .125)
    assert counts.get((1, 3), 0) >= 1
    assert counts.get((3, 2), 0) >= 1
    assert (3, 1) not in counts
    assert (2, 3) not in counts


def test_self_pairs_skipped():
    s = AlignSettings(kmer_size=2, min_collisions=1)
    t = KmerTableOracle()
    t.add_sequence(Sequence(1, "ATATATATAT"), 2)  # AT everywhere
    assert t.calc_pair_data(s) == {}


def test_local_alignment_perfect_overlap():
    s = AlignSettings()
    rng = np.random.RandomState(42)
    bases = "ACTG"
    genome = "".join(bases[i] for i in rng.randint(0, 4, 104))
    a = Sequence(1, genome[0:64])
    b = Sequence(2, genome[24:88])
    r = local_alignment(a, b, s)
    assert not r.dud
    assert r.start == (24, 0)
    assert r.end == (64, 40)
    assert r.correct == 40 and r.error == 0
    assert r.valid(s)


def test_fast_dovetail_matches_local_on_clean_dovetail():
    s = AlignSettings()
    rng = np.random.RandomState(0)
    bases = "ACTG"
    genome = "".join(bases[i] for i in rng.randint(0, 4, 300))
    a = Sequence(1, genome[0:100])
    b = Sequence(2, genome[30:130])
    rf = fast_dovetail_alignment(a, b, s)
    rl = local_alignment(a, b, s)
    assert not rf.dud
    assert rf.start == rl.start == (30, 0)
    assert rf.end == rl.end == (100, 70)
    assert rf.correct == rl.correct == 70
    assert rf.valid(s) and rl.valid(s)


def test_fast_dovetail_dud_on_unrelated():
    s = AlignSettings()
    a = Sequence(1, "A" * 100)
    b = Sequence(2, "C" * 100)
    r = fast_dovetail_alignment(a, b, s)
    # phase-1 anchor cannot reach B column 0 with positive score
    assert r.dud or not r.valid(s)


def test_dud_never_valid():
    assert not DUD.valid(AlignSettings())


def test_golden_crp177_byte_identical(crp_seqs):
    """The flagship oracle test: AMOS-parity settings reproduce the golden
    crp177.ovl byte-for-byte (2,598 records)."""
    s = AlignSettings.amos_parity()
    recs = oracle_overlaps(crp_seqs, s)
    ours = "".join(r.render() + "\n" for r in recs)
    golden = open("/root/reference/amos/small/crp177.ovl").read()
    assert len(recs) == 2598
    assert ours == golden


def test_reference_default_collision_band_subset(crp_seqs, golden_records):
    """With the reference program's own defaults (collision band [7,222]) the
    emitted set is a strict subset of golden, missing only the
    minimum-length (ahg=60) family — documents the reference behavior."""
    s = AlignSettings()
    recs = oracle_overlaps(crp_seqs, s)
    golden_set = {(r.id_a, r.id_b, r.ahg, r.bhg) for r in golden_records}
    got = {(r.id_a, r.id_b, r.ahg, r.bhg) for r in recs}
    assert got < golden_set
    missing = golden_set - got
    # all dropped records are the minimum-length (ahg 59/60) overlap family
    assert all(m[2] >= 59 for m in missing)
    assert len(missing) == 210
