"""Core settings / records / scoring unit tests."""

import numpy as np

from sequence_aligner_tpu.core.records import AlignmentResult, OverlapRecord
from sequence_aligner_tpu.core.settings import (
    AlignSettings, BASE_CODE, default_hoxd_matrix, simple_match_matrix,
)


def test_base_code_matches_seqhash_packing():
    # src/ObjectStore.scala:56-59: A=00 C=01 T=10 G=11
    assert BASE_CODE == {"A": 0, "C": 1, "T": 2, "G": 3}


def test_default_hoxd_values():
    m = default_hoxd_matrix()
    s = AlignSettings()
    # spot values from src/BioLibs.scala:122-140 (A/T match 91, C/G match 100)
    assert s.score("A", "A") == 91
    assert s.score("T", "T") == 91
    assert s.score("C", "C") == 100
    assert s.score("G", "G") == 100
    assert s.score("A", "C") == -114
    assert s.score("A", "G") == -31
    assert s.score("A", "T") == -123
    assert s.score("C", "G") == -125
    assert s.score("C", "T") == -31
    assert s.score("G", "T") == -114
    assert (m == m.T).all()  # symmetric


def test_simple_match_matrix():
    m = simple_match_matrix(95, -70)
    assert m[0, 0] == 95 and m[1, 2] == -70


def test_derived_geometry_defaults():
    s = AlignSettings()
    assert np.isclose(s.kmer_head_edge, 0.4)
    assert np.isclose(s.kmer_tail_edge, np.float32(1.0) - np.float32(0.4))
    assert np.isclose(s.kmer_mid_lead_edge, 0.3)
    assert np.isclose(s.kmer_mid_tail_edge, 0.7)


def test_band_width():
    s = AlignSettings()
    # 100bp read, min_identity 0.98 -> floor(2.0000012)+1 = 3, but k=12 wins
    assert s.band_width(100) == 12
    # float32 parity: (1 - 0.98f) * 1000f = 19.99998 -> floor 19 -> 20
    # (float64 would give 20.000000000000018 -> 21)
    assert s.band_width(1000) == 20
    # 0.96f = 0.95999997..., (1-0.96f)*100f = 4.0000021 -> floor 4 -> 5
    assert s.replace(min_identity=0.96, kmer_size=1).band_width(100) == 5


def test_overlap_record_render():
    r = OverlapRecord(id_a=18, id_b=22, ahg=20, bhg=20)
    assert r.render() == "{OVL\nadj:N\nrds:18,22\nscr:0\nahg:20\nbhg:20\n}"


def test_alignment_validity():
    s = AlignSettings()
    # dovetail A upstream of B: starts at B col 0, ends at A's last row
    a = AlignmentResult(
        id_a=1, id_b=2, len_a=100, len_b=100, start=(5, 0), end=(100, 95),
        correct=95, error=0, align_len=95,
    )
    assert a.valid(s)
    o = OverlapRecord.from_alignment(a)
    assert (o.ahg, o.bhg) == (5, 5)
    assert o.hang_valid(s)
    # too-short overlap
    b = AlignmentResult(
        id_a=1, id_b=2, len_a=100, len_b=100, start=(65, 0), end=(100, 35),
        correct=35, error=0, align_len=35,
    )
    assert not b.valid(s)
    # identity below threshold
    c = AlignmentResult(
        id_a=1, id_b=2, len_a=100, len_b=100, start=(5, 0), end=(100, 95),
        correct=90, error=5, align_len=95,
    )
    assert not c.valid(s)
    # hang over max_ignore
    d = AlignmentResult(
        id_a=1, id_b=2, len_a=200, len_b=200, start=(95, 0), end=(200, 105),
        correct=105, error=0, align_len=105,
    )
    assert d.valid(s)
    assert not OverlapRecord.from_alignment(d).hang_valid(s)


def test_bulk_build_matches_constructor():
    """bulk_build bypasses the frozen __init__; its records must be
    indistinguishable from constructor-built ones (ADVICE r3)."""
    rows = [(1, 2, -3, 4), (7, 9, 0, -12)]
    built = OverlapRecord.bulk_build(*map(list, zip(*rows)))
    want = [OverlapRecord(id_a=a, id_b=b, ahg=h, bhg=g) for a, b, h, g in rows]
    assert built == want
    assert all(r.adj == "N" and r.scr == 0 for r in built)
    assert built[0].render() == want[0].render()
