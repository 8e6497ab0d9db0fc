"""FASTA / HOXD / OVL IO tests."""

import numpy as np
import pytest

from tests.conftest import CRP_OVL, CRP_SEQ, HOXD1, HOXD2

from sequence_aligner_tpu.core.records import OverlapRecord
from sequence_aligner_tpu.core.settings import default_hoxd_matrix
from sequence_aligner_tpu.io.fasta import read_fasta
from sequence_aligner_tpu.io.hoxd import read_hoxd
from sequence_aligner_tpu.io.ovl import canonical_sort, parse_ovl, records_equal, write_ovl


def test_read_fasta_crp177(crp_seqs):
    assert len(crp_seqs) == 223
    assert crp_seqs[0].id == 1  # 1-based ordinals (src/BioLibs.scala:26-50)
    assert crp_seqs[-1].id == 223
    assert all(len(q.seq) == 100 for q in crp_seqs)
    assert crp_seqs[0].seq.startswith("ATGAATTTTATTCAAAAAAAAAAATTT")


def test_read_fasta_multiline_and_case(tmp_path):
    p = tmp_path / "x.fasta"
    p.write_text(">a\nacgt\nACGT\n>b\ntttt\n")
    seqs = read_fasta(str(p))
    assert [(q.id, q.seq) for q in seqs] == [(1, "ACGTACGT"), (2, "TTTT")]


def test_read_fasta_invalid(tmp_path):
    p = tmp_path / "bad.fasta"
    p.write_text("ACGT\n")
    with pytest.raises(ValueError):
        read_fasta(str(p))


def test_read_hoxd_wide_matches_default():
    # amos/HOXD1.txt holds the HOXD70 values the default matrix hard-codes
    assert (read_hoxd(HOXD1) == default_hoxd_matrix()).all()


def test_read_hoxd_pair_matches_default():
    # amos/HOXD2.txt: pair format, upper triangle; mirror fills the rest
    assert (read_hoxd(HOXD2) == default_hoxd_matrix()).all()


def test_parse_ovl_golden(golden_records):
    assert len(golden_records) == 2598
    assert golden_records[0] == OverlapRecord(id_a=1, id_b=2, ahg=5, bhg=5)
    assert golden_records[-1] == OverlapRecord(id_a=222, id_b=223, ahg=4, bhg=4)


def test_ovl_roundtrip(tmp_path, golden_records):
    p = tmp_path / "out.ovl"
    n = write_ovl(golden_records, str(p))
    assert n == 2598
    back = parse_ovl(str(p))
    assert records_equal(back, golden_records)
    # golden fixture is already canonically sorted; round-trip is exact bytes
    assert p.read_text() == open(CRP_OVL).read()


def test_stream_scan_and_chunks_native_python_parity():
    """Native mmap chunked encoder and the pure-Python fallback produce
    identical chunk streams, and the scan agrees with read_fasta."""
    import numpy as np

    from sequence_aligner_tpu.io.fasta import read_fasta
    from sequence_aligner_tpu.io.stream import fasta_scan, iter_encoded_chunks

    path = "/root/reference/amos/small/crp177.seq"
    n, l_max = fasta_scan(path)
    seqs = read_fasta(path)
    assert n == len(seqs)
    assert l_max == max(len(q.seq) for q in seqs)
    for native_ok in (True, False):
        chunks = list(iter_encoded_chunks(path, 50, l_max, native_ok=native_ok))
        assert sum(c[0].shape[0] for c in chunks) == n
        assert chunks[-1][0].shape[0] == n % 50 or n % 50 == 0
        got_b = np.concatenate([c[0] for c in chunks])
        got_l = np.concatenate([c[1] for c in chunks])
        from sequence_aligner_tpu.ops.encode import encode_reads

        want_b, want_l = encode_reads(seqs, l_max=l_max)
        assert np.array_equal(got_l, want_l), native_ok
        assert np.array_equal(got_b, want_b), native_ok
