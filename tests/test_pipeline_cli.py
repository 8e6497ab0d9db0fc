"""Full AMOS pipeline + CLI mode tests."""

import subprocess
import sys

import pytest

from tests.conftest import CRP_FASTA, CRP_SEQ

from sequence_aligner_tpu.core.settings import AlignSettings
from sequence_aligner_tpu.io.fasta import read_fasta
from sequence_aligner_tpu.pipeline.datasets import shred_genome, write_seq
from sequence_aligner_tpu.pipeline.driver import run_amos_pipeline


def test_pipeline_crp177_contig_identical(tmp_path):
    """bank -> our overlapper -> transact -> tigger -> consensus -> fasta
    produces the identical golden 1,209 bp contig (Rakefile.rb:164-209)."""
    s = AlignSettings.amos_parity()
    res = run_amos_pipeline(CRP_SEQ, s, str(tmp_path / "pipe"))
    assert res.n_contigs == 1
    assert res.n_overlaps == 2598
    golden = read_fasta(CRP_FASTA)
    assert res.contigs[0].seq == golden[0].seq
    assert set(res.timings) >= {"bank", "overlap", "transact", "tigger",
                                "consensus", "fasta"}


def test_pipeline_amos_oracle_backend(tmp_path):
    """The bundled hash-overlap binary as golden backend (pipeline:amos,
    Rakefile.rb:98-150) assembles the same contig."""
    s = AlignSettings()
    res = run_amos_pipeline(CRP_SEQ, s, str(tmp_path / "amos"), overlapper="amos")
    assert res.n_contigs == 1
    golden = read_fasta(CRP_FASTA)
    assert res.contigs[0].seq == golden[0].seq


def test_shred_roundtrip(tmp_path):
    genome = "".join("ACTG"[i % 4] for i in range(500))
    seqs = shred_genome(genome, 40, 64)
    assert len(seqs) == 40
    assert all(len(q.seq) == 64 for q in seqs)
    assert seqs[0].seq == genome[:64]
    assert seqs[-1].seq == genome[500 - 64 :]
    p = tmp_path / "x.seq"
    write_seq(seqs, str(p))
    back = read_fasta(str(p))
    assert [(q.id, q.seq) for q in back] == [(q.id, q.seq) for q in seqs]


def _cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "sequence_aligner_tpu.cli", *args],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo", "HOME": "/root"},
    )


def test_cli_help():
    r = _cli("--help")
    assert r.returncode == 0
    assert "Modes" in r.stdout


def test_cli_invalid_arg():
    r = _cli("-i", CRP_SEQ, "--no-such-flag")
    assert r.returncode == 1
    assert "Invalid Argument" in r.stdout


def test_cli_missing_input():
    r = _cli("--test-fasta-read")
    assert r.returncode != 0
    assert "No input file specified" in r.stdout


def test_cli_calc_overlaps_golden(tmp_path):
    out = str(tmp_path / "o.ovl")
    r = _cli("-i", CRP_SEQ, "-o", out, "--amos-parity", "--engine", "oracle")
    assert r.returncode == 0, r.stdout + r.stderr
    assert open(out).read() == open(
        "/root/reference/amos/small/crp177.ovl"
    ).read()


def test_cli_test_modes_run():
    r = _cli("-i", CRP_SEQ, "--test-fasta-read")
    assert r.returncode == 0 and "id : 1" in r.stdout
    r = _cli("-i", CRP_SEQ, "--bench-fasta-read")
    assert r.returncode == 0 and "Read 223 sequences" in r.stdout


def test_cli_test_kmer_cover_smoke(tmp_path):
    # small input so the 0..25 sweep stays fast
    p = tmp_path / "t.seq"
    p.write_text(">a\nACGTACGTACGTACGTACGT\n>b\nCGTACGTACGTACGTACGTA\n")
    r = _cli("-i", str(p), "--test-kmer-cover")
    assert r.returncode == 0
    assert "Kmer Size : 12" in r.stdout and "uniques" in r.stdout


def test_cli_dispatch_and_alignment_modes():
    r = _cli("-i", CRP_SEQ, "--test-dispatch-collisions", "--min-collisions", "40")
    assert r.returncode == 0 and "Dispatched Coll" in r.stdout
    r = _cli("-i", CRP_SEQ, "--test-block-dispatch", "--min-collisions", "40")
    assert r.returncode == 0 and "Histogram Of Relations" in r.stdout


def test_cli_bench_align_eight_configs(tmp_path):
    """--bench-align runs the reference's full 8-configuration matrix:
    {quad, linear} x {ST, MT} x {single, block} (src/Project4.scala:469-481)."""
    genome = "".join("ACTGTTGACA"[i % 10] + "ACTG"[(i * 7) % 4] for i in range(300))
    from sequence_aligner_tpu.core.records import Sequence
    from sequence_aligner_tpu.pipeline.datasets import write_seq

    seqs = [Sequence(i + 1, genome[i * 25 : i * 25 + 80]) for i in range(12)]
    p = tmp_path / "b.seq"
    write_seq(seqs, str(p))
    r = _cli("-i", str(p), "--bench-align-quick", "--min-collisions", "1")
    assert r.returncode == 0, r.stdout + r.stderr
    lines = [l for l in r.stdout.splitlines() if l.startswith("Calculated")]
    assert len(lines) == 8, r.stdout
    for algo in ("quadratic", "linear"):
        for thr in ("ST", "MT"):
            for style in ("single", "block"):
                assert any(f"{algo} {thr} {style}" in l for l in lines), (
                    algo, thr, style, lines,
                )


def test_cli_hoxd_matrix_flag(tmp_path):
    out = str(tmp_path / "h.ovl")
    r = _cli("-i", CRP_SEQ, "-o", out, "--amos-parity", "--engine", "oracle",
             "-H", "/root/reference/amos/HOXD1.txt")
    assert r.returncode == 0
    assert open(out).read() == open(
        "/root/reference/amos/small/crp177.ovl"
    ).read()


def test_unlock_bank(tmp_path):
    from sequence_aligner_tpu.pipeline.driver import unlock_bank

    bnk = tmp_path / "x.bnk"
    bnk.mkdir()
    (bnk / "RED.lck").write_text("pid 1234")
    (bnk / "RED.ifo").write_text("____RED BANK____\nlocks = r 1234\nfoo\n")
    n = unlock_bank(str(bnk))
    assert n == 2
    assert not (bnk / "RED.lck").exists()
    assert "locks = \n" in (bnk / "RED.ifo").read_text()
