"""Sharded multi-chip path tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from sequence_aligner_tpu.core.settings import AlignSettings
from sequence_aligner_tpu.parallel.mesh import make_mesh
from sequence_aligner_tpu.parallel.shard import sharded_overlap


def test_sharded_matches_golden(crp_seqs):
    """Hash-prefix all-to-all + pair-key all-to-all + gathered alignment on
    8 devices reproduces the golden crp177.ovl byte-for-byte."""
    s = AlignSettings.amos_parity()
    mesh = make_mesh(8)
    recs = sharded_overlap(
        crp_seqs, s, mesh,
        caps=dict(cap_head=1 << 18, cap_tail=1 << 18, cap_agg=1 << 16,
                  cap_out=1 << 13),
    )
    ours = "".join(r.render() + "\n" for r in recs)
    golden = open("/root/reference/amos/small/crp177.ovl").read()
    assert ours == golden


def test_sharded_capacity_retry(crp_seqs):
    """Undersized capacities must be detected (drop counters) and retried,
    never silently truncated."""
    s = AlignSettings.amos_parity()
    mesh = make_mesh(4)
    recs = sharded_overlap(
        crp_seqs[:60], s, mesh,
        caps=dict(cap_route=64, cap_head=1 << 12, cap_tail=1 << 12,
                  cap_agg=1 << 10, cap_pair_route=256, cap_out=256),
    )
    from sequence_aligner_tpu.models.overlapper import Overlapper

    want = Overlapper(s).run(crp_seqs[:60])
    assert [(r.id_a, r.id_b, r.ahg, r.bhg) for r in recs] == [
        (r.id_a, r.id_b, r.ahg, r.bhg) for r in want
    ]


def test_sharded_mixed_band_widths():
    """Reads of different length classes (distinct band widths) align
    correctly under sharding — one fused pass per width, per-pair select."""
    from sequence_aligner_tpu.core.records import Sequence
    from sequence_aligner_tpu.models.overlapper import Overlapper

    rng = np.random.RandomState(21)
    bases = "ACTG"
    genome = "".join(bases[i] for i in rng.randint(0, 4, 4000))
    seqs = []
    for i in range(24):
        start = 150 * i % 2400
        ln = 400 if i % 3 == 0 else 700  # widths 12 vs 15 (k=12, id=0.98)
        seqs.append(Sequence(i + 1, genome[start : start + ln]))
    s = AlignSettings.amos_parity()
    assert len({s.band_width(len(q.seq)) for q in seqs}) > 1
    mesh = make_mesh(4)
    recs = sharded_overlap(
        seqs, s, mesh,
        caps=dict(cap_head=1 << 16, cap_tail=1 << 16, cap_agg=1 << 13,
                  cap_out=1 << 10),
    )
    want = Overlapper(s).run(seqs)
    assert [(r.id_a, r.id_b, r.ahg, r.bhg) for r in recs] == [
        (r.id_a, r.id_b, r.ahg, r.bhg) for r in want
    ]
    assert recs, "mixed-width dataset produced no overlaps"


def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_default_profile_three_engines(crp_seqs):
    """Reference-default profile (collision band [7, 222],
    src/Project4.scala:104-114): the frozen oracle-generated fixture
    tests/data/crp177_default.ovl pins oracle == device == sharded.
    (The Scala runtime is absent from the reference bundle, so the
    fixture freezes our own oracle's output for this profile.)"""
    import os

    from sequence_aligner_tpu.io.ovl import parse_ovl
    from sequence_aligner_tpu.models.overlapper import Overlapper
    from sequence_aligner_tpu.oracle.overlap import oracle_overlaps

    fixture = os.path.join(
        os.path.dirname(__file__), "data", "crp177_default.ovl"
    )
    want = parse_ovl(fixture)
    assert len(want) == 2388
    s = AlignSettings()  # reference program defaults
    key = lambda recs: [(r.id_a, r.id_b, r.ahg, r.bhg) for r in recs]
    dev = Overlapper(s).run(crp_seqs)
    assert key(dev) == key(want)
    mesh = make_mesh(8)
    shd = sharded_overlap(
        crp_seqs, s, mesh,
        caps=dict(cap_head=1 << 18, cap_tail=1 << 18, cap_agg=1 << 16,
                  cap_out=1 << 13),
    )
    assert key(shd) == key(want)
    orc = oracle_overlaps(crp_seqs, s)
    assert key(sorted(orc, key=lambda r: (r.id_a, r.id_b))) == key(want)


def test_sharded_planned_caps(crp_seqs):
    """No explicit capacities: the driver's plan program sizes the stream
    caps from measured per-device totals and the run must converge with
    zero retries needed (drops only as the net)."""
    from sequence_aligner_tpu.models.overlapper import Overlapper

    s = AlignSettings.amos_parity()
    mesh = make_mesh(8)
    recs = sharded_overlap(crp_seqs[:80], s, mesh)  # caps=None -> plan
    want = Overlapper(s).run(crp_seqs[:80])
    assert [(r.id_a, r.id_b, r.ahg, r.bhg) for r in recs] == [
        (r.id_a, r.id_b, r.ahg, r.bhg) for r in want
    ]
    assert recs


def test_chunked_general_aggregation_matches(crp_seqs):
    """The general-id pairs step with TINY aggregation chunks (BASELINE
    config-5's O(chunk)-memory mode) must produce exactly the candidates
    of the unchunked step: partial counts split at chunk boundaries are
    summed by the pair owner like any cross-device partials."""
    import jax
    import jax.numpy as jnp

    from sequence_aligner_tpu.ops.encode import encode_reads
    from sequence_aligner_tpu.parallel.shard import make_sharded_pairs_step

    s = AlignSettings.amos_parity()
    mesh = make_mesh(8)
    bases, lengths = encode_reads(crp_seqs)
    n = bases.shape[0]
    pad = (-n) % 8
    bases = np.pad(bases, ((0, pad), (0, 0)))
    lengths = np.pad(lengths, (0, pad))
    ids = np.concatenate(
        [np.arange(1, n + 1, dtype=np.int32), np.zeros(pad, np.int32)]
    )
    caps = dict(
        cap_route=1 << 14, cap_head=1 << 17, cap_tail=1 << 17,
        cap_agg=1 << 14, cap_pair_route=1 << 13, cap_out=1 << 11,
    )
    args = (jnp.asarray(bases), jnp.asarray(lengths), jnp.asarray(ids))

    def run(agg_chunk):
        step = make_sharded_pairs_step(
            mesh, s, packed=False, pack_den=0, agg_chunk=agg_chunk, **caps
        )
        lead, trail, n_out, drops = (np.asarray(x) for x in step(*args))
        assert drops.sum() == 0, drops
        got = set()
        for d in range(8):
            lo = d * caps["cap_out"]
            k = int(n_out[d])
            got.update(zip(
                lead[lo : lo + k].tolist(), trail[lo : lo + k].tolist()
            ))
        return got

    whole = run(1 << 26)       # single-piece aggregation
    chunked = run(1 << 15)     # 8 pieces per device
    assert whole == chunked and len(whole) > 1000
