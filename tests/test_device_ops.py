"""Device-op parity tests: jitted ops vs the NumPy oracle, element-level."""

import numpy as np
import jax.numpy as jnp
import pytest

from sequence_aligner_tpu.core.records import Sequence
from sequence_aligner_tpu.core.settings import AlignSettings
from sequence_aligner_tpu.io.fasta import read_fasta
from sequence_aligner_tpu.models.overlapper import Overlapper
from sequence_aligner_tpu.ops.align_fused import fast_dovetail_batch_fused
from sequence_aligner_tpu.ops.align_lax import local_align_batch
from sequence_aligner_tpu.ops.encode import decode_read, encode_reads, pack_2bit, unpack_2bit
from sequence_aligner_tpu.ops.kmer import kmer_scan
from sequence_aligner_tpu.oracle.align import fast_dovetail_alignment, local_alignment
from sequence_aligner_tpu.oracle.kmers import KmerTableOracle


def _random_reads(rng, n, length, genome_len=2000):
    bases = "ACTG"
    genome = "".join(bases[i] for i in rng.randint(0, 4, genome_len))
    seqs = []
    for i in range(n):
        start = rng.randint(0, genome_len - length)
        body = list(genome[start : start + length])
        # sprinkle ~1% errors
        for _ in range(max(1, length // 100)):
            p = rng.randint(0, length)
            body[p] = bases[rng.randint(0, 4)]
        seqs.append(Sequence(i + 1, "".join(body)))
    return seqs


def test_encode_roundtrip():
    seqs = [Sequence(1, "ACTGACTGAC"), Sequence(2, "GGGG")]
    bases, lengths = encode_reads(seqs)
    assert bases.shape == (2, 10)
    assert lengths.tolist() == [10, 4]
    assert decode_read(bases[0], 10) == "ACTGACTGAC"
    assert decode_read(bases[1], 4) == "GGGG"
    words = pack_2bit(bases)
    back = unpack_2bit(words, 10)
    assert (back == bases).all()


def test_kmer_scan_matches_oracle(crp_seqs):
    s = AlignSettings()
    bases, lengths = encode_reads(crp_seqs)
    ids = np.arange(1, len(crp_seqs) + 1, dtype=np.int32)
    occ = kmer_scan(jnp.asarray(bases), jnp.asarray(lengths), jnp.asarray(ids), s.kmer_size)
    t = KmerTableOracle()
    for q in crp_seqs:
        t.add_sequence(q, s.kmer_size)
    oracle = sorted(
        (h, rid, float(np.float32(loc)))
        for h, lst in t.kmer_data.items()
        for (rid, loc) in lst
    )
    hm, rm, lm, vm = (np.asarray(occ[k]) for k in ("hash", "read_id", "loc", "valid"))
    dev = sorted(
        (int(hm[i]), int(rm[i]), float(lm[i])) for i in np.nonzero(vm)[0]
    )
    assert dev == oracle


def test_candidate_pairs_match_oracle(crp_seqs):
    s = AlignSettings.amos_parity()
    ov = Overlapper(s)
    bases, lengths = encode_reads(crp_seqs)
    occ = ov._occurrences(bases, lengths)
    lead, trail = ov._candidates(occ, bases, lengths)
    t = KmerTableOracle()
    for q in crp_seqs:
        t.add_sequence(q, s.kmer_size)
    assert sorted(zip(lead.tolist(), trail.tolist())) == t.candidate_pairs(s)


def _batch_align(seqs, pairs, s, *, dovetail=True):
    bases, lengths = encode_reads(seqs)
    a_idx = np.asarray([a - 1 for a, _ in pairs])
    b_idx = np.asarray([b - 1 for _, b in pairs])
    kw = dict(
        cm=jnp.asarray(s.cost_matrix), gO=s.gap_open, gE=s.gap_extend,
        min_identity=jnp.float32(s.min_identity),
        min_overlap=jnp.int32(s.min_overlap),
        max_ignore=jnp.int32(s.max_ignore),
        la_max=bases.shape[1], lb_max=bases.shape[1],
    )
    if dovetail:
        w = s.band_width(int(lengths[a_idx].max()))
        kwf = dict(kw)
        kwf.pop("cm")
        return fast_dovetail_batch_fused(
            jnp.asarray(bases[a_idx]), jnp.asarray(lengths[a_idx]),
            jnp.asarray(bases[b_idx]), jnp.asarray(lengths[b_idx]),
            cm_tuple=tuple(int(x) for x in s.cost_matrix.reshape(-1)),
            width=w, pblk=64, **kwf,
        )
    return local_align_batch(
        jnp.asarray(bases[a_idx]), jnp.asarray(lengths[a_idx]),
        jnp.asarray(bases[b_idx]), jnp.asarray(lengths[b_idx]),
        **kw,
    )


def _check_pairs(seqs, pairs, s, *, dovetail):
    res = _batch_align(seqs, pairs, s, dovetail=dovetail)
    by_id = {q.id: q for q in seqs}
    oracle_fn = fast_dovetail_alignment if dovetail else local_alignment
    for n, (a, b) in enumerate(pairs):
        o = oracle_fn(by_id[a], by_id[b], s)
        dev_dud = bool(res["dud"][n])
        assert dev_dud == o.dud, (a, b)
        if o.dud:
            assert not bool(res["valid"][n])
            continue
        got = (
            int(res["start_i"][n]), int(res["start_j"][n]),
            int(res["end_i"][n]), int(res["end_j"][n]),
            int(res["correct"][n]), int(res["error"][n]),
            int(res["align_len"][n]),
        )
        want = (*o.start, *o.end, o.correct, o.error, o.align_len)
        assert got == want, (a, b, got, want)
        want_valid = o.valid(s)
        from sequence_aligner_tpu.core.records import OverlapRecord

        want_ovl = want_valid and OverlapRecord.from_alignment(o).hang_valid(s)
        assert bool(res["align_valid"][n]) == want_valid, (a, b)
        assert bool(res["valid"][n]) == want_ovl, (a, b)


def test_dovetail_batch_matches_oracle_random():
    rng = np.random.RandomState(3)
    seqs = _random_reads(rng, 40, 100)
    pairs = [(a, b) for a in range(1, 41) for b in range(1, 41) if a != b]
    rng.shuffle(pairs)
    _check_pairs(seqs, pairs[:120], AlignSettings(), dovetail=True)


def test_local_batch_matches_oracle_random():
    rng = np.random.RandomState(4)
    seqs = _random_reads(rng, 16, 80)
    pairs = [(a, b) for a in range(1, 17) for b in range(1, 17) if a != b]
    rng.shuffle(pairs)
    _check_pairs(seqs, pairs[:40], AlignSettings(), dovetail=False)


def test_dovetail_batch_mixed_lengths():
    rng = np.random.RandomState(5)
    bases = "ACTG"
    genome = "".join(bases[i] for i in rng.randint(0, 4, 1000))
    seqs = [
        Sequence(1, genome[0:120]),
        Sequence(2, genome[40:140]),
        Sequence(3, genome[80:230]),
        Sequence(4, genome[100:180]),
    ]
    pairs = [(1, 2), (2, 3), (3, 4), (1, 4), (2, 4)]
    # note: all lead reads here share band width 12 (k dominates)
    _check_pairs(seqs, pairs, AlignSettings(), dovetail=True)


def test_long_reads_end_to_end():
    """Assignment-scale read lengths (~1000 bp, final_project.pdf p.1):
    wider bands (w=21), longer DP loops, multi-width bucketing — engine
    output must equal the oracle end-to-end."""
    from sequence_aligner_tpu.oracle.overlap import oracle_overlaps

    rng = np.random.RandomState(17)
    bases = "ACTG"
    genome = "".join(bases[i] for i in rng.randint(0, 4, 12000))
    seqs = []
    for i in range(20):
        start = 80 * i  # hang 80 < max_ignore 90
        ln = 1000 if i % 2 == 0 else 640
        body = list(genome[start : start + ln])
        for _ in range(ln // 200):  # ~0.5% errors
            p = rng.randint(0, ln)
            body[p] = bases[rng.randint(0, 4)]
        seqs.append(Sequence(i + 1, "".join(body)))
    # widened hang limit: mixed 640/1000 bp reads legitimately produce
    # |bhg| ~ len_b - len_a (the defaults target ~100 bp reads)
    s = AlignSettings.amos_parity(max_ignore=500)
    assert s.band_width(1000) == 20  # float32 (1-0.98)*1000 rounds down
    got = Overlapper(s).run(seqs)
    want = oracle_overlaps(seqs, s)
    assert [(r.id_a, r.id_b, r.ahg, r.bhg) for r in got] == [
        (r.id_a, r.id_b, r.ahg, r.bhg) for r in want
    ]
    assert got, "long-read dataset produced no overlaps"


def test_device_end_to_end_golden(crp_seqs):
    """Flagship device test: full jitted pipeline reproduces the golden
    crp177.ovl byte-for-byte."""
    ov = Overlapper(AlignSettings.amos_parity())
    recs = ov.run(crp_seqs)
    ours = "".join(r.render() + "\n" for r in recs)
    golden = open("/root/reference/amos/small/crp177.ovl").read()
    assert ours == golden
    assert ov.stats.n_valid == 2598


def test_device_end_to_end_quadratic(crp_seqs, golden_records):
    """The quadratic (full SW) path matches the SW oracle end-to-end and is
    a superset of golden: full SW accepts reversed-direction overlaps
    (negative hangs) that the dovetail phase-1 anchor duds out."""
    from sequence_aligner_tpu.oracle.overlap import oracle_overlaps

    s = AlignSettings.amos_parity()
    ov = Overlapper(s, fast_dovetail=False)
    recs = ov.run(crp_seqs)
    want = oracle_overlaps(crp_seqs, s, fast_dovetail=False)
    assert [
        (r.id_a, r.id_b, r.ahg, r.bhg) for r in recs
    ] == [(r.id_a, r.id_b, r.ahg, r.bhg) for r in want]
    got = {(r.id_a, r.id_b) for r in recs}
    assert {(r.id_a, r.id_b) for r in golden_records} <= got
    extra = got - {(r.id_a, r.id_b) for r in golden_records}
    assert len(extra) == 37  # reversed-direction overlaps SW keeps


def test_candidate_pairs_repeat_heavy_tiers():
    """Repeat-rich reads force the multi-tier row grouping; device counts
    must still match the oracle exactly."""
    rng = np.random.RandomState(11)
    bases = "ACTG"
    genome = "".join(bases[i] for i in rng.randint(0, 4, 400))
    seqs = []
    for i in range(24):
        start = (i * 12) % 280
        seqs.append(Sequence(i + 1, genome[start : start + 120]))
    # poly-A monsters: huge per-read raw expansion (row tier escalation)
    seqs.append(Sequence(25, "A" * 120))
    seqs.append(Sequence(26, "A" * 60 + genome[:60]))
    s = AlignSettings(kmer_size=8, min_collisions=1, max_collisions=10**6)
    ov = Overlapper(s)
    from sequence_aligner_tpu.ops.encode import encode_reads as enc

    bases_arr, lengths = enc(seqs)
    occ = ov._occurrences(bases_arr, lengths)
    lead, trail = ov._candidates(occ, bases_arr, lengths)
    t = KmerTableOracle()
    for q in seqs:
        t.add_sequence(q, s.kmer_size)
    assert sorted(zip(lead.tolist(), trail.tolist())) == t.candidate_pairs(s)


@pytest.mark.parametrize("packed", [False, True])
def test_candidate_pairs_count_values_match_oracle(crp_seqs, packed):
    """Not just the pair set: the collision counts themselves must match
    (both aggregation paths: packed single-sort and 2-pass stable)."""
    s = AlignSettings.amos_parity()
    ov = Overlapper(s)
    from sequence_aligner_tpu.ops.encode import encode_reads as enc

    bases, lengths = enc(crp_seqs[:64])
    occ = ov._occurrences(bases, lengths)
    from sequence_aligner_tpu.ops.pairgen import candidate_pairs_stream

    out = candidate_pairs_stream(
        occ,
        head_edge=jnp.float32(s.kmer_head_edge),
        tail_edge=jnp.float32(s.kmer_tail_edge),
        mid_lead=jnp.float32(s.kmer_mid_lead_edge),
        mid_tail=jnp.float32(s.kmer_mid_tail_edge),
        min_collisions=jnp.int32(1), max_collisions=jnp.int32(10**9),
        cap_head=1 << 16, cap_tail=1 << 16, cap_out=1 << 15,
        packed_ids=packed,
    )
    assert not bool(out["overflow"])
    k = int(out["n_out"])
    got = {
        (int(out["lead"][i]), int(out["trail"][i])): int(out["count"][i])
        for i in range(k)
    }
    t = KmerTableOracle()
    for q in crp_seqs[:64]:
        t.add_sequence(q, s.kmer_size)
    want = t.calc_pair_data(s)
    assert got == dict(want)


def test_pallas_end_to_end_golden(crp_seqs):
    """Fused engine reproduces the golden crp177.ovl byte-for-byte."""
    ov = Overlapper(AlignSettings.amos_parity())
    recs = ov.run(crp_seqs)
    ours = "".join(r.render() + "\n" for r in recs)
    assert ours == open("/root/reference/amos/small/crp177.ovl").read()


def test_single_align_packed_interpret_golden(crp_seqs):
    """--single-align (batch_size=1) through the PACKED Pallas kernels
    under the interpreter: pins the bs < pblk zero-grid bug (the engine
    must clamp pblk to the lane-aligned batch, never launch grid=(0,))
    and still reproduce the golden output byte-for-byte."""
    from sequence_aligner_tpu.ops import align_fused

    seqs = crp_seqs[:24]  # interpreter is slow: keep the pair count tiny
    want = Overlapper(AlignSettings.amos_parity()).run(seqs)
    assert want, "fixture subset produced no overlaps"
    align_fused.FORCE_PACKED_INTERPRET = True
    try:
        ov = Overlapper(AlignSettings.amos_parity(), batch_size=1)
        got = ov.run(seqs)
    finally:
        align_fused.FORCE_PACKED_INTERPRET = False
    assert got == want


def test_fused_dovetail_matches_oracle():
    """The fused (traceback-in-fill) kernels match the oracle element-level
    on random error-sprinkled pairs, including dud and mixed-length cases."""
    from sequence_aligner_tpu.ops.align_fused import fast_dovetail_batch_fused

    rng = np.random.RandomState(9)
    seqs = _random_reads(rng, 30, 100)
    pairs = [(a, b) for a in range(1, 31) for b in range(1, 31) if a != b]
    rng.shuffle(pairs)
    pairs = pairs[:64]
    s = AlignSettings()
    bases, lengths = encode_reads(seqs)
    a_idx = np.asarray([a - 1 for a, _ in pairs])
    b_idx = np.asarray([b - 1 for _, b in pairs])
    pblk = 64
    pad = (-len(pairs)) % pblk
    a_idx = np.concatenate([a_idx, np.repeat(a_idx[-1:], pad)])
    b_idx = np.concatenate([b_idx, np.repeat(b_idx[-1:], pad)])
    w = s.band_width(int(lengths[a_idx].max()))
    res = fast_dovetail_batch_fused(
        jnp.asarray(bases[a_idx]), jnp.asarray(lengths[a_idx]),
        jnp.asarray(bases[b_idx]), jnp.asarray(lengths[b_idx]),
        cm_tuple=tuple(int(x) for x in s.cost_matrix.reshape(-1)),
        gO=s.gap_open, gE=s.gap_extend,
        min_identity=jnp.float32(s.min_identity),
        min_overlap=jnp.int32(s.min_overlap),
        max_ignore=jnp.int32(s.max_ignore),
        la_max=bases.shape[1], lb_max=bases.shape[1], width=w, pblk=pblk,
    )
    by_id = {q.id: q for q in seqs}
    for n, (a, b) in enumerate(pairs):
        o = fast_dovetail_alignment(by_id[a], by_id[b], s)
        assert bool(res["dud"][n]) == o.dud, (a, b)
        if o.dud:
            continue
        got = (
            int(res["start_i"][n]), int(res["start_j"][n]),
            int(res["end_i"][n]), int(res["end_j"][n]),
            int(res["correct"][n]), int(res["error"][n]),
            int(res["align_len"][n]),
        )
        want = (*o.start, *o.end, o.correct, o.error, o.align_len)
        assert got == want, (a, b, got, want)
        assert bool(res["align_valid"][n]) == o.valid(s), (a, b)


def test_plan_totals_exact_past_int32():
    """Repeat-rich totals exceed int32: one hash shared by 2^16 occurrences
    with geometry making every row head+mid+tail gives raw totals of
    exactly 2^32 — the round-2 device sum silently wrapped here (the
    .astype(int64) was a no-op without x64)."""
    from sequence_aligner_tpu.ops.pairgen import plan_totals

    n = 1 << 16
    occ = dict(
        hash=jnp.zeros((n,), jnp.int32),
        read_id=jnp.arange(1, n + 1, dtype=jnp.int32),
        loc=jnp.full((n,), 0.5, jnp.float32),
        valid=jnp.ones((n,), bool),
    )
    h_tot, t_tot = plan_totals(
        occ,
        head_edge=jnp.float32(1.0), tail_edge=jnp.float32(0.0),
        mid_lead=jnp.float32(0.0), mid_tail=jnp.float32(1.0),
    )
    assert h_tot == n * n  # 2^32 > int32 max
    assert t_tot == n * n


def test_plan_totals_matches_small_case(crp_seqs):
    """The chunked hi/lo plan agrees with a direct NumPy computation on
    real data (regression for the recombination arithmetic)."""
    from sequence_aligner_tpu.ops.pairgen import (
        plan_totals, sort_occurrences_jit,
    )

    s = AlignSettings.amos_parity()
    ov = Overlapper(s)
    bases, lengths = encode_reads(crp_seqs)
    occ = ov._occurrences(bases, lengths)
    occ_s = sort_occurrences_jit(occ)
    geom = dict(
        head_edge=jnp.float32(s.kmer_head_edge),
        tail_edge=jnp.float32(s.kmer_tail_edge),
        mid_lead=jnp.float32(s.kmer_mid_lead_edge),
        mid_tail=jnp.float32(s.kmer_mid_tail_edge),
    )
    h_tot, t_tot = plan_totals(occ_s, **geom)
    h = np.asarray(occ_s["hash"])
    loc = np.asarray(occ_s["loc"])
    valid = np.asarray(occ_s["valid"]) & (h != 2**31 - 1)
    want_h = want_t = 0
    for hv in np.unique(h[valid]):
        m = valid & (h == hv)
        n_mid = int(((loc[m] >= s.kmer_mid_lead_edge)
                     & (loc[m] <= s.kmer_mid_tail_edge)).sum())
        want_h += int((loc[m] <= s.kmer_head_edge).sum()) * n_mid
        want_t += int((loc[m] >= s.kmer_tail_edge).sum()) * n_mid
    assert (h_tot, t_tot) == (want_h, want_t)


def _align_device_vs_host(n_pairs, cap, batch_size, seed=21):
    """Drive _align_device at an exact (n_pairs, capacity, batch) geometry
    and cross-check the valid set against the host _align path."""
    rng = np.random.RandomState(seed)
    seqs = _random_reads(rng, 40, 100)
    bases, lengths = encode_reads(seqs)
    all_pairs = [(a, b) for a in range(1, 41) for b in range(1, 41) if a != b]
    rng.shuffle(all_pairs)
    pairs = (all_pairs * (n_pairs // len(all_pairs) + 1))[:n_pairs]
    lead = np.asarray([a for a, _ in pairs], np.int32)
    trail = np.asarray([b for _, b in pairs], np.int32)
    s = AlignSettings()
    ov = Overlapper(s, batch_size=batch_size)
    lead_dev = jnp.asarray(np.pad(lead, (0, cap - n_pairs)))
    trail_dev = jnp.asarray(np.pad(trail, (0, cap - n_pairs)))
    got = ov._align_device(bases, lengths, lead_dev, trail_dev, n_pairs)
    ref = Overlapper(s)._align(bases, lengths, lead, trail)
    vm = ref["valid"]
    want = sorted(zip(
        lead[vm].tolist(), trail[vm].tolist(),
        ref["ahg"][vm].tolist(), ref["bhg"][vm].tolist(),
    ))
    assert sorted(zip(*(c.tolist() for c in got))) == want
    assert len(want) > 0  # the scenario must actually exercise valid pairs


def test_align_device_chunk_grid_overrun():
    """cnt just over a batch multiple while the pair table's capacity sits
    below the chunk grid: ceil(768/512)*512 = 1024 > cap 768.  Without
    idx padding, dynamic_slice clamps the last chunk's start and pairs
    512..767 are silently dropped while 256..511 duplicate (the round-2
    advisor's high-severity finding)."""
    _align_device_vs_host(n_pairs=768, cap=768, batch_size=512)


def test_align_device_at_exact_capacity():
    """n_pairs == cap == batch_size boundary."""
    _align_device_vs_host(n_pairs=512, cap=512, batch_size=512)


def test_align_device_one_over_batch():
    """n_pairs == batch_size + 1 with ample capacity."""
    _align_device_vs_host(n_pairs=257, cap=1024, batch_size=256)


def test_packed_kernels_interpret_parity():
    """The TPU packed-word Pallas kernels, run under the Pallas
    interpreter on CPU, agree with the lax.scan formulation on every
    output — so CPU CI exercises the same kernel code the TPU runs."""
    from sequence_aligner_tpu.ops.align_fused import (
        _fused_core_packed, fast_dovetail_batch_fused, pack_reads_le,
    )

    rng = np.random.RandomState(13)
    seqs = _random_reads(rng, 16, 100)
    pairs = [(a, b) for a in range(1, 17) for b in range(1, 17) if a != b]
    rng.shuffle(pairs)
    pairs = pairs[:64]
    s = AlignSettings()
    bases, lengths = encode_reads(seqs)
    a_idx = np.asarray([a - 1 for a, _ in pairs])
    b_idx = np.asarray([b - 1 for _, b in pairs])
    kw = dict(
        cm_tuple=tuple(int(x) for x in s.cost_matrix.reshape(-1)),
        gO=s.gap_open, gE=s.gap_extend,
        min_identity=jnp.float32(s.min_identity),
        min_overlap=jnp.int32(s.min_overlap),
        max_ignore=jnp.int32(s.max_ignore),
        la_max=bases.shape[1], lb_max=bases.shape[1],
        width=s.band_width(int(lengths[a_idx].max())), pblk=64,
    )
    aw_t = pack_reads_le(jnp.asarray(bases[a_idx])).T
    bw_t = pack_reads_le(jnp.asarray(bases[b_idx])).T
    got = _fused_core_packed(
        aw_t, bw_t, jnp.asarray(lengths[a_idx]), jnp.asarray(lengths[b_idx]),
        interpret=True, **kw,
    )
    want = fast_dovetail_batch_fused(
        jnp.asarray(bases[a_idx]), jnp.asarray(lengths[a_idx]),
        jnp.asarray(bases[b_idx]), jnp.asarray(lengths[b_idx]), **kw,
    )
    for k in want:
        assert np.array_equal(np.asarray(got[k]), np.asarray(want[k])), k


def test_run_stream_matches_run_golden():
    """The streamed input pipeline (chunked device-side assembly) is
    byte-identical to the one-shot path on the golden dataset, across
    multiple chunks plus a ragged tail."""
    ov = Overlapper(AlignSettings.amos_parity())
    recs = ov.run_stream("/root/reference/amos/small/crp177.seq",
                         chunk_reads=64)
    ours = "".join(r.render() + "\n" for r in recs)
    assert ours == open("/root/reference/amos/small/crp177.ovl").read()


@pytest.mark.parametrize("packed", [False, True])
def test_candidate_pairs_chunked_expansion_parity(crp_seqs, packed, monkeypatch):
    """The chunked expansion (tiny _EXPAND_CHUNK forces many chunks and
    exercises the straddling-row boundary carry) reproduces the
    single-chunk stream's pairs AND counts exactly."""
    import sequence_aligner_tpu.ops.pairgen as pg

    s = AlignSettings.amos_parity()
    ov = Overlapper(s)
    bases, lengths = encode_reads(crp_seqs[:48])
    occ = ov._occurrences(bases, lengths)
    kw = dict(
        head_edge=jnp.float32(s.kmer_head_edge),
        tail_edge=jnp.float32(s.kmer_tail_edge),
        mid_lead=jnp.float32(s.kmer_mid_lead_edge),
        mid_tail=jnp.float32(s.kmer_mid_tail_edge),
        min_collisions=jnp.int32(1), max_collisions=jnp.int32(10**9),
        cap_head=1 << 15, cap_tail=1 << 15, cap_out=1 << 14,
        packed_ids=packed,
    )
    ref = pg.candidate_pairs_stream(occ, **kw)  # cap < chunk: single piece
    n_ref = int(ref["n_out"])
    want = [
        (int(ref["lead"][i]), int(ref["trail"][i]), int(ref["count"][i]))
        for i in range(n_ref)
    ]
    # 517-slot chunks: prime-ish size, not a run boundary multiple
    monkeypatch.setattr(pg, "_EXPAND_CHUNK", 517)
    got_out = pg.candidate_pairs_stream(occ, **kw)
    n_got = int(got_out["n_out"])
    got = [
        (int(got_out["lead"][i]), int(got_out["trail"][i]),
         int(got_out["count"][i]))
        for i in range(n_got)
    ]
    assert not bool(got_out["overflow"])
    assert got == want and n_got == n_ref and n_ref > 0


def test_packed_pairgen_high_ids_matches_general():
    """Packed single-key aggregation with read ids in the UPPER half of
    the 16-bit space (sign-flipped keys) matches the general radix path
    slot for slot — pins the 32768..65535-id range that once silently
    fell back to the slow path (and would break if the flip were wrong)."""
    import jax.numpy as jnp

    from sequence_aligner_tpu.ops import pairgen as pg

    rng = np.random.RandomState(3)
    n = 4096
    ids = rng.randint(30000, 65536, n).astype(np.int32)
    occ = dict(
        hash=jnp.asarray(rng.randint(0, 37, n).astype(np.int32)),
        read_id=jnp.asarray(ids),
        loc=jnp.asarray(rng.rand(n).astype(np.float32)),
        valid=jnp.asarray(rng.rand(n) < 0.95),
    )
    s = AlignSettings.amos_parity()
    kw = dict(
        head_edge=jnp.float32(s.kmer_head_edge),
        tail_edge=jnp.float32(s.kmer_tail_edge),
        mid_lead=jnp.float32(s.kmer_mid_lead_edge),
        mid_tail=jnp.float32(s.kmer_mid_tail_edge),
        min_collisions=jnp.int32(s.min_collisions),
        max_collisions=jnp.int32(s.max_collisions),
        cap_head=1 << 18, cap_tail=1 << 18, cap_out=1 << 16,
    )
    a = pg.candidate_pairs_stream(occ, packed_ids=True, **kw)
    b = pg.candidate_pairs_stream(occ, packed_ids=False, **kw)
    ka, kb = int(a["n_out"]), int(b["n_out"])
    assert ka == kb and ka > 0
    for f in ("lead", "trail", "count"):
        np.testing.assert_array_equal(
            np.asarray(a[f][:ka]), np.asarray(b[f][:ka]), err_msg=f
        )
    assert int(np.asarray(a["lead"][:ka]).max()) >= (1 << 15)
    # split dispatch path produces the identical table
    c = pg.candidate_pairs_stream(
        occ, packed_ids=True, packed_split=True, **kw
    )
    for f in ("lead", "trail", "count"):
        np.testing.assert_array_equal(
            np.asarray(a[f][:ka]), np.asarray(c[f][:ka]), err_msg=f
        )


def test_prescreen_golden_and_random(crp_seqs):
    """Diagonal-coherence prescreen must be output-invariant: byte-equal
    golden on crp177 and identical records on a randomized simulated
    dataset (it may only drop pairs whose alignment was invalid anyway)."""
    s = AlignSettings.amos_parity()
    ov = Overlapper(s, prescreen=True)
    recs = ov.run(crp_seqs)
    ours = "".join(r.render() + "\n" for r in recs)
    assert ours == open("/root/reference/amos/small/crp177.ovl").read()
    base = Overlapper(s, prescreen=False)
    base_recs = base.run(crp_seqs)
    assert recs == base_recs
    assert ov.stats.n_candidate_pairs <= base.stats.n_candidate_pairs

    rng = np.random.RandomState(11)
    seqs = _random_reads(rng, 300, 100, genome_len=3000)
    a = Overlapper(s, prescreen=True).run(seqs)
    b = Overlapper(s, prescreen=False).run(seqs)
    assert a == b and a


def test_k16_end_to_end_matches_oracle():
    """k=16 (BASELINE config-1's k): full-width 32-bit hashes — including
    values that collide with the int32 sort sentinel — must aggregate
    correctly end-to-end (engine == oracle)."""
    from sequence_aligner_tpu.oracle.overlap import oracle_overlaps

    rng = np.random.RandomState(23)
    bases = "ACTG"
    genome = "".join(bases[i] for i in rng.randint(0, 4, 2500))
    # plant the sentinel-colliding 16-mer "C" + "T"*15 (hash 0x7FFFFFFF)
    genome = genome[:600] + "C" + "T" * 15 + genome[616:]
    seqs = []
    for i in range(60):
        start = 40 * i
        seqs.append(Sequence(i + 1, genome[start : start + 100]))
    s = AlignSettings.amos_parity(kmer_size=16)
    got = Overlapper(s).run(seqs)
    want = oracle_overlaps(seqs, s)
    assert [(r.id_a, r.id_b, r.ahg, r.bhg) for r in got] == [
        (r.id_a, r.id_b, r.ahg, r.bhg) for r in want
    ]
    assert got, "k=16 dataset produced no overlaps"
