"""Large-scale simulated sharded run (BASELINE config 4).

Gated on SEQALIGN_SCALE (=read count, or "1" for the 250k default; the
1M-read configuration is SEQALIGN_SCALE=1000000): shreds a random genome
at 8x coverage, runs the full sharded overlap step on the virtual
8-device mesh, and asserts it converges with per-device capacities
O(N / n_dev) — the memory scaling the hash-prefix sharding exists for.
"""

import os

import numpy as np
import pytest

from sequence_aligner_tpu.core.settings import AlignSettings
from sequence_aligner_tpu.parallel.mesh import make_mesh
from sequence_aligner_tpu.parallel.shard import sharded_overlap
from sequence_aligner_tpu.pipeline.datasets import simulated_reads

_SCALE = os.environ.get("SEQALIGN_SCALE")


@pytest.mark.slow
@pytest.mark.skipif(
    not _SCALE, reason="set SEQALIGN_SCALE=1 (250k reads) or a read count"
)
def test_sharded_scale_sim():
    n_reads = 250_000 if _SCALE == "1" else int(_SCALE)
    seqs = simulated_reads(n_reads, 100, coverage=8.0, seed=3)
    s = AlignSettings.amos_parity()
    mesh = make_mesh(8)
    n_dev = 8
    # capacities sized O(N / n_dev): the point of hash-prefix sharding.
    # Densities from the 1M-sim trace (tools/engine_pairgen_trace.py):
    # ~100 raw events/read/class, local distinct partials ~4x reads/dev,
    # candidates ~4.1x reads globally — undersizing here is CORRECT but
    # each drop-retry re-runs the full pairs program (hours at 1M on the
    # 2-core CPU mesh), so start at the measured scale
    kmers_per_dev = n_reads * 89 // n_dev
    caps = dict(
        # per-DESTINATION route bin: ~kmers_per_dev / n_dev expected
        cap_route=max(1024, kmers_per_dev // n_dev * 2),
        cap_head=4 * kmers_per_dev,
        cap_tail=4 * kmers_per_dev,
        cap_agg=4 * n_reads,
        cap_pair_route=n_reads,
        cap_out=n_reads,
    )
    recs = sharded_overlap(seqs, s, mesh, caps=caps)
    assert len(recs) > n_reads  # ~8x coverage: several overlaps per read
    ids = np.asarray([(r.id_a, r.id_b) for r in recs])
    assert ids.min() >= 1 and ids.max() <= n_reads
    assert (ids[:, 0] != ids[:, 1]).all()
    # canonical order, no duplicate records
    keys = [(r.id_a, r.id_b) for r in recs]
    assert keys == sorted(keys)
    assert len(set(keys)) == len(keys)
    # correctness, not just structure: candidate nomination (per-pair
    # collision counts) and alignment validity are strictly PAIRWISE in
    # this algorithm, so the engine restricted to any read subset must
    # reproduce exactly the full run's records whose both ids fall in the
    # subset.  Re-run a 2k-read id-slab through the single-device engine.
    lo, hi = n_reads // 2 + 1, n_reads // 2 + 2000
    slab = [q for q in seqs if lo <= q.id <= hi]
    from sequence_aligner_tpu.core.records import Sequence
    from sequence_aligner_tpu.models.overlapper import Overlapper

    remap = [Sequence(i + 1, q.seq) for i, q in enumerate(slab)]
    single = Overlapper(s).run(remap)
    want = sorted(
        (r.id_a + lo - 1, r.id_b + lo - 1, r.ahg, r.bhg) for r in single
    )
    got = sorted(
        (r.id_a, r.id_b, r.ahg, r.bhg)
        for r in recs if lo <= r.id_a <= hi and lo <= r.id_b <= hi
    )
    assert want, "slab produced no overlaps to compare"
    assert got == want
