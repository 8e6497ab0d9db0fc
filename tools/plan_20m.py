#!/usr/bin/env python
"""Capacity/memory plan for BASELINE config 5 (20M simulated reads) on a
v5e pod slice.

No device needed: this sizes every static capacity of the sharded
two-program engine (parallel/shard.py) for 20M x 100 bp reads over a
chosen mesh, checks the per-device HBM working set against v5e's 16 GB,
and emits PLAN_20M_r5.json.  Density constants are measured from the
c_ruddii 32k run (BENCH_SELF artifacts): ~89 k-mers/read, ~2.36k raw
edge x middle events/read, ~435 candidate pairs/read, ~12 valid/read.

Round-5 model: the pairs step now runs CHUNKED local aggregation
(shard.py agg_chunk; sort+run-length per 2^26-slot piece, partials
summed by the pair owner) and chunked expansion, so its HBM peak is the
raw pair-column stream + O(chunk) transients + the partial table — NOT
stream-sized sort in+out copies.  The align step's deduplicated read
fetch bounds its footprint at O(min(n_reads, 2*cap_align) * L).
PLAN_DRYRUN=1 additionally executes a small-scale 64-virtual-device
dryrun of the chunked pairs step and records it in the JSON.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_READS = 20_000_000
READ_LEN = 100
HBM_BYTES = 16 * 2**30  # v5e: 16 GB HBM per chip
# measured densities (c_ruddii 32k: 2.848M kmers, 75.4M raw events,
# 13.9M candidates, 383.6k valid)
KMERS_PER_READ = 89
RAW_EVENTS_PER_READ = 2360
CANDS_PER_READ = 435
VALID_PER_READ = 12


def tier(n, floor=1024):
    p = floor
    while p < n:
        p *= 2
    step = p // 8
    return max(((n + step - 1) // step) * step, floor)


def plan(n_dev: int) -> dict:
    n_local = -(-N_READS // n_dev)
    kmers_local = n_local * KMERS_PER_READ
    # per-DESTINATION route bin (hash routing is uniform): 2x slack
    cap_route = tier(max(2 * kmers_local // n_dev, 1024))
    # raw expansion on the HASH-sharded table: events/device ~ total/n_dev
    # (repeat skew absorbed by the drop-and-double retry); per class
    raw_local = N_READS * RAW_EVENTS_PER_READ // 2 // n_dev
    # the plan step measures EXACT per-device totals; the driver adds 2%
    cap_head = cap_tail = tier(int(1.05 * raw_local))
    cap_agg = tier(int(1.2 * CANDS_PER_READ * N_READS // n_dev))
    cap_pair_route = tier(max(4096, int(1.3 * cap_agg) // n_dev))
    cap_out = tier(int(1.5 * CANDS_PER_READ * N_READS // n_dev))
    # align runs CHUNKED over the pair table (driver offset loop)
    cap_align = min(tier(int(1.2 * CANDS_PER_READ * N_READS // n_dev)),
                    1 << 21)
    cap_fetch = tier(max(4 * cap_align // n_dev, 1024))

    i4 = 4
    agg_chunk = 1 << 26
    read_block = n_local * READ_LEN  # int8
    stream = cap_head + cap_tail
    cap_uniq = min(tier(N_READS + n_dev), tier(2 * cap_align))
    base = read_block + kmers_local * 4 * i4  # reads + sorted occ table
    # PHASE-PEAK accounting (XLA frees buffers after their last use
    # within the program); the peak phase governs
    ph_route = base + 2 * 3 * n_dev * cap_route * i4
    ph_expand = (
        base + stream * 2 * i4          # masked fst/snd pair columns
        + kmers_local * 5 * i4          # prep row tables
        + 2 * (1 << 25) * 2 * i4        # expansion piece buffers
    )
    ph_agg = (
        base + stream * 2 * i4
        + agg_chunk * 6 * i4            # per-piece sort in+out + fills
        + cap_agg * 3 * i4              # partial-table accumulation
    )
    owner_stream = n_dev * cap_pair_route
    bins = 3 * n_dev * cap_pair_route * i4
    # owner stage sub-phases (each frees its predecessor's buffers):
    # build send bins from partials; all_to_all in->out; owner sort of
    # the received stream + run fills
    ph_owner = base + cap_out * 2 * i4 + max(
        cap_agg * 3 * i4 + bins,        # partials -> send bins
        2 * bins,                       # exchange in + out
        bins + owner_stream * 5 * i4,   # recv + sort outputs + fills
    )
    pairs_mem = max(ph_route, ph_expand, ph_agg, ph_owner)
    align_mem = (
        read_block
        + cap_out * 2 * i4                          # pair table (input)
        + N_READS * i4                              # id->rank table
        # DEDUPLICATED fetch: each needed row once, not per pair
        + 2 * n_dev * (2 * cap_uniq // n_dev) * (READ_LEN + 8)
        + cap_uniq * (READ_LEN + 32)                # fetched rows + packed
        + cap_align * 12 * i4                       # DP outputs + glue
    )
    n_chunks = -(-tier(int(1.2 * CANDS_PER_READ * N_READS // n_dev))
                 // cap_align)
    return dict(
        n_devices=n_dev,
        reads_per_device=n_local,
        caps=dict(
            cap_route=cap_route, cap_head=cap_head, cap_tail=cap_tail,
            cap_agg=cap_agg, cap_pair_route=cap_pair_route,
            cap_out=cap_out, cap_align=cap_align, cap_fetch=cap_fetch,
        ),
        align_chunks=n_chunks,
        pairs_step_hbm_gb=round(pairs_mem / 2**30, 2),
        align_step_hbm_gb=round(align_mem / 2**30, 2),
        fits_16gb=bool(max(pairs_mem, align_mem) < 0.85 * HBM_BYTES),
        est_wall_s=dict(
            # single-chip measured round 5: 32k reads in 3.7 s end-to-end;
            # pairgen + align scale ~linearly in events/pairs,
            # all-to-alls ride ICI
            perfect_scaling=round(
                3.7 * (N_READS / 32_000) / n_dev, 1
            ),
            with_70pct_efficiency=round(
                3.7 * (N_READS / 32_000) / n_dev / 0.7, 1
            ),
        ),
    )


def dryrun_64():
    """Small-scale execution proof on a 64-virtual-device CPU mesh: the
    general-id pairs step with chunk-forced aggregation runs one window
    end-to-end (drops == 0, candidates produced)."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=64"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sequence_aligner_tpu.core.settings import AlignSettings
    from sequence_aligner_tpu.ops.encode import encode_reads
    from sequence_aligner_tpu.parallel.shard import make_sharded_pairs_step
    from sequence_aligner_tpu.pipeline.datasets import simulated_reads

    n = 4096
    seqs = simulated_reads(n, 100, coverage=8.0, seed=7)
    s = AlignSettings.amos_parity()
    mesh = jax.make_mesh((64,), ("shard",))
    bases, lengths = encode_reads(seqs)
    ids = np.arange(1, n + 1, dtype=np.int32)
    step = make_sharded_pairs_step(
        mesh, s, packed=False, pack_den=0, agg_chunk=1 << 16,
        cap_route=1 << 11, cap_head=1 << 18, cap_tail=1 << 18,
        cap_agg=1 << 18, cap_pair_route=1 << 12, cap_out=1 << 15,
    )
    lead, trail, n_out, drops = (
        np.asarray(x)
        for x in step(jnp.asarray(bases), jnp.asarray(lengths),
                      jnp.asarray(ids))
    )
    return dict(
        n_devices=64, n_reads=n, agg_chunk=1 << 16,
        drops=int(drops.sum()), n_candidates=int(n_out.sum()),
        ok=bool(drops.sum() == 0 and n_out.sum() > 0),
    )


def main():
    out = {
        "metric": "capacity_plan_20M_reads",
        "config": f"{N_READS} reads x {READ_LEN} bp (BASELINE config 5)",
        "plans": [plan(n) for n in (64, 128, 256)],
        "model": (
            "phase-peak HBM accounting: within one XLA program, buffers "
            "dead after a stage are freed, so the binding constraint is "
            "the largest stage live-set, not the sum.  Estimates carry "
            "~20-30 percent uncertainty from XLA temporaries; the 0.85 "
            "fit threshold leaves that headroom."
        ),
        "notes": (
            "ids exceed 16 bits at this scale, so the sharded engine uses "
            "the general 2-key path.  Round 5 IMPLEMENTED the chunked "
            "pairs-step expansion AND aggregation the round-4 plan called "
            "for (parallel/shard.py agg_chunk + "
            "ops.pairgen._expand_stream_chunked): the per-device HBM "
            "floor is now the raw pair-column stream plus O(2^26) "
            "transients, and the align step's deduplicated read fetch is "
            "O(min(n_reads, 2*cap_align) * L) — config 5 fits a v5e-64 "
            "(see plans[0].fits_16gb).  Correctness of the chunked "
            "aggregation is pinned by "
            "tests/test_shard.py::test_chunked_general_aggregation_matches "
            "(tiny chunks, byte-identical candidates on the 8-device "
            "mesh)."
        ),
    }
    viable = [p["n_devices"] for p in out["plans"] if p["fits_16gb"]]
    out["smallest_viable_mesh"] = min(viable) if viable else None
    if os.environ.get("PLAN_DRYRUN"):
        out["dryrun_64dev"] = dryrun_64()
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLAN_20M_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
