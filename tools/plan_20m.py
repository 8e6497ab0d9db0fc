#!/usr/bin/env python
"""Capacity/memory plan for BASELINE config 5 (20M simulated reads) on a
v5e pod slice — the dryrun VERDICT r3 #3 asked for.

No device needed: this sizes every static capacity of the sharded
two-program engine (parallel/shard.py) for 20M x 100 bp reads over a
chosen mesh, checks the per-device HBM working set against v5e's 16 GB,
and emits PLAN_20M_r4.json.  Density constants are measured from the
c_ruddii 32k run (BENCH_SELF artifacts): ~89 k-mers/read, ~2.36k raw
edge x middle events/read, ~435 candidate pairs/read, ~12 valid/read.
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
    cap_head = cap_tail = tier(int(1.2 * raw_local))
    cap_agg = tier(int(1.2 * CANDS_PER_READ * N_READS // n_dev))
    cap_pair_route = tier(max(4096, 2 * cap_agg // n_dev))
    cap_out = tier(int(1.5 * CANDS_PER_READ * N_READS // n_dev))
    # align runs CHUNKED over the pair table (driver offset loop)
    cap_align = min(tier(int(1.2 * CANDS_PER_READ * N_READS // n_dev)),
                    1 << 21)
    cap_fetch = tier(max(4 * cap_align // n_dev, 1024))

    i4 = 4
    read_block = n_local * READ_LEN  # int8
    stream = cap_head + cap_tail
    pairs_mem = (
        read_block
        + kmers_local * 4 * i4 * 2                  # occ table + sorted copy
        + 2 * 3 * n_dev * cap_route * i4            # route bins in+out
        + stream * 2 * i4                           # masked fst/snd streams
        + stream * 2 * i4                           # 2-key sort outputs
        + stream * 2 * i4                           # run-sum scans (peak)
        + cap_agg * 3 * i4
        + 2 * 3 * n_dev * cap_pair_route * i4
        + cap_out * 2 * i4
    )
    align_mem = (
        read_block
        + cap_out * 2 * i4                          # pair table (input)
        + 2 * n_dev * cap_fetch * (READ_LEN + 4)    # request/response bins
        + cap_align * 2 * (READ_LEN + 8)            # fetched A/B rows
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
            # single-chip measured: 32k reads in ~8s end-to-end; pairgen +
            # align scale ~linearly in events/pairs, all-to-alls ride ICI
            perfect_scaling=round(
                8.0 * (N_READS / 32_000) / n_dev, 1
            ),
            with_70pct_efficiency=round(
                8.0 * (N_READS / 32_000) / n_dev / 0.7, 1
            ),
        ),
    )


def main():
    out = {
        "metric": "capacity_plan_20M_reads",
        "config": f"{N_READS} reads x {READ_LEN} bp (BASELINE config 5)",
        "plans": [plan(n) for n in (64, 128, 256)],
        "notes": (
            "ids exceed 16 bits at this scale, so the sharded engine uses "
            "the general 2-key unstable-sort aggregation path. The align "
            "program already chunks over the pair table, so its footprint "
            "is flat; the pairs program materializes the per-device raw "
            "stream for its one aggregation sort, which sets the HBM "
            "floor — a v5e-256 fits with c_ruddii-density (repeat-heavy "
            "worst-case) constants, and lower-repeat data fits "
            "proportionally smaller slices. Chunking the pairs-step "
            "expansion+sort (as the single-device engine already does) "
            "would bring config 5 down to a v5e-64 and is the noted "
            "follow-up."
        ),
    }
    viable = [p["n_devices"] for p in out["plans"] if p["fits_16gb"]]
    out["smallest_viable_mesh"] = min(viable) if viable else None
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLAN_20M_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
