#!/usr/bin/env python
"""Sharded-engine benchmark: reads/s + per-stage split over a device mesh.

Covers BASELINE.md's multi-chip measurement points.  Runs unchanged on:
  * the virtual CPU mesh  — SHARD_BENCH_CPU_MESH=8 python tools/bench_sharded.py
  * the real chip(s)      — python tools/bench_sharded.py   (1-chip mesh today;
                            a v5e-8 slice would show an 8-wide mesh)

Stage attribution: a fused shard_map program cannot be timed from the
host mid-flight, so the harness times TRUNCATED copies of each program
(``stop_after``) and reports deltas.  The engine is two programs
(pairs, align); the align program's batch is tiered from the pairs
program's REAL per-device counts, exactly like the production driver.

Prints ONE JSON line with reads/s, vs_baseline, and the stage split.
Env knobs: SHARD_READS (default 32000), SHARD_READ_LEN (100),
SHARD_SIM (coverage; 0 = c_ruddii shred), SHARD_BENCH_CPU_MESH (n dev).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SHARD_BENCH_CPU_MESH"):
    n = int(os.environ["SHARD_BENCH_CPU_MESH"])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}"
    ).strip()

BASELINE_READS_PER_S = 32000.0 / 1200.0
N_READS = int(os.environ.get("SHARD_READS", "32000"))
READ_LEN = int(os.environ.get("SHARD_READ_LEN", "100"))
SIM_COVERAGE = float(os.environ.get("SHARD_SIM", "0"))


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("SHARD_BENCH_CPU_MESH"):
        jax.config.update("jax_platforms", "cpu")
    from sequence_aligner_tpu.utils.profiling import ensure_compile_cache

    ensure_compile_cache()
    devs = jax.devices()
    log(f"devices: {devs}")
    mesh = jax.make_mesh((len(devs),), ("shard",))

    from sequence_aligner_tpu.core.settings import AlignSettings
    from sequence_aligner_tpu.ops.encode import encode_reads
    from sequence_aligner_tpu.parallel.shard import (
        _tier, make_sharded_align_step, make_sharded_pairs_step,
        make_sharded_plan_step,
    )
    from sequence_aligner_tpu.pipeline.datasets import (
        c_ruddii_reads, simulated_reads,
    )

    if SIM_COVERAGE:
        seqs = simulated_reads(N_READS, READ_LEN, coverage=SIM_COVERAGE)
    else:
        seqs = c_ruddii_reads(n_reads=N_READS, read_len=READ_LEN)
    s = AlignSettings.amos_parity()
    n_dev = len(devs)
    bases, lengths = encode_reads(seqs)
    n, l = bases.shape
    pad = (-n) % n_dev
    if pad:
        bases = np.pad(bases, ((0, pad), (0, 0)))
        lengths = np.pad(lengths, (0, pad))
    ids = np.concatenate(
        [np.arange(1, n + 1, dtype=np.int32), np.zeros(pad, np.int32)]
    )
    widths = tuple(sorted({s.band_width(int(x)) for x in lengths[:n]}))
    n_kmers = int(np.sum(np.maximum(lengths - s.kmer_size + 1, 0)))

    def pow2(v):
        c = 1024
        while c < v:
            c *= 2
        return c

    caps = dict(cap_route=max(1024, 2 * n_kmers // n_dev))
    packed = (n + pad) < (1 << 16)
    den = READ_LEN - s.kmer_size
    pack_den = (
        den if 0 < den and (n + pad).bit_length() + den.bit_length() <= 31
        and bool((lengths[:n] == READ_LEN).all()) else 0
    )
    log(f"{n} reads x {READ_LEN} bp on {n_dev}-device mesh, "
        f"packed={packed}, pack_den={pack_den}, caps={caps}")

    bases_d, lengths_d, ids_d = (
        jnp.asarray(x) for x in (bases, lengths, ids)
    )

    # capacity plan from measured per-device totals (as the driver does)
    plan_step = make_sharded_plan_step(mesh, s, cap_route=caps["cap_route"])
    tot = np.asarray(plan_step(bases_d, lengths_d, ids_d)).reshape(-1, 2)
    caps["cap_head"] = _tier(int(1.02 * tot[:, 0].max()) + 1024)
    caps["cap_tail"] = _tier(int(1.02 * tot[:, 1].max()) + 1024)
    raw_dev = caps["cap_head"] + caps["cap_tail"]
    caps["cap_agg"] = _tier(raw_dev // 2)
    caps["cap_pair_route"] = min(
        caps["cap_agg"], _tier(max(4096, 2 * caps["cap_agg"] // n_dev))
    )
    caps["cap_out"] = _tier(max(raw_dev // max(s.min_collisions, 1), 1024))
    log(f"planned caps: {caps} (per-device totals max "
        f"h={tot[:, 0].max():.0f} t={tot[:, 1].max():.0f})")

    _sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))

    def sync(out):
        # reduce EVERY output on device and fetch the scalars: a single
        # buffer fetch can return before outputs it has no data
        # dependency on are computed (the align step's drop counters
        # don't depend on the DP kernels), silently under-timing the
        # program — and fetching whole buffers would pay the ~25 MB/s
        # tunnel.  The jitted sum also handles sharded outputs.
        outs = out if isinstance(out, tuple) else (out,)
        return int(sum(int(_sum(o)) for o in outs))

    times = {}

    def timed(label, mk, *args):
        step = mk()
        out = step(*args)  # compile + warm
        sync(out)
        t0 = time.time()
        out = step(*args)
        sync(out)
        t = time.time() - t0
        log(f"{label}: {t:.3f}s")
        return t, out

    # ---- pairs program: cumulative truncations -> deltas ----
    pk = dict(packed=packed, pack_den=pack_den, **caps)
    t_kmer, _ = timed(
        "pairs[kmer]",
        lambda: make_sharded_pairs_step(mesh, s, stop_after="kmer", **pk),
        bases_d, lengths_d, ids_d)
    t_route, _ = timed(
        "pairs[route]",
        lambda: make_sharded_pairs_step(mesh, s, stop_after="route", **pk),
        bases_d, lengths_d, ids_d)
    t_pairs, pout = timed(
        "pairs[full]",
        lambda: make_sharded_pairs_step(mesh, s, **pk),
        bases_d, lengths_d, ids_d)
    lead_d, trail_d, n_out_d, drops = pout
    assert int(np.asarray(drops).sum()) == 0, np.asarray(drops)
    n_out = np.asarray(n_out_d)
    times["kmer_extract"] = round(t_kmer, 4)
    times["hash_all_to_all"] = round(t_route - t_kmer, 4)
    times["pair_gen_aggregate"] = round(t_pairs - t_route, 4)

    # ---- align program at the production tier ----
    cap_align = _tier(int(n_out.max()))
    log(f"n_out per device: {n_out.tolist()} -> cap_align {cap_align}")
    ak = dict(la_max=l, widths=widths, cap_align=cap_align, n_reads=n + pad)
    t_fetch, _ = timed(
        "align[fetch]",
        lambda: make_sharded_align_step(mesh, s, stop_after="fetch", **ak),
        bases_d, lengths_d, lead_d, trail_d, jnp.int32(0))
    t_align, aout = timed(
        "align[full]",
        lambda: make_sharded_align_step(mesh, s, **ak),
        bases_d, lengths_d, lead_d, trail_d, jnp.int32(0))
    valid, lead, trail, ahg, bhg, adrops = (np.asarray(x) for x in aout)
    assert adrops.sum() == 0, adrops
    times["read_fetch_all_to_all"] = round(t_fetch, 4)
    times["align_emit"] = round(t_align - t_fetch, 4)

    total = t_pairs + t_align
    n_valid = int(valid.sum())
    rps = n / total
    log(f"pairs {t_pairs:.3f}s + align {t_align:.3f}s = {total:.3f}s "
        f"-> {rps:.1f} reads/s, {n_valid} overlaps")
    print(json.dumps({
        "metric": "sharded_overlap_reads_per_sec",
        "value": round(rps, 2),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_S, 2),
        "n_devices": n_dev,
        "backend": jax.default_backend(),
        "n_reads": n,
        "n_overlaps": n_valid,
        "cap_align": cap_align,
        "stages_s": times,
    }))


if __name__ == "__main__":
    main()
