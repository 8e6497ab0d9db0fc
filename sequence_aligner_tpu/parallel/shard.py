"""Sharded multi-chip overlap step (shard_map + XLA collectives).

Distributed re-expression of the reference's single-JVM pipeline, per the
BASELINE north star: reads stream data-parallel, the k-mer table is sharded
by hash prefix via all-to-all over ICI/DCN, pair counts are reduced by
pair-key all-to-all, and OVL records merge by gather.

One step, per device, inside ``shard_map`` over a 1-D ``shard`` mesh axis:

  1. local k-mer extraction on this device's read block (ops.kmer);
  2. occurrences routed to ``hash % n_dev`` via ``lax.all_to_all`` with
     per-destination capacity bins (overflow counted, never silent);
  3. complete per-hash occurrence groups -> raw ordered-pair expansion
     (ops.pairgen.expand_raw_pairs);
  4. local pre-aggregation of pair counts, then a second all-to-all keyed
     by pair hash so each pair's global count lands on one owner device —
     this preserves the reference's *global* collision-band semantics
     (src/KmerTable.scala:155-187) under sharding;
  5. owner fetches ONLY the read rows its candidate pairs touch, via a
     request/response all-to-all against the id-sharded read blocks —
     per-device traffic is O(cap_out * L), independent of the total read
     count (an all-gather of all reads would be O(N * L) per device and
     fatal at the 1M/20M-read scale targets);
  6. owner aligns its candidates with the fused dovetail kernels, one pass
     per distinct band width (host-known, usually one), and emits masked
     OVL fields; host concatenates, filters, sorts canonically.

All shapes static; every capacity has an explicit drop counter, and the
driver retries doubling ONLY the capacities that overflowed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sequence_aligner_tpu.core.settings import AlignSettings
from sequence_aligner_tpu.ops.kmer import kmer_scan
from sequence_aligner_tpu.ops.pairgen import (
    _compact_indices, aggregate_pairs, compact_pairs, expand_raw_pairs,
    sort_occurrences,
)


def _route(fields: dict, tgt, valid, n_dev: int, cap: int):
    """Pack per-destination bins [n_dev, cap] for all_to_all.

    fields: name -> [n] array.  Entries beyond a bin's capacity are
    dropped (returned drop count).  Invalid entries are never sent.
    """
    n = tgt.shape[0]
    key = jnp.where(valid, tgt, n_dev)  # invalid -> overflow bin
    order_key, perm = jax.lax.sort(
        (key, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    starts = jnp.searchsorted(
        order_key, jnp.arange(n_dev, dtype=jnp.int32), side="left",
        method="scan_unrolled",
    )
    pos_in_bin = jnp.arange(n, dtype=jnp.int32) - starts[jnp.clip(order_key, 0, n_dev - 1)]
    ok = (order_key < n_dev) & (pos_in_bin < cap)
    slot = jnp.where(ok, order_key * cap + pos_in_bin, n_dev * cap)
    out = {}
    for name, arr in fields.items():
        src = arr[perm]
        buf = jnp.zeros((n_dev * cap + 1,), src.dtype).at[slot].set(
            jnp.where(ok, src, jnp.zeros((), src.dtype))
        )
        out[name] = buf[: n_dev * cap].reshape(n_dev, cap)
    sent = jnp.zeros((n_dev * cap + 1,), jnp.bool_).at[slot].set(ok)
    out["_sent"] = sent[: n_dev * cap].reshape(n_dev, cap)
    dropped = jnp.sum((order_key < n_dev) & ~ok)
    return out, dropped


def _exchange(bins: dict, axis: str):
    """all_to_all each field; bin row j -> device j."""
    out = {}
    for name, arr in bins.items():
        out[name] = jax.lax.all_to_all(
            arr, axis, split_axis=0, concat_axis=0, tiled=True
        )
    return out


def _fetch_read_rows(
    ids, bases_local, lengths_local, n_local: int, n_dev: int, axis: str,
    cap_req: int,
):
    """Fetch base rows + lengths for arbitrary read ids from the
    id-sharded read blocks via request/response all-to-alls.

    ids: [m] 1-based read ids (0 = hole).  Returns (rows [m, L] int8,
    lens [m] int32, dropped) — per-device traffic O(m * L), never O(N * L).
    """
    m = ids.shape[0]
    owner = jnp.clip((ids - 1) // n_local, 0, n_dev - 1)
    valid = ids > 0
    bins, dropped = _route(
        dict(rid=ids, src=jnp.arange(m, dtype=jnp.int32)),
        owner, valid, n_dev, cap_req,
    )
    recv = _exchange(bins, axis)
    # serve: local row index of each requested id
    local_row = jnp.clip(
        recv["rid"].reshape(-1) - 1 - jax.lax.axis_index(axis) * n_local,
        0, n_local - 1,
    )
    rows = jnp.where(
        recv["_sent"].reshape(-1)[:, None],
        bases_local[local_row],
        jnp.zeros((), bases_local.dtype),
    ).reshape(n_dev, cap_req, -1)
    lens = jnp.where(
        recv["_sent"].reshape(-1),
        lengths_local[local_row],
        0,
    ).reshape(n_dev, cap_req)
    back_rows = _exchange(dict(r=rows), axis)["r"].reshape(n_dev * cap_req, -1)
    back_lens = _exchange(dict(l=lens), axis)["l"].reshape(-1)
    # scatter responses into request order: bins['src'] still lives on the
    # requester (all_to_all bin layout is position-stable both ways)
    src = bins["src"].reshape(-1)
    sent = bins["_sent"].reshape(-1)
    slot = jnp.where(sent, src, m)
    out_rows = jnp.zeros((m + 1, bases_local.shape[1]), bases_local.dtype)
    out_rows = out_rows.at[slot].set(back_rows)[:m]
    out_lens = jnp.zeros((m + 1,), jnp.int32).at[slot].set(back_lens)[:m]
    return out_rows, out_lens, dropped


def make_sharded_overlap_step(
    mesh: Mesh,
    s: AlignSettings,
    *,
    la_max: int,
    widths: tuple[int, ...],
    cap_route: int,
    cap_head: int,
    cap_tail: int,
    cap_agg: int,
    cap_pair_route: int,
    cap_out: int,
    cap_width: tuple[int, ...] | None = None,
    axis: str = "shard",
    stop_after: str | None = None,
):
    """Build the jitted sharded step.

    widths: the host-known set of band widths present in the input.  With
    one width the align pass runs directly over the [cap_out] pair table;
    with several, pairs are COMPACTED per width into [cap_width[i]]
    buckets first, so total DP work is O(pairs), not O(widths x cap_out)
    (bucket overflows are counted and drive the driver's retry).

    stop_after ∈ {"kmer", "pairs", "agg", None}: truncate the step after
    that stage and return a tiny per-device sink array instead — the
    sharded bench harness times these truncated programs to attribute
    wall-clock to stages (a single fused program can't be timed from the
    host mid-flight).

    Returns fn(bases [N, la_max] int8, lengths [N] int32, ids [N] int32)
    -> tuple of [n_dev * cap_out] OVL fields + drop counters, where N must
    be divisible by the mesh size.
    """
    n_dev = mesh.shape[axis]
    if cap_width is None:
        cap_width = tuple(cap_out for _ in widths)
    geom = dict(
        head_edge=jnp.float32(s.kmer_head_edge),
        tail_edge=jnp.float32(s.kmer_tail_edge),
        mid_lead=jnp.float32(s.kmer_mid_lead_edge),
        mid_tail=jnp.float32(s.kmer_mid_tail_edge),
    )
    min_c = jnp.int32(s.min_collisions)
    max_c = jnp.int32(s.max_collisions)
    # exact band-width lookup by lead length (float32 parity)
    wtab = jnp.asarray(
        [s.band_width(l) for l in range(la_max + 1)], np.int32
    )

    _align_kw = dict(
        cm_tuple=tuple(int(x) for x in s.cost_matrix.reshape(-1)),
        gO=s.gap_open, gE=s.gap_extend,
        min_identity=jnp.float32(s.min_identity),
        min_overlap=jnp.int32(s.min_overlap),
        max_ignore=jnp.int32(s.max_ignore),
        la_max=la_max, lb_max=la_max,
    )

    def _align_bucketed(out_valid, a_rows, a_lens, b_rows, b_lens):
        """Width-bucketed alignment: pairs are compacted per band width
        and each width's fused pass runs over ONLY its own bucket
        ([cap_width[i]]), results scattered back to the [cap_out] table.
        Returns (res fields dict, bucket-overflow drop count).  A single
        width skips the bucketing entirely."""
        from sequence_aligner_tpu.ops.align_fused import (
            fast_dovetail_batch_fused,
        )

        if len(widths) == 1:
            res = fast_dovetail_batch_fused(
                a_rows, a_lens, b_rows, b_lens,
                width=int(widths[0]), **_align_kw,
            )
            return res, jnp.int32(0)

        pw = wtab[jnp.clip(a_lens, 0, la_max)]
        res = None
        drop_w = jnp.int32(0)
        for w, cw in zip(widths, cap_width):
            mask = out_valid & (pw == w)
            rows_idx, _, total = _compact_indices(mask, cap=cw)
            r = fast_dovetail_batch_fused(
                a_rows[rows_idx], a_lens[rows_idx],
                b_rows[rows_idx], b_lens[rows_idx],
                width=int(w), **_align_kw,
            )
            # scatter this bucket's results back; slots past the bucket's
            # fill go to the waste row so they can't clobber pair 0
            ok_slots = jnp.arange(cw, dtype=jnp.int32) < total
            tgt = jnp.where(ok_slots, rows_idx, cap_out)
            if res is None:
                res = {
                    k: jnp.zeros((cap_out + 1,), v.dtype) for k, v in r.items()
                }
            for k, v in r.items():
                res[k] = res[k].at[tgt].set(
                    jnp.where(ok_slots, v, jnp.zeros((), v.dtype))
                )
            drop_w += jnp.maximum(total - cw, 0)
        return {k: v[:cap_out] for k, v in res.items()}, drop_w

    def _sink(*arrs):
        """[1] int32 per device depending on every input (keeps truncated
        stage programs from dead-code-eliminating the work being timed)."""
        acc = jnp.int32(0)
        for a in arrs:
            acc += jnp.sum(a.astype(jnp.int32))
        return acc[None]

    def step(bases, lengths, ids):
        n_local = bases.shape[0]

        # ---- 1. local k-mers ----
        occ = kmer_scan(bases, lengths, ids, s.kmer_size)
        if stop_after == "kmer":
            return _sink(occ["hash"], occ["read_id"], occ["valid"])

        # ---- 2. hash-prefix all-to-all ----
        tgt = (occ["hash"].astype(jnp.uint32) % jnp.uint32(n_dev)).astype(jnp.int32)
        bins, drop_kmer = _route(
            dict(hash=occ["hash"], read_id=occ["read_id"], loc=occ["loc"]),
            tgt, occ["valid"], n_dev, cap_route,
        )
        recv = _exchange(bins, axis)
        occ2 = dict(
            hash=recv["hash"].reshape(-1),
            read_id=recv["read_id"].reshape(-1),
            loc=recv["loc"].reshape(-1),
            valid=recv["_sent"].reshape(-1),
        )
        if stop_after == "route":
            return _sink(occ2["hash"], occ2["read_id"], occ2["valid"])

        # ---- 3. raw pair expansion on complete hash groups ----
        fst, snd, ok, h_tot, t_tot = expand_raw_pairs(
            sort_occurrences(occ2), geom, cap_head, cap_tail
        )
        pair_overflow = ((h_tot > cap_head) | (t_tot > cap_tail)).astype(jnp.int32)

        # ---- 4. local pre-aggregation + pair-key all-to-all ----
        afst, asnd, acnt, afirst = aggregate_pairs(
            fst, snd, jnp.ones_like(fst), ok
        )
        # keep only run representatives, re-compact to cap_agg
        lfst, lsnd, lcnt, n_agg = compact_pairs(afst, asnd, acnt, afirst, cap_agg)
        agg_valid = jnp.arange(cap_agg, dtype=jnp.int32) < n_agg
        agg_overflow = (n_agg > cap_agg).astype(jnp.int32)
        ptgt = (
            (lfst.astype(jnp.uint32) * jnp.uint32(2654435761)
             ^ lsnd.astype(jnp.uint32)) % jnp.uint32(n_dev)
        ).astype(jnp.int32)
        pbins, drop_pairs = _route(
            dict(fst=lfst, snd=lsnd, cnt=lcnt),
            ptgt, agg_valid, n_dev, cap_pair_route,
        )
        precv = _exchange(pbins, axis)

        # ---- 5. owner-side global count + band filter ----
        gfst, gsnd, gcnt, gfirst = aggregate_pairs(
            precv["fst"].reshape(-1),
            precv["snd"].reshape(-1),
            precv["cnt"].reshape(-1),
            precv["_sent"].reshape(-1),
        )
        keep = gfirst & (min_c <= gcnt) & (gcnt <= max_c)
        lead, trail, _, n_out = compact_pairs(gfst, gsnd, gcnt, keep, cap_out)
        out_valid = jnp.arange(cap_out, dtype=jnp.int32) < n_out
        out_overflow = (n_out > cap_out).astype(jnp.int32)
        if stop_after == "pairs":
            return _sink(lead, trail, n_out)

        # ---- 6. fetch ONLY the needed read rows, then align ----
        need = jnp.concatenate([
            jnp.where(out_valid, lead, 0), jnp.where(out_valid, trail, 0),
        ])
        rows, lens, drop_req = _fetch_read_rows(
            need, bases, lengths, n_local, n_dev, axis, cap_req=cap_out,
        )
        a_rows, b_rows = rows[:cap_out], rows[cap_out:]
        a_lens, b_lens = lens[:cap_out], lens[cap_out:]
        if stop_after == "fetch":
            return _sink(a_rows, b_rows, a_lens, b_lens)
        res, drop_width = _align_bucketed(
            out_valid, a_rows, a_lens, b_rows, b_lens
        )
        valid = res["valid"] & out_valid
        drops = jnp.stack(
            [
                drop_kmer, drop_pairs, pair_overflow, agg_overflow,
                out_overflow, drop_req, drop_width,
            ]
        )
        return (
            valid,
            jnp.where(out_valid, lead, 0),
            jnp.where(out_valid, trail, 0),
            res["ahg"],
            res["bhg"],
            drops[None, :],  # [1, 7] per device -> [n_dev, 7] global
        )

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis) if stop_after else (P(axis),) * 6,
        check_vma=False,
    )
    return jax.jit(sharded)


# drop-counter index -> capacities to double on retry
_DROP_CAPS = (
    ("cap_route",), ("cap_pair_route",), ("cap_head", "cap_tail"),
    ("cap_agg",), ("cap_out",), ("cap_out",), ("cap_width",),
)


def sharded_overlap(
    seqs,
    s: AlignSettings,
    mesh: Mesh | None = None,
    *,
    caps: dict | None = None,
):
    """Host driver: run the sharded step and return canonical OVL records.

    Capacities default to generous bounds derived from the input size; the
    step reports drops/overflows per capacity and the driver retries with
    ONLY the overflowed capacities doubled.
    """
    from sequence_aligner_tpu.core.records import OverlapRecord
    from sequence_aligner_tpu.ops.encode import encode_reads

    if mesh is None:
        mesh = jax.make_mesh((len(jax.devices()),), ("shard",))
    n_dev = mesh.shape["shard"]
    bases, lengths = encode_reads(seqs)
    n, l = bases.shape
    pad = (-n) % n_dev
    if pad:
        bases = np.pad(bases, ((0, pad), (0, 0)))
        lengths = np.pad(lengths, (0, pad))
    ids = np.concatenate(
        [np.arange(1, n + 1, dtype=np.int32), np.zeros(pad, np.int32)]
    )
    n_kmers = int(np.sum(np.maximum(lengths - s.kmer_size + 1, 0)))
    widths = tuple(sorted({s.band_width(int(x)) for x in lengths[:n]}))

    caps = dict(caps or {})
    caps.setdefault("cap_route", max(1024, 2 * n_kmers // max(n_dev, 1)))
    caps.setdefault("cap_head", 1 << 20)
    caps.setdefault("cap_tail", 1 << 20)
    caps.setdefault("cap_agg", 1 << 18)
    caps.setdefault("cap_pair_route", max(4096, caps["cap_agg"] // max(n_dev // 2, 1)))
    caps.setdefault("cap_out", 1 << 16)
    if len(widths) > 1 and "cap_width" not in caps:
        # initial per-width bucket capacity ~ the width class's share of
        # reads (x2 slack), rounded to the Pallas lane-block multiple
        wcounts = {w: 0 for w in widths}
        for x in lengths[:n]:
            wcounts[s.band_width(int(x))] += 1
        caps["cap_width"] = tuple(
            max(1024, -(-2 * caps["cap_out"] * wcounts[w] // max(n, 1) // 256)
                * 256)
            for w in widths
        )

    multiproc = jax.process_count() > 1
    if multiproc:
        # mesh spans processes: inputs must be global arrays (each process
        # holds the full host copy and contributes its devices' rows), and
        # outputs come back via a cross-process allgather
        from jax.experimental import multihost_utils
        from jax.sharding import NamedSharding

        sharding = NamedSharding(mesh, P("shard"))

        def to_dev(x):
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx]
            )

        def to_host(x):
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    else:
        to_dev = jnp.asarray
        to_host = np.asarray

    while True:
        step = make_sharded_overlap_step(
            mesh, s, la_max=l, widths=widths, **caps
        )
        valid, lead, trail, ahg, bhg, drops = step(
            to_dev(bases), to_dev(lengths), to_dev(ids)
        )
        drops = to_host(drops).sum(axis=0)  # [7] summed over devices
        if drops.sum() == 0:
            break
        for i, capnames in enumerate(_DROP_CAPS):
            if drops[i] > 0:
                for name in capnames:
                    if isinstance(caps.get(name), tuple):
                        caps[name] = tuple(2 * c for c in caps[name])
                    else:
                        caps[name] *= 2
    valid = to_host(valid)
    lead, trail = to_host(lead), to_host(trail)
    ahg, bhg = to_host(ahg), to_host(bhg)
    idx = np.nonzero(valid)[0]
    recs = [
        OverlapRecord(
            id_a=int(lead[i]), id_b=int(trail[i]),
            ahg=int(ahg[i]), bhg=int(bhg[i]),
        )
        for i in idx
    ]
    recs.sort(key=OverlapRecord.sort_key)
    return recs
