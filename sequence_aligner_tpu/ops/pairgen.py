"""Candidate-pair generation as sorted-array joins (the TPU idiom).

The reference's Trove hash tables (src/KmerTable.scala:26-37) cannot exist
on TPU; this module re-expresses ``calcPairData`` + ``calcDispatchData``
(src/KmerTable.scala:85-187) as sort / binary-search / segment ops with
static capacities and masking:

  1. the occurrence table is sorted by hash ONCE; per-row segment bounds
     come from vectorized binary search;
  2. positional classes (head-edge / middle / tail-edge, geometry of
     src/ObjectStore.scala:32-35) are masks over the sorted table — the
     middle class additionally gets a rank->row compaction so each hash
     segment's middle members are addressable by rank;
  3. every edge occurrence's cross product with its segment's middle
     members is expanded into a flat pair table via cumulative offsets
     (capacity-padded, masked);
  4. pair ordering follows addKmerPair (src/KmerTable.scala:57-80): self
     pairs are dropped and the occurrence with strictly greater loc leads;
  5. ordered pairs are aggregated by a two-pass stable 1-key sort (snd,
     then fst with the invalid bit packed into the key) and run-length
     counted; runs inside [min_collisions, max_collisions] survive.

Compile-cost design (axon remote-compile measurements): multi-key
``lax.sort`` and ``searchsorted(method='sort')`` compile 10-50x slower
than 1-key sorts / unrolled binary search, so this module uses exactly two
1-key sort passes for aggregation, one 1-key sort for the table, and
binary-search joins everywhere else.  All shapes static.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_I32_MAX = jnp.int32(2**31 - 1)


def _ss(arr, q):
    """Vectorized binary search (small compiled program)."""
    return jnp.searchsorted(arr, q, side="left", method="scan_unrolled")


def _ss_right(arr, q):
    return jnp.searchsorted(arr, q, side="right", method="scan_unrolled")


def _compact_indices(mask, cap=None):
    """Indices of True entries, packed to the front of a static array.
    Returns (rows [cap] int32, prefix [n] int32 exclusive, total)."""
    n = mask.shape[0]
    cap = n if cap is None else cap
    incl = jnp.cumsum(mask.astype(jnp.int32))
    total = incl[-1] if n else jnp.int32(0)
    pos = incl - mask.astype(jnp.int32)  # exclusive prefix
    slot = jnp.where(mask, pos, cap)
    rows = jnp.zeros((cap + 1,), jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    return rows[:cap], pos, total


def sort_occurrences(occ):
    """One-time hash sort of the occurrence table; invalid rows sink to the
    end via a +inf key.  2-operand sort + gathers (multi-operand sorts
    compile far slower on the TPU toolchain)."""
    n = occ["hash"].shape[0]
    key = jnp.where(occ["valid"], occ["hash"], _I32_MAX)
    key, perm = jax.lax.sort(
        (key, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=False
    )
    return dict(
        hash=key,
        read_id=occ["read_id"][perm],
        loc=occ["loc"][perm],
        valid=occ["valid"][perm],
    )


def expand_raw_pairs(occ_sorted, geom, cap_head: int, cap_tail: int):
    """Hash-sorted occurrence table -> flat ordered-pair table (fst, snd,
    ok) of static size cap_head + cap_tail, pre-counting."""
    h = occ_sorted["hash"]
    rid = occ_sorted["read_id"]
    loc = occ_sorted["loc"]
    valid = occ_sorted["valid"] & (h != _I32_MAX)
    n = h.shape[0]

    is_head = valid & (loc <= geom["head_edge"])
    is_mid = valid & (geom["mid_lead"] <= loc) & (loc <= geom["mid_tail"])
    is_tail = valid & (loc >= geom["tail_edge"])

    # middle-class rank -> table row
    mid_rows, mid_prefix, mid_total = _compact_indices(is_mid)
    # prefix extended to length n+1 so counts in [l, r) index directly
    mid_pref_full = jnp.concatenate([mid_prefix, mid_total[None]])
    # per-row hash segment bounds (binary search over the sorted hashes)
    seg_l = _ss(h, h)
    seg_r = _ss_right(h, h)
    mid_base = mid_pref_full[seg_l]
    mid_cnt = mid_pref_full[seg_r] - mid_base
    def _expand(edge_mask, cap):
        npairs = jnp.where(edge_mask, mid_cnt, 0)
        cum = jnp.cumsum(npairs)
        total = cum[-1] if n else jnp.int32(0)
        excl = cum - npairs
        t = jnp.arange(cap, dtype=jnp.int32)
        ei = _ss_right(cum, t)
        ei = jnp.minimum(ei, max(n - 1, 0)).astype(jnp.int32)
        off = t - excl[ei]
        mrank = mid_base[ei] + off
        mrow = mid_rows[jnp.clip(mrank, 0, max(mid_rows.shape[0] - 1, 0))]
        ok = (t < total) & edge_mask[ei]
        a_id, a_loc = rid[ei], loc[ei]
        b_id, b_loc = rid[mrow], loc[mrow]
        ok &= a_id != b_id  # self pairs skipped (src/KmerTable.scala:61-63)
        a_first = a_loc > b_loc  # strict-greater loc leads (:65-71)
        fst = jnp.where(a_first, a_id, b_id)
        snd = jnp.where(a_first, b_id, a_id)
        return fst, snd, ok, total

    h_fst, h_snd, h_ok, h_total = _expand(is_head, cap_head)
    t_fst, t_snd, t_ok, t_total = _expand(is_tail, cap_tail)
    fst = jnp.concatenate([h_fst, t_fst])
    snd = jnp.concatenate([h_snd, t_snd])
    ok = jnp.concatenate([h_ok, t_ok])
    return fst, snd, ok, h_total, t_total


def aggregate_pairs(fst, snd, weight, ok):
    """Sum weights per distinct ordered pair via two stable 1-key sorts
    (radix-style: sort by snd, then by fst with the invalid bit packed into
    the key's top bits).  Returns (fst, snd, total, is_first_of_run)."""
    key1 = snd
    key1, fst, snd, weight, oki = jax.lax.sort(
        (key1, fst, snd, weight, ok.astype(jnp.int32)), num_keys=1,
        is_stable=True,
    )
    # pack validity above the id range (ids are positive < 2^30)
    key2 = fst | jnp.where(oki == 0, jnp.int32(1 << 30), 0)
    key2, fst, snd, weight, oki = jax.lax.sort(
        (key2, fst, snd, weight, oki), num_keys=1, is_stable=True
    )
    ok = oki == 1
    prev_differs = jnp.concatenate(
        [
            jnp.ones((1,), jnp.bool_),
            (fst[1:] != fst[:-1]) | (snd[1:] != snd[:-1]),
        ]
    )
    first = ok & prev_differs
    run_id = jnp.cumsum(first.astype(jnp.int32)) - 1
    nseg = fst.shape[0]
    totals = jax.ops.segment_sum(
        jnp.where(ok, weight, 0), run_id, num_segments=nseg
    )
    cnt = totals[jnp.clip(run_id, 0, nseg - 1)]
    return fst, snd, cnt, first


def compact_pairs(fst, snd, cnt, keep, cap_out: int):
    """Scatter kept rows into a dense capacity-padded table."""
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    n_out = jnp.sum(keep.astype(jnp.int32))
    slot = jnp.where(keep, pos, cap_out)  # dropped -> waste slot
    lead = jnp.zeros((cap_out + 1,), jnp.int32).at[slot].set(jnp.where(keep, fst, 0))
    trail = jnp.zeros((cap_out + 1,), jnp.int32).at[slot].set(jnp.where(keep, snd, 0))
    ocnt = jnp.zeros((cap_out + 1,), jnp.int32).at[slot].set(jnp.where(keep, cnt, 0))
    return lead[:cap_out], trail[:cap_out], ocnt[:cap_out], n_out


@jax.jit
def sort_occurrences_jit(occ):
    """Standalone jitted hash sort (so the sort compiles once and its
    result is shared by the planning pass and the pair stream)."""
    return sort_occurrences(occ)


@jax.jit
def plan_totals_device(occ_sorted, head_edge, tail_edge, mid_lead, mid_tail):
    """Exact raw head x middle / tail x middle cross-product totals,
    computed on device from the hash-sorted occurrence table.

    Device-side replacement of the NumPy ``ops.plan.plan_pair_capacities``
    (which re-hashed every read on host, an O(N*L log) bottleneck at scale):
    the per-kmer role counts fall out of the same segment-bound binary
    searches the stream itself uses, and only two scalars come back to the
    host.  Mirrors calcPairData's pair-count accounting
    (src/KmerTable.scala:105-128).
    """
    h = occ_sorted["hash"]
    loc = occ_sorted["loc"]
    valid = occ_sorted["valid"] & (h != _I32_MAX)
    is_head = valid & (loc <= head_edge)
    is_mid = valid & (mid_lead <= loc) & (loc <= mid_tail)
    is_tail = valid & (loc >= tail_edge)
    _, mid_prefix, mid_total = _compact_indices(is_mid, cap=1)
    mid_pref_full = jnp.concatenate([mid_prefix, mid_total[None]])
    seg_l = _ss(h, h)
    seg_r = _ss_right(h, h)
    mid_cnt = (mid_pref_full[seg_r] - mid_pref_full[seg_l]).astype(jnp.int64)
    h_total = jnp.sum(jnp.where(is_head, mid_cnt, 0))
    t_total = jnp.sum(jnp.where(is_tail, mid_cnt, 0))
    return h_total, t_total


@partial(
    jax.jit, static_argnames=("cap_head", "cap_tail", "cap_out", "presorted")
)
def candidate_pairs_stream(
    occ,
    *,
    head_edge,
    tail_edge,
    mid_lead,
    mid_tail,
    min_collisions,
    max_collisions,
    cap_head: int,
    cap_tail: int,
    cap_out: int,
    presorted: bool = False,
):
    """Global-stream candidate generation (the single-chip fast path).

    Expands the full edge x middle cross-product stream
    (``expand_raw_pairs``) and aggregates it with two 2-operand stable
    1-key sorts + run-length counting.  Everything is 1-D: on TPU, flat
    gathers from flat tables are near-free while 2-D lane-axis gathers
    (take_along_axis) cost ~100 ms per 16M elements — the earlier
    per-lead-row design (``candidate_pairs_device``) was built around the
    latter and paid ~10 s at 4k reads; this path is ~50x faster.

    Capacities are host-exact: ``plan_pair_capacities`` computes the true
    h_total/t_total so only cap_out can overflow (retry with 2x).

    Semantics identical to calcPairData + calcDispatchData
    (src/KmerTable.scala:85-187): per unique k-mer, head-edge x middle and
    tail-edge x middle pairs, loc-ordered (strictly greater loc leads,
    src/KmerTable.scala:65-71), self-pairs dropped, collision count kept
    within [min_collisions, max_collisions].
    """
    occ_s = occ if presorted else sort_occurrences(occ)
    geom = dict(
        head_edge=head_edge, tail_edge=tail_edge,
        mid_lead=mid_lead, mid_tail=mid_tail,
    )
    fst, snd, ok, h_tot, t_tot = expand_raw_pairs(
        occ_s, geom, cap_head, cap_tail
    )
    n = fst.shape[0]

    # ---- radix aggregation: stable sort by snd, then by fst ----
    fstm = jnp.where(ok, fst, _I32_MAX)
    key1 = jnp.where(ok, snd, _I32_MAX)
    key1, fstm = jax.lax.sort((key1, fstm), num_keys=1, is_stable=True)
    fst2, snd2 = jax.lax.sort((fstm, key1), num_keys=1, is_stable=True)
    okv = fst2 != _I32_MAX

    # ---- run-length counts via forward/backward run-boundary fills ----
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate(
        [
            jnp.ones((1,), jnp.bool_),
            (fst2[1:] != fst2[:-1]) | (snd2[1:] != snd2[:-1]),
        ]
    )
    start_fill = jax.lax.cummax(jnp.where(first, idx, 0))
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(jnp.where(first, idx, _I32_MAX))))
    nxt = jnp.concatenate([nxt[1:], jnp.full((1,), n, jnp.int32)])
    cnt = jnp.minimum(nxt, n) - start_fill  # exact at run-start positions

    keep = first & okv & (min_collisions <= cnt) & (cnt <= max_collisions)
    lead, trail, ocnt, n_out = compact_pairs(fst2, snd2, cnt, keep, cap_out)
    overflow = (h_tot > cap_head) | (t_tot > cap_tail) | (n_out > cap_out)
    return dict(
        lead=lead, trail=trail, count=ocnt, n_out=n_out,
        h_tot=h_tot, t_tot=t_tot, overflow=overflow,
    )


@partial(
    jax.jit,
    static_argnames=("n_rows", "occ_max", "row_cap", "cap_out"),
)
def candidate_pairs_device(
    occ,
    group_lookup,
    group_reads,
    *,
    head_edge,
    tail_edge,
    mid_lead,
    mid_tail,
    min_collisions,
    max_collisions,
    n_rows: int,
    occ_max: int,
    row_cap: int,
    cap_out: int,
):
    """Per-lead-read segmented pair counting.

    Instead of materializing and sorting the full edge x middle
    cross-product stream (tens of millions of raw pairs whose giant sorts
    are impractical to compile), each ordered pair (fst, snd) is counted in
    its LEAD read's row: every occurrence contributes role expansions
    (head-edge vs mids, tail-edge vs mids, mid vs heads, mid vs tails), and
    the addKmerPair loc-ordering rule (src/KmerTable.scala:57-80) assigns
    each (edge, mid) coincidence to exactly one perspective — the one whose
    read leads.  Rows of size ``row_cap`` are then sorted independently
    (small batched bitonic program) and run-length counted, giving exact
    global per-pair counts with every compiled sort fixed-size.

    This mirrors the reference's dispatch-block structure (lead + trailing
    set, src/KmerTable.scala:246-273) as the parallel decomposition.

    ``group_lookup`` [max_read_id + 1] maps a read id to its row in this
    call's read group (-1 if not in the group) and ``group_reads`` [n_rows]
    maps rows back to read ids — the host driver partitions reads into
    row-size tiers so heavy (repeat-rich) reads run at a larger row_cap
    without inflating everyone's arrays.  Counterpart (snd) reads are
    unrestricted, so per-group counts are exact global counts.

    Returns dict: lead/trail/count [cap_out], n_out, drop_occ (occurrences
    past occ_max per read), drop_row (row entries past row_cap), overflow.
    """
    occ_s = sort_occurrences(occ)
    h = occ_s["hash"]
    rid = occ_s["read_id"]
    loc = occ_s["loc"]
    valid = occ_s["valid"] & (h != _I32_MAX)
    n = h.shape[0]

    is_head = valid & (loc <= head_edge)
    is_mid = valid & (mid_lead <= loc) & (loc <= mid_tail)
    is_tail = valid & (loc >= tail_edge)

    # role member tables: rank -> hash-sorted row
    mid_rows, mid_pref, mid_tot = _compact_indices(is_mid)
    head_rows, head_pref, head_tot = _compact_indices(is_head)
    tail_rows, tail_pref, tail_tot = _compact_indices(is_tail)
    mid_f = jnp.concatenate([mid_pref, mid_tot[None]])
    head_f = jnp.concatenate([head_pref, head_tot[None]])
    tail_f = jnp.concatenate([tail_pref, tail_tot[None]])
    cat_rows = jnp.concatenate([mid_rows, head_rows, tail_rows])

    # per-occurrence segment info (hash order)
    seg_l = _ss(h, h)
    seg_r = _ss_right(h, h)
    mid_base = mid_f[seg_l]
    midc = mid_f[seg_r] - mid_base
    head_base = head_f[seg_l]
    headc = head_f[seg_r] - head_base
    tail_base = tail_f[seg_l]
    tailc = tail_f[seg_r] - tail_base

    z = jnp.zeros_like(midc)
    nh = jnp.where(is_head, midc, z)
    nt = jnp.where(is_tail, midc, z)
    nmh = jnp.where(is_mid, headc, z)
    nmt = jnp.where(is_mid, tailc, z)
    r1 = nh
    r2 = nh + nt
    r3 = r2 + nmh
    r4 = r3 + nmt  # n_o

    # ---- order descriptors by group row (1 small sort + gathers) ----
    grow = group_lookup[jnp.clip(rid, 0, group_lookup.shape[0] - 1)]
    rkey = jnp.where(valid & (r4 > 0) & (grow >= 0), grow, _I32_MAX)
    rkey_s, perm = jax.lax.sort(
        (rkey, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    g = lambda a: a[perm]
    n_o = g(r4)
    # per-read block base offsets
    incl = jnp.cumsum(n_o)
    excl = incl - n_o
    read_start = _ss(rkey_s, rkey_s)
    base = excl - excl[read_start]
    occ_rank = jnp.arange(n, dtype=jnp.int32) - read_start

    dok = (rkey_s != _I32_MAX) & (occ_rank < occ_max)
    drop_occ = jnp.sum(((rkey_s != _I32_MAX) & (occ_rank >= occ_max)).astype(jnp.int32))
    rrow = jnp.clip(rkey_s, 0, n_rows - 1)
    dslot = jnp.where(dok, rrow * occ_max + occ_rank, n_rows * occ_max)

    # single stacked scatter for all 9 descriptor fields (separate scatters
    # each cost ~12s of TPU compile); loc travels bitcast as int32
    fields = jnp.stack(
        [
            base,                      # 0: base offset in the read row
            g(r1), g(r2), g(r3), g(r4),  # 1-4: role boundaries
            g(mid_base),               # 5: counterpart rank bases
            g(head_base) + n,          #    (global offsets into cat_rows)
            g(tail_base) + 2 * n,
            jax.lax.bitcast_convert_type(g(loc), jnp.int32),  # 8: occ loc
        ],
        axis=1,
    )
    fills = jnp.asarray(
        [_I32_MAX, 0, 0, 0, 0, 0, 0, 0, 0], dtype=jnp.int32
    )
    buf = jnp.broadcast_to(fills, (n_rows * occ_max + 1, 9))
    packed = buf.at[dslot].set(jnp.where(dok[:, None], fields, fills))
    packed = packed[: n_rows * occ_max].reshape(n_rows, occ_max, 9)
    d_base = packed[:, :, 0]
    d_r1, d_r2, d_r3, d_r4 = (packed[:, :, i] for i in range(1, 5))
    d_mb, d_hb, d_tb = (packed[:, :, i] for i in range(5, 8))
    d_loc = jax.lax.bitcast_convert_type(packed[:, :, 8], jnp.float32)

    # per-row raw totals / overflow
    row_tot = jax.ops.segment_sum(
        jnp.where(valid & (grow >= 0), r4, 0),
        jnp.clip(grow, 0, n_rows - 1),
        num_segments=n_rows,
    )
    drop_row = jnp.sum(jnp.maximum(row_tot - row_cap, 0))

    # ---- expansion into per-read rows ----
    t = jnp.arange(row_cap, dtype=jnp.int32)

    def row_desc(base_row):
        return jnp.searchsorted(
            base_row, t, side="right", method="scan_unrolled"
        ).astype(jnp.int32) - 1

    d_idx = jax.vmap(row_desc)(d_base)  # [n_rows, row_cap]
    d_idx = jnp.clip(d_idx, 0, occ_max - 1)
    take = lambda m: jnp.take_along_axis(m, d_idx, axis=1)
    local = t[None, :] - take(d_base)
    rr1, rr2, rr3, rr4 = take(d_r1), take(d_r2), take(d_r3), take(d_r4)
    in_exp = (local >= 0) & (local < rr4)
    crank = jnp.where(
        local < rr1, take(d_mb) + local,
        jnp.where(
            local < rr2, take(d_mb) + (local - rr1),
            jnp.where(
                local < rr3, take(d_hb) + (local - rr2),
                take(d_tb) + (local - rr3),
            ),
        ),
    )
    crow = cat_rows[jnp.clip(crank, 0, 3 * n - 1)]
    snd = rid[crow]
    sloc = loc[crow]
    o_loc = take(d_loc)
    is_edge_role = local < rr2
    # lead rule: edge role counts iff o.loc > counterpart loc; mid role
    # counts iff counterpart (edge) loc <= o.loc — ties lead the mid side
    lead_ok = jnp.where(is_edge_role, o_loc > sloc, sloc <= o_loc)
    me = group_reads[:, None]
    ok = in_exp & lead_ok & (snd != me)
    val = jnp.where(ok, snd, _I32_MAX)

    # ---- per-row sort + run-length count ----
    val_s = jax.lax.sort(val, dimension=1, is_stable=False)
    first = jnp.concatenate(
        [
            jnp.ones((n_rows, 1), jnp.bool_),
            val_s[:, 1:] != val_s[:, :-1],
        ],
        axis=1,
    ) & (val_s != _I32_MAX)

    def row_counts(row):
        lo = jnp.searchsorted(row, row, side="left", method="scan_unrolled")
        hi = jnp.searchsorted(row, row, side="right", method="scan_unrolled")
        return (hi - lo).astype(jnp.int32)

    cnt = jax.vmap(row_counts)(val_s)
    keep = first & (min_collisions <= cnt) & (cnt <= max_collisions)

    # ---- global compaction ----
    flat_keep = keep.reshape(-1)
    flat_lead = jnp.broadcast_to(me, (n_rows, row_cap)).reshape(-1)
    flat_trail = val_s.reshape(-1)
    flat_cnt = cnt.reshape(-1)
    lead, trail, ocnt, n_out = compact_pairs(
        flat_lead, flat_trail, flat_cnt, flat_keep, cap_out
    )
    overflow = (drop_occ > 0) | (drop_row > 0) | (n_out > cap_out)
    return dict(
        lead=lead, trail=trail, count=ocnt, n_out=n_out,
        drop_occ=drop_occ, drop_row=drop_row, overflow=overflow,
    )
