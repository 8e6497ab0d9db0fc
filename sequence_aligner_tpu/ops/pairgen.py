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
    end via a +inf key."""
    key = jnp.where(occ["valid"], occ["hash"], _I32_MAX)
    key, rid, loc, val = jax.lax.sort(
        (key, occ["read_id"], occ["loc"], occ["valid"].astype(jnp.int32)),
        num_keys=1, is_stable=False,
    )
    return dict(hash=key, read_id=rid, loc=loc, valid=val.astype(jnp.bool_))


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


@partial(jax.jit, static_argnames=("cap_head", "cap_tail", "cap_out"))
def candidate_pairs_device(
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
):
    """occ: dict from kmer_scan (unsorted).  Returns compacted candidate
    pairs: lead/trail/count [cap_out], n_out, head_total, tail_total,
    overflow."""
    geom = dict(
        head_edge=head_edge, tail_edge=tail_edge,
        mid_lead=mid_lead, mid_tail=mid_tail,
    )
    occ_sorted = sort_occurrences(occ)
    fst, snd, ok, h_total, t_total = expand_raw_pairs(
        occ_sorted, geom, cap_head, cap_tail
    )
    fst, snd, cnt, first = aggregate_pairs(fst, snd, jnp.ones_like(fst), ok)
    keep = first & (min_collisions <= cnt) & (cnt <= max_collisions)
    lead, trail, ocnt, n_out = compact_pairs(fst, snd, cnt, keep, cap_out)
    overflow = (h_total > cap_head) | (t_total > cap_tail) | (n_out > cap_out)
    return dict(
        lead=lead, trail=trail, count=ocnt, n_out=n_out,
        head_total=h_total, tail_total=t_total, overflow=overflow,
    )
