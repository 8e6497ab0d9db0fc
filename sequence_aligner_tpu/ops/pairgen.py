"""Candidate-pair generation as sorted-array joins (the TPU idiom).

The reference's Trove hash tables (src/KmerTable.scala:26-37) cannot exist
on TPU; this module re-expresses ``calcPairData`` + ``calcDispatchData``
(src/KmerTable.scala:85-187) as sort / searchsorted / segment ops with
static capacities and masking:

  1. k-mer occurrences are bucketed by positional class (head-edge, middle,
     tail-edge — the geometry of src/ObjectStore.scala:32-35) and each class
     table is sorted by hash;
  2. the edge x middle cross products per unique k-mer become a sorted-join:
     per edge occurrence, its matching middle range is found by binary
     search, ranges are expanded into a flat pair table via cumulative
     offsets (capacity-padded, masked);
  3. pair ordering follows addKmerPair (src/KmerTable.scala:57-80): self
     pairs are dropped and the occurrence with strictly greater loc leads;
  4. ordered pairs are sorted and run-length counted; runs whose count lies
     inside [min_collisions, max_collisions] survive and are compacted.

Everything is int32/float32; no dynamic shapes escape the jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_I32_MAX = jnp.int32(2**31 - 1)


def _class_table(occ, mask):
    """Sort one positional class to the front, ordered by hash.

    Returns (hash_key, read_id, loc, in_class) arrays sorted by
    (hash with out-of-class forced to I32_MAX) ascending.
    """
    key = jnp.where(mask, occ["hash"], _I32_MAX)
    key, rid, loc, inc = jax.lax.sort(
        (key, occ["read_id"], occ["loc"], mask.astype(jnp.int32)),
        num_keys=1, is_stable=True,
    )
    return key, rid, loc, inc.astype(jnp.bool_)


def _range_join(e_key, e_inc, m_key):
    """Per edge occurrence: [left, right) range of equal-hash middle rows."""
    left = jnp.searchsorted(m_key, e_key, side="left", method="sort")
    right = jnp.searchsorted(m_key, e_key, side="right", method="sort")
    npairs = jnp.where(e_inc & (e_key != _I32_MAX), right - left, 0)
    return left, npairs


def _expand(e_tab, m_tab, left, npairs, cap: int):
    """Expand ragged join ranges into a flat capacity-padded pair table."""
    e_key, e_rid, e_loc, e_inc = e_tab
    m_key, m_rid, m_loc, m_inc = m_tab
    cum = jnp.cumsum(npairs)  # inclusive
    total = cum[-1] if npairs.shape[0] else jnp.int32(0)
    excl = cum - npairs
    t = jnp.arange(cap, dtype=jnp.int32)
    # which edge row does slot t belong to: first i with cum[i] > t
    ei = jnp.searchsorted(cum, t, side="right", method="sort")
    ei = jnp.minimum(ei, max(npairs.shape[0] - 1, 0)).astype(jnp.int32)
    off = t - excl[ei]
    mi = (left[ei] + off).astype(jnp.int32)
    mi = jnp.clip(mi, 0, max(m_key.shape[0] - 1, 0))
    ok = (t < total) & e_inc[ei] & m_inc[mi]
    a_id, a_loc = e_rid[ei], e_loc[ei]
    b_id, b_loc = m_rid[mi], m_loc[mi]
    ok &= a_id != b_id  # self pairs skipped (src/KmerTable.scala:61-63)
    # lead = occurrence with strictly greater loc; ties -> middle leads
    a_first = a_loc > b_loc
    fst = jnp.where(a_first, a_id, b_id)
    snd = jnp.where(a_first, b_id, a_id)
    return fst, snd, ok, total


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
    """occ: dict from kmer_scan.  Returns compacted candidate pairs.

    Output dict:
      lead, trail [cap_out] int32, count [cap_out] int32, n_out scalar,
      head_total / tail_total scalars (true pre-capacity pair counts for
      overflow detection), overflow bool.
    """
    loc, valid = occ["loc"], occ["valid"]
    head = valid & (loc <= head_edge)
    mid = valid & (mid_lead <= loc) & (loc <= mid_tail)
    tail = valid & (loc >= tail_edge)

    m_tab = _class_table(occ, mid)
    h_tab = _class_table(occ, head)
    t_tab = _class_table(occ, tail)

    h_left, h_np = _range_join(h_tab[0], h_tab[3], m_tab[0])
    t_left, t_np = _range_join(t_tab[0], t_tab[3], m_tab[0])

    h_fst, h_snd, h_ok, h_total = _expand(h_tab, m_tab, h_left, h_np, cap_head)
    t_fst, t_snd, t_ok, t_total = _expand(t_tab, m_tab, t_left, t_np, cap_tail)

    fst = jnp.concatenate([h_fst, t_fst])
    snd = jnp.concatenate([h_snd, t_snd])
    ok = jnp.concatenate([h_ok, t_ok])

    # ---- run-length count ordered pairs ----
    inv = (~ok).astype(jnp.int32)
    inv, fst, snd = jax.lax.sort((inv, fst, snd), num_keys=3, is_stable=False)
    ok = inv == 0
    prev_differs = jnp.concatenate(
        [
            jnp.ones((1,), jnp.bool_),
            (fst[1:] != fst[:-1]) | (snd[1:] != snd[:-1]),
        ]
    )
    first = ok & prev_differs
    run_id = jnp.cumsum(first.astype(jnp.int32)) - 1
    nseg = fst.shape[0]
    counts = jax.ops.segment_sum(ok.astype(jnp.int32), run_id, num_segments=nseg)
    cnt = counts[jnp.clip(run_id, 0, nseg - 1)]
    keep = first & (min_collisions <= cnt) & (cnt <= max_collisions)

    # ---- compact keeps into cap_out slots ----
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    n_out = jnp.sum(keep.astype(jnp.int32))
    slot = jnp.where(keep, pos, cap_out)  # dropped -> scatter to waste slot
    lead = jnp.zeros((cap_out + 1,), jnp.int32).at[slot].set(jnp.where(keep, fst, 0))
    trail = jnp.zeros((cap_out + 1,), jnp.int32).at[slot].set(jnp.where(keep, snd, 0))
    ocnt = jnp.zeros((cap_out + 1,), jnp.int32).at[slot].set(jnp.where(keep, cnt, 0))
    overflow = (
        (h_total > cap_head) | (t_total > cap_tail) | (n_out > cap_out)
    )
    return dict(
        lead=lead[:cap_out],
        trail=trail[:cap_out],
        count=ocnt[:cap_out],
        n_out=n_out,
        head_total=h_total,
        tail_total=t_total,
        overflow=overflow,
    )


@jax.jit
def pair_totals(occ, *, head_edge, tail_edge, mid_lead, mid_tail):
    """Cheap pre-pass: exact head/tail cross-product totals, for choosing
    expansion capacities before calling candidate_pairs_device."""
    loc, valid = occ["loc"], occ["valid"]
    head = valid & (loc <= head_edge)
    mid = valid & (mid_lead <= loc) & (loc <= mid_tail)
    tail = valid & (loc >= tail_edge)
    m_tab = _class_table(occ, mid)
    h_tab = _class_table(occ, head)
    t_tab = _class_table(occ, tail)
    _, h_np = _range_join(h_tab[0], h_tab[3], m_tab[0])
    _, t_np = _range_join(t_tab[0], t_tab[3], m_tab[0])
    return jnp.sum(h_np), jnp.sum(t_np)
