"""The end-to-end overlap engine (flagship model).

Drives the device ops through the reference's production call stack
(src/Project4.scala:56-59: k-mer table -> candidate dispatch -> block
alignment -> OVL emission), re-expressed as device-resident jitted
stages:

  encode (host)  ->  kmer_scan (jit)  ->  hash sort + device capacity
  plan (jit, two scalar fetches)  ->  candidate_pairs_stream (jit, exact
  capacities, no retries)  ->  device width-bucketing  ->  SPLIT-PHASE
  align: phase-1 Pallas chunks (anchoring; ~54% of candidates dud and
  stop here)  ->  one dove-length sort (tiers become contiguous slices)
  ->  phase-2 Pallas chunks per tier, looping only the tier's rows  ->
  device valid-compaction  ->  tier-sliced host fetches  ->  canonical
  sort + array-native OVL emission.

Everything between the encoded reads going up and the valid overlap
records coming down stays on device: the candidate-pair table, the
width-bucket index lists, and the per-chunk alignment results are never
round-tripped (the round-1 engine fetched the 13.9M-pair table and
re-uploaded per-batch index slices — ~100 MB each way over the remote
device tunnel).

The reference's "block" strategy (lead read + trailing set sharing DP
buffers, src/KmerTable.scala:246-273) maps here to batching: hundreds of
thousands of pairs per kernel launch with uniform band geometry.
"""

from __future__ import annotations

import dataclasses
import os
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sequence_aligner_tpu.core.records import OverlapRecord, Sequence
from sequence_aligner_tpu.core.settings import AlignSettings
from sequence_aligner_tpu.io.fasta import read_fasta
from sequence_aligner_tpu.ops.align_lax import (
    OUT_KEYS, local_align_batch, stack_result,
)
from sequence_aligner_tpu.ops.encode import encode_reads
from sequence_aligner_tpu.ops.kmer import kmer_scan
from sequence_aligner_tpu.ops.pairgen import (
    candidate_pairs_stream, plan_totals, sort_occurrences_jit,
    sort_occurrences_packed_jit,
)

# Per-class raw-stream ceiling for the single-device engine: the expansion
# indexes streams with int32 (and a 2^31-slot int32 stream is ~8.6 GB —
# beyond one chip's HBM regardless).  _cap_at_least pads by <= 12.5%, so
# stay 9/8 under 2^31.  Larger inputs must use the sharded engine
# (parallel/shard.py), which splits the stream across devices.
_MAX_STREAM = (2**31 - 1) * 8 // 9
from sequence_aligner_tpu.utils.debug import debug_enabled, printdb
from sequence_aligner_tpu.utils.timing import StageTimer


def _pow2_at_least(n: int, floor: int = 1024) -> int:
    c = floor
    while c < n:
        c *= 2
    return c


def _cap_at_least(n: int, floor: int = 1024) -> int:
    """Static capacity tier: next multiple of pow2/8 above n (<= 12.5%
    padding).  Every stream op pays for the PADDED size, so pure pow2
    tiers (up to 2x waste) nearly double the pairgen sort/scan cost."""
    p = _pow2_at_least(n, floor)
    step = p // 8
    return ((n + step - 1) // step) * step


@dataclasses.dataclass
class OverlapStats:
    n_reads: int = 0
    n_kmers: int = 0
    n_candidate_pairs: int = 0
    n_alignments: int = 0
    n_valid: int = 0
    # split-align accounting: pairs surviving phase-1 dud compaction, and
    # the DP cells the tiered kernels actually loop over (dp_cells) vs
    # the two-full-band volume the non-split engine would fill
    # (dp_cells_raw, comparable across rounds/configurations — VERDICT
    # r4 #7: %-of-peak claims need a definition-stable denominator)
    n_phase2_pairs: int = 0
    dp_cells: int = 0
    dp_cells_raw: int = 0


@jax.jit
def _bucket_indices(lead, lengths, wtab, w, n_out):
    """Device compaction of candidate-pair positions whose lead read's
    band width equals ``w``.  Returns (idx [cap], count)."""
    cap = lead.shape[0]
    la = lengths[jnp.clip(lead - 1, 0, lengths.shape[0] - 1)]
    pw = wtab[jnp.clip(la, 0, wtab.shape[0] - 1)]
    pos = jnp.arange(cap, dtype=jnp.int32)
    mask = (pw == w) & (pos < n_out)
    incl = jnp.cumsum(mask.astype(jnp.int32))
    slot = jnp.where(mask, incl - 1, cap)
    idx = jnp.zeros((cap + 1,), jnp.int32).at[slot].set(pos)
    return idx[:cap], incl[cap - 1]


def _align_chunk_body(
    bases, lengths, packed, lead, trail, idx, lo, count, *,
    bs: int, width: int, la_max: int, cm_tuple, gO: int, gE: int,
    min_identity, min_overlap, max_ignore, pblk: int, kernel: str,
    ident_idx: bool = False,
):
    """Shared chunk body: gather pair operands from the device-resident
    pair table via the bucket index array and run the selected aligner.
    ``ident_idx`` marks the bucket index as the identity permutation
    (single band width): the pair table is then dynamic-sliced directly,
    skipping 3 chunk-sized gathers (``idx`` may be a dummy).
    Returns (res dict, lead_c, trail_c, in_range)."""
    if ident_idx:
        lead_c = jax.lax.dynamic_slice(lead, (lo,), (bs,))
        trail_c = jax.lax.dynamic_slice(trail, (lo,), (bs,))
    else:
        sel = jax.lax.dynamic_slice(idx, (lo,), (bs,))
        lead_c = lead[sel]
        trail_c = trail[sel]
    a_idx = jnp.clip(lead_c - 1, 0, bases.shape[0] - 1)
    b_idx = jnp.clip(trail_c - 1, 0, bases.shape[0] - 1)
    kw = dict(
        gO=gO, gE=gE, min_identity=min_identity, min_overlap=min_overlap,
        max_ignore=max_ignore, la_max=la_max, lb_max=la_max,
    )
    if kernel == "fused":
        from sequence_aligner_tpu.ops.align_fused import (
            _dove_shift_packed, _fused_core, _fused_core_packed, _interpret,
            kernel_interpret,
        )

        if not _interpret():
            # TPU: gather only the packed words (16x fewer elements than
            # the [la_max, bs] code planes); kernels unpack in VMEM and
            # run the dove shift in-register
            res = _fused_core_packed(
                packed[a_idx].T, packed[b_idx].T,
                lengths[a_idx], lengths[b_idx],
                cm_tuple=cm_tuple, width=width, pblk=pblk,
                interpret=kernel_interpret(), **kw,
            )
        else:
            a_t = bases[a_idx].astype(jnp.int32).T
            b_t = bases[b_idx].astype(jnp.int32).T
            res = _fused_core(
                a_t, b_t, lengths[a_idx], lengths[b_idx],
                lambda ds: _dove_shift_packed(packed, a_idx, ds, la_max),
                cm_tuple=cm_tuple, width=width, pblk=pblk, **kw,
            )
    else:  # quadratic full SW
        ab, al = bases[a_idx], lengths[a_idx]
        bb, bl = bases[b_idx], lengths[b_idx]
        cm = jnp.asarray(np.asarray(cm_tuple, np.int32).reshape(4, 4))
        res = local_align_batch(ab, al, bb, bl, cm=cm, **kw)
    in_range = (lo + jnp.arange(bs, dtype=jnp.int32)) < count
    return res, lead_c, trail_c, in_range


@partial(
    jax.jit,
    static_argnames=(
        "bs", "width", "la_max", "cm_tuple", "gO", "gE", "pblk", "kernel",
    ),
)
def _align_chunk(
    bases, lengths, packed, lead, trail, idx, lo, count, *,
    bs: int, width: int, la_max: int, cm_tuple, gO: int, gE: int,
    min_identity, min_overlap, max_ignore, pblk: int, kernel: str,
):
    """Full per-pair results for one chunk: stacked [bs, 12] int32 — the
    10 OUT_KEYS rows (``valid`` masked to positions < count) plus lead
    and trail read ids.  Host-facing surface (``Overlapper._align``)."""
    res, lead_c, trail_c, in_range = _align_chunk_body(
        bases, lengths, packed, lead, trail, idx, lo, count,
        bs=bs, width=width, la_max=la_max, cm_tuple=cm_tuple, gO=gO, gE=gE,
        min_identity=min_identity, min_overlap=min_overlap,
        max_ignore=max_ignore, pblk=pblk, kernel=kernel,
    )
    res = dict(res)
    res["valid"] = res["valid"] & in_range
    # rows-are-pairs layout [bs, 12]: downstream consumers slice whole
    # rows, so no [12, N]->[N, 12] transpose is ever needed
    return jnp.concatenate(
        [stack_result(res), lead_c[None, :], trail_c[None, :]], axis=0
    ).T


def _compact_valid_sort(valid, cols, vcap: int):
    """Valid-row compaction BY SORT, not scatter: a [14.7M, 2] row
    scatter measured 1.3 s on this chip while the equivalent unstable
    multi-operand sort is ~0.15 s (the same finding that shaped the
    pairgen finish).  Rows sort by (valid ? position : +inf), packing
    valid rows to the front in original order; slots past the count
    carry sunken garbage that callers never read (count-sliced fetches /
    offset-overwritten concat).  Returns ([vcap, ncol], count)."""
    bs = valid.shape[0]
    keyv = jnp.where(
        valid, jnp.arange(bs, dtype=jnp.int32), jnp.int32(2**31 - 1)
    )
    ops = jax.lax.sort(
        (keyv, *(cols[:, i] for i in range(cols.shape[1]))),
        num_keys=1, is_stable=False,
    )
    buf = jnp.stack(ops[1:], axis=1)[:vcap]
    return buf, jnp.sum(valid.astype(jnp.int32))


@partial(
    jax.jit,
    static_argnames=(
        "bs", "width", "la_max", "cm_tuple", "gO", "gE", "pblk", "kernel",
        "vcap", "pack_out", "ident_idx",
    ),
)
def _align_chunk_compact(
    bases, lengths, packed, lead, trail, idx, lo, count, *,
    bs: int, width: int, la_max: int, cm_tuple, gO: int, gE: int,
    min_identity, min_overlap, max_ignore, pblk: int, kernel: str,
    vcap: int, pack_out: bool = False, ident_idx: bool = False,
):
    """Production chunk: per-chunk VALID-row compaction on device.

    Returns ([vcap, 4] int32 of (lead, trail, ahg, bhg) for the chunk's
    valid overlaps, count) — 2-int32 packed rows with ``pack_out``, as
    in _phase2_chunk_compact.  Only ~3% of pairs validate, so this
    shrinks the align stage's device->host traffic and eliminates the
    [n_pairs, 12] stacked intermediate entirely (667 MB at 13.9M pairs)."""
    res, lead_c, trail_c, in_range = _align_chunk_body(
        bases, lengths, packed, lead, trail, idx, lo, count,
        bs=bs, width=width, la_max=la_max, cm_tuple=cm_tuple, gO=gO, gE=gE,
        min_identity=min_identity, min_overlap=min_overlap,
        max_ignore=max_ignore, pblk=pblk, kernel=kernel,
        ident_idx=ident_idx,
    )
    valid = res["valid"] & in_range
    if pack_out:
        cols4 = jnp.stack(
            [(lead_c << 16) | trail_c,
             (res["bhg"] << 16) | (res["ahg"] & 0xFFFF)], axis=1
        )
    else:
        cols4 = jnp.stack([lead_c, trail_c, res["ahg"], res["bhg"]], axis=1)
    return _compact_valid_sort(valid, cols4, vcap)


def _dove_tiers(
    la_max: int, width: int, min_overlap: int, min_identity: float,
) -> tuple[tuple[int, int], ...]:
    """Static (lo, hi] dove-length buckets for the split phase-2 pass;
    each bucket's kernel loops only ``hi`` rows.  Non-dud dove lengths
    are near-uniform in [0, la] in practice (probed on c_ruddii), so
    thirds cut phase-2 row work to ~2/3 on top of the dud skip.

    Pairs below the first bucket are PROVABLY invalid and skipped: every
    backtrack step consumes a column, steps = du + dk + #Y with
    du <= dove_len, dk <= w, and gaps are errors, so
    steps * min_identity <= dove_len + w; validity needs
    steps >= min_overlap, hence dove_len >= min_overlap*min_identity - w.
    """
    import math

    lo0 = max(-1, int(math.floor(min_overlap * min_identity - width)) - 1)
    if la_max <= 48:
        return ((lo0, la_max),)
    t1 = max(width + 4, la_max // 3, lo0 + 1)
    t2 = max(2 * la_max // 3, t1 + 1)
    if t2 >= la_max:
        return ((lo0, t1), (t1, la_max))
    return ((lo0, t1), (t1, t2), (t2, la_max))


@partial(
    jax.jit,
    static_argnames=(
        "bs", "width", "la_max", "cm_tuple", "gO", "gE", "pblk", "ulen",
        "ident_idx",
    ),
)
def _phase1_chunk(
    bases, lengths, packed, lead, trail, idx, lo, count, *,
    bs: int, width: int, la_max: int, cm_tuple, gO: int, gE: int, pblk: int,
    ulen: int = 0, ident_idx: bool = False,
):
    """Split-align pass A: phase-1 anchoring only.  Returns the chunk's
    per-pair dove lengths [bs] int32 with -1 marking DUD pairs (phase-1
    backtrack fails to reach B column 0, src/BioLibs.scala:464-466).
    Duds can never validate, so phase 2 — the costlier kernel — never
    sees them (~54% of candidates on the c_ruddii bench).  ``ident_idx``
    slices the pair table directly (single band width)."""
    from sequence_aligner_tpu.ops.align_fused import (
        _interpret, _phase1_fused_scan, kernel_interpret,
        phase1_fused_packed,
    )

    if ident_idx:
        lead_c = jax.lax.dynamic_slice(lead, (lo,), (bs,))
        trail_c = jax.lax.dynamic_slice(trail, (lo,), (bs,))
    else:
        sel = jax.lax.dynamic_slice(idx, (lo,), (bs,))
        lead_c = lead[sel]
        trail_c = trail[sel]
    a_idx = jnp.clip(lead_c - 1, 0, bases.shape[0] - 1)
    b_idx = jnp.clip(trail_c - 1, 0, bases.shape[0] - 1)
    if ulen:  # uniform read length: skip ~2 scalar-gather streams
        a_len = b_len = jnp.full((bs,), ulen, jnp.int32)
    else:
        a_len = lengths[a_idx]
        b_len = lengths[b_idx]
    kw = dict(la_max=la_max, w=width, gO=gO, gE=gE, cm_tuple=cm_tuple)
    if not _interpret():
        # phase 1 reads only B's first ``width`` codes: gather just
        # ceil(width/16) packed words per B operand instead of all
        # ceil(L/16) (the random row gathers are the chunk's main
        # non-kernel cost)
        wb = (width + 15) // 16
        p1 = phase1_fused_packed(
            packed[a_idx].T, packed[:, :wb][b_idx].T, a_len,
            pblk=pblk, interpret=kernel_interpret(), ulen=ulen, **kw,
        )
    else:
        p1 = _phase1_fused_scan(
            bases[a_idx].astype(jnp.int32).T,
            bases[b_idx].astype(jnp.int32).T, a_len, **kw,
        )
    best1, bi, bj, fi_c, fj_c = p1
    # dud rule exactly as _dovetail_glue: b shorter than the band duds,
    # and the backtrack start must sit at B column 0
    act1 = (best1 > 0) & (b_len >= width)
    fi = jnp.where(act1, fi_c, bi)
    fj = jnp.where(act1, fj_c, bj)
    in_range = (lo + jnp.arange(bs, dtype=jnp.int32)) < count
    live = act1 & (fj == 0) & in_range
    # per-pair dove length, -1 for duds: the tier pass is then pure
    # compares over this array — no gathers, no compaction scatters
    return jnp.where(live, a_len - fi, -1)


@partial(jax.jit, static_argnames=("nb",))
def _dlen_hist(dlen_all, *, nb: int):
    """Counts of per-pair dove lengths (clipped to [-1, nb-2]; -1 marks
    phase-1 duds).  One ~(la_max+2)*4-byte fetch feeds the adaptive tier
    planner."""
    v = jnp.clip(dlen_all, -1, nb - 2) + 1
    return jnp.zeros((nb,), jnp.int32).at[v].add(1)


def _plan_tiers(counts, lo0: int, la_max: int, *, batch: int = 1 << 20,
                max_tiers: int = 5, over_rows: int = 31):
    """Work-optimal contiguous partition of dove lengths (lo0, la_max]
    into <= max_tiers (lo, hi] tiers.  A tier's real cost is its PADDED
    pair count (pow2/chunk quantization of _bs_pblk) times
    (hi + 1 + over_rows), where over_rows models the per-pair non-kernel
    cost (operand gathers + dispatch, ~60 ms per 1M-pair launch at
    2.3 ns/row-unit) — without the padding and overhead terms the
    planner over-splits and loses to launch overhead.  Tier bounds are
    quantized to multiples of 8 so the compiled phase-2 row-count
    variants stay bounded across datasets.  Replaces the static thirds
    tuned on c_ruddii: a dataset whose dove lengths skew or concentrate
    no longer pays full rows in a fat top tier (VERDICT r4 #8).

    Any partition is CORRECT (tier membership only selects which kernel
    variant loops how many rows; emission is canonically re-sorted), so
    the planner is free to optimize purely for work."""

    def seg_n(a: int, b: int) -> int:  # pairs with dlen in (a, b]
        return int(counts[a + 2 : b + 2].sum())

    def padded(n: int) -> int:  # _bs_pblk chunk quantization
        b = _pow2_at_least(min(batch, _pow2_at_least(n, 1024)), 128)
        return ((n + b - 1) // b) * b

    def cost(n: int, hi: int) -> int:
        return padded(n) * (hi + 1 + over_rows) if n else 0

    edges = [e for e in range(((lo0 // 8) + 1) * 8, la_max, 8) if e > lo0]
    memo = {}

    def solve(lo: int, k: int):
        n_all = seg_n(lo, la_max)
        if n_all == 0:
            return 0, []
        base = (cost(n_all, la_max), [(lo, la_max)])
        if k == 1:
            return base
        key = (lo, k)
        if key in memo:
            return memo[key]
        r = base
        for e in edges:
            if e <= lo:
                continue
            n1 = seg_n(lo, e)
            c2, t2 = solve(e, k - 1)  # t2 empty <=> no pairs above e
            c1 = cost(n1, e)
            if c1 + c2 < r[0]:
                r = (c1 + c2, ([(lo, e)] if n1 else []) + t2)
        memo[key] = r
        return r

    _, tiers = solve(lo0, max_tiers)
    return tuple(tiers) if tiers else ((lo0, la_max),)


@jax.jit
def _tier_sort(dlen_all, skip_lo):
    """ONE unstable sort by dove length groups every phase-2 tier into a
    CONTIGUOUS slice of the position order (replacing one cumsum+scatter
    compaction pass per tier over the full pair table).  Positions come
    out ordered by ascending dove length with duds and provably-invalid
    short doves (<= skip_lo) last via a sentinel key.  Per-tier counts
    and offsets come from the host-side histogram (_dlen_hist), so the
    sort needs only the static skip bound and can be dispatched before
    the histogram fetch — it runs on device while the host plans."""
    cap = dlen_all.shape[0]
    key = jnp.where(dlen_all > skip_lo, dlen_all, jnp.int32(2**30))
    _, pos_s = jax.lax.sort(
        (key, jnp.arange(cap, dtype=jnp.int32)), num_keys=1,
        is_stable=False,
    )
    return pos_s


@partial(
    jax.jit,
    static_argnames=(
        "bs", "width", "rows", "cm_tuple", "gO", "gE", "pblk", "vcap",
        "ulen", "pack_out", "ident_idx",
    ),
)
def _phase2_chunk_compact(
    bases, lengths, packed, lead, trail, idx, dlen_all, tier_idx, lo,
    count, *,
    bs: int, width: int, rows: int, cm_tuple, gO: int, gE: int,
    min_identity, min_overlap, max_ignore, pblk: int, vcap: int,
    ulen: int = 0, pack_out: bool = False, ident_idx: bool = False,
):
    """Split-align pass B: phase 2 + validity over one dove-length tier's
    chunk, DP looping only ``rows`` rows (>= every dove length in the
    tier).  Returns ([vcap, 4] of (lead, trail, ahg, bhg) valid rows,
    count) — or, with ``pack_out`` (ids < 2^16 and hangs < 2^15), the
    rows packed 2 int32 wide ((lead<<16|trail), (bhg<<16|ahg&0xFFFF)) so
    the stage's single host fetch moves half the bytes over the ~25 MB/s
    device tunnel.  Validity replicates _dovetail_glue for non-dud pairs
    (src/ObjectStore.scala:102-141)."""
    from sequence_aligner_tpu.ops.align_fused import (
        _dove_shift_packed, _interpret, _phase2_fused_scan,
        kernel_interpret, phase2_fused_packed,
    )

    sel = jax.lax.dynamic_slice(tier_idx, (lo,), (bs,))
    pos = sel if ident_idx else idx[sel]
    dlen = dlen_all[sel]
    lead_c = lead[pos]
    trail_c = trail[pos]
    a_idx = jnp.clip(lead_c - 1, 0, bases.shape[0] - 1)
    b_idx = jnp.clip(trail_c - 1, 0, bases.shape[0] - 1)
    if ulen:  # uniform read length: skip ~2 scalar-gather streams
        a_len = b_len = jnp.full((bs,), ulen, jnp.int32)
    else:
        a_len = lengths[a_idx]
        b_len = lengths[b_idx]
    ds = a_len - dlen
    zero_row = width // 2
    kw = dict(
        la_max=rows, w=width, zero_row=zero_row, gO=gO, gE=gE,
        cm_tuple=cm_tuple,
    )
    if not _interpret():
        p2 = phase2_fused_packed(
            packed[a_idx].T, packed[b_idx].T, ds, dlen, b_len,
            pblk=pblk, interpret=kernel_interpret(), ulen=ulen, **kw,
        )
    else:
        lb_max = bases.shape[1]
        p = bs
        a_shift = _dove_shift_packed(packed, a_idx, ds, rows)
        pad_top = zero_row + 1
        pad_bot = max(rows + width + 1 - pad_top - lb_max, 0)
        b_pad = jnp.concatenate(
            [
                jnp.zeros((pad_top, p), jnp.int32),
                bases[b_idx].astype(jnp.int32).T,
                jnp.zeros((pad_bot, p), jnp.int32),
            ],
            axis=0,
        )
        p2 = _phase2_fused_scan(a_shift, b_pad, dlen, b_len, **kw)
    best2, bu, bk, uf_c, kf_c, corr_c, err_c = p2
    act2 = best2 > 0
    uf = jnp.where(act2, uf_c, bu)
    kf = jnp.where(act2, kf_c, bk)
    z = jnp.zeros_like(uf)
    corr = jnp.where(act2, corr_c, z)
    err = jnp.where(act2, err_c, z)
    steps = corr + err
    start_i = uf + ds
    start_j = kf - zero_row + uf
    end_i = bu + ds
    end_j = bk - zero_row + bu
    tot = steps.astype(jnp.float32)
    ident_ok = corr.astype(jnp.float32) / tot >= min_identity
    len_ok = steps >= min_overlap
    dovetail = ((start_i == 0) & (b_len == end_j)) | (
        (start_j == 0) & (a_len == end_i)
    )
    ahg = start_i - start_j
    bhg = b_len - a_len + ahg
    hang_ok = (jnp.abs(ahg) < max_ignore) & (jnp.abs(bhg) < max_ignore)
    in_range = (lo + jnp.arange(bs, dtype=jnp.int32)) < count
    valid = (
        act2 & (tot > 0) & ident_ok & len_ok & dovetail & hang_ok & in_range
    )
    if pack_out:
        cols4 = jnp.stack(
            [(lead_c << 16) | trail_c, (bhg << 16) | (ahg & 0xFFFF)], axis=1
        )
    else:
        cols4 = jnp.stack([lead_c, trail_c, ahg, bhg], axis=1)
    return _compact_valid_sort(valid, cols4, vcap)


@partial(jax.jit, static_argnames=("out_cap",))
def _pack_valid_rows(bufs, cnts, *, out_cap: int):
    """Concatenate each chunk buffer's first ``cnt`` valid rows into ONE
    device array: sequential dynamic_update_slice writes lay down each
    whole padded buffer, and the next write's offset advances only by the
    valid count, overwriting the predecessor's padding.  ``out_cap`` must
    be >= total_valid + max buffer capacity so no write is start-clamped.
    Turns the align stage's device->host transfer into a single sliced
    fetch instead of one count-sliced fetch per chunk (each fetch pays
    real latency on the remote device tunnel)."""
    ncol = bufs[0].shape[1]
    out = jnp.zeros((out_cap, ncol), jnp.int32)
    off = jnp.int32(0)
    for buf, cnt in zip(bufs, cnts):
        out = jax.lax.dynamic_update_slice(out, buf, (off, jnp.int32(0)))
        off = off + cnt
    return out


@partial(jax.jit, donate_argnums=(0,))
def _stream_update(buf, chunk, lo):
    """Write one encoded chunk into the device-resident read matrix.
    Donation makes this an in-place update on TPU: assembling an [N, L]
    matrix from chunks costs O(N) total, not O(N^2 / chunk)."""
    return jax.lax.dynamic_update_slice(buf, chunk, (lo, jnp.int32(0)))


class Overlapper:
    """TPU-native overlap engine."""

    def __init__(
        self,
        settings: AlignSettings,
        *,
        fast_dovetail: bool = True,
        batch_size: int = 1 << 20,
        prescreen: bool | None = None,
    ):
        self.s = settings
        self.fast_dovetail = fast_dovetail
        self.batch_size = batch_size
        # diagonal-coherence candidate prescreen (ops.pairgen): cuts the
        # ~36 DP alignments per emitted record down by requiring clustered
        # collision diagonals; empirically lossless, opt-in
        if prescreen is None:
            prescreen = bool(int(os.environ.get("SEQALIGN_PRESCREEN", "0")))
        self.prescreen = prescreen
        # packed pairgen as split dispatches instead of the fused monolith
        # (env override for A/B timing; retries always use the split path)
        self.pairgen_split = bool(
            int(os.environ.get("SEQALIGN_PAIRGEN_SPLIT", "0"))
        )
        self.stats = OverlapStats()
        self.timer = StageTimer()

    # ---- stage 1+2: encode + kmer occurrences ----
    def _occurrences(self, bases: np.ndarray, lengths: np.ndarray):
        n = bases.shape[0]
        self._max_read_id = n  # ordinal ids; drives packed-key eligibility
        real = lengths[lengths > 0]
        den = int(real[0]) - self.s.kmer_size if real.size else 0
        # eligible while (rid << pos_bits | pos) fits 31 bits — the
        # position field adapts to the read length (ops.pairgen._pos_bits)
        self._uniform_den = (
            den
            if 0 < den
            and n.bit_length() + den.bit_length() <= 31
            and bool((real == real[0]).all())
            else 0
        )
        ids = np.arange(1, n + 1, dtype=np.int32)
        return kmer_scan(
            jnp.asarray(bases), jnp.asarray(lengths), jnp.asarray(ids),
            self.s.kmer_size,
        )

    # ---- stage 3: candidate pairs, device-resident ----
    def _candidates_dev(self, occ):
        """Run the pair stream with exact device-planned capacities.
        Returns the output dict (device arrays) + n_out (host int)."""
        s = self.s
        geom = dict(
            head_edge=jnp.float32(s.kmer_head_edge),
            tail_edge=jnp.float32(s.kmer_tail_edge),
            mid_lead=jnp.float32(s.kmer_mid_lead_edge),
            mid_tail=jnp.float32(s.kmer_mid_tail_edge),
        )
        # capacities are planned ON DEVICE from the hash-sorted occurrence
        # table (two scalar fetches): the raw cross-product totals are
        # exact, and every distinct pair kept by the collision band carries
        # >= min_collisions raw events, so raw_total // min_collisions
        # bounds n_out — no overflow retry (each retry was a full recompile
        # + re-execution of the giant sort program)
        pack_den = getattr(self, "_uniform_den", 0)
        if pack_den:
            # 2-operand sort with ONE packed payload: no per-field
            # permutation gathers (3 x table-sized at 1M reads)
            occ_s = sort_occurrences_packed_jit(occ, pack_den=pack_den)
        else:
            occ_s = sort_occurrences_jit(occ)
        del occ  # drop the unsorted table: ~1.4 GB at 1M reads
        with self.timer.stage("pairgen.plan"):  # nested inside "pairgen"
            h_tot, t_tot = plan_totals(occ_s, pack_den=pack_den, **geom)
        printdb(f"pairgen plan: h_total={h_tot} t_total={t_tot}")
        if max(h_tot, t_tot) > _MAX_STREAM:
            raise RuntimeError(
                f"raw candidate stream too large for one device "
                f"(head={h_tot}, tail={t_tot}, max={_MAX_STREAM}): use the "
                f"sharded engine (--engine sharded) or lower "
                f"--max-collisions to cap repeat-rich k-mers"
            )
        cap_head = _cap_at_least(h_tot, 1 << 14)
        cap_tail = _cap_at_least(t_tot, 1 << 14)
        out_bound = (h_tot + t_tot) // max(s.min_collisions, 1)
        cap_out = _cap_at_least(min(out_bound, h_tot + t_tot), 1 << 14)
        # packed single-key aggregation covers the full 16-bit id space
        # (sign-flipped keys sort in unsigned order); note the padded read
        # tier, not the input count, decides — 32000 reads pad to 32768
        # ids and once silently fell off a 2^15 version of this check onto
        # the 2x-slower general radix path
        packed = getattr(self, "_max_read_id", 1 << 16) < (1 << 16)
        # uniform-read-length fast path: 3 gathers/slot instead of 6
        prescreen_w = None
        if self.prescreen and packed and pack_den:
            # validity-implied window: two collisions lying ON one valid
            # alignment's path differ in diagonal by at most its indel
            # count <= floor((1 - min_identity) * align_len), and
            # align_len <= la + w + 2 — far tighter than the band width
            # the round-4 screen used (2 vs 12 diagonals at 100 bp).
            # The threshold stays at 2-in-window: a minimal valid overlap
            # (min_overlap cols at min_identity, sitting at the reads'
            # ends) produces only ~2 edge/middle-counted collisions, so
            # any higher clustered-mass bar provably drops real records
            # (see README's prescreen study).  SEQALIGN_PRESCREEN_W
            # overrides for probing.
            la = pack_den + s.kmer_size
            w = int(s.band_width(la))
            tight = int(
                (1.0 - float(s.min_identity)) * (la + w + 2)
            )
            prescreen_w = int(
                os.environ.get("SEQALIGN_PRESCREEN_W", max(tight, 1))
            )
            if float(s.min_identity) < 0.9 or s.min_overlap < 20:
                import warnings

                warnings.warn(
                    "--prescreen's losslessness argument was validated "
                    "in the amos_parity regime (min_identity ~0.98, "
                    "min_overlap 40); at these permissive settings the "
                    "window still scales with the indel budget, but "
                    "off-path-collision candidacy becomes likelier — "
                    "verify against an unscreened run before trusting "
                    "record-level parity.",
                    stacklevel=2,
                )
        attempt = 0
        while True:
            out = candidate_pairs_stream(
                occ_s, **geom,
                min_collisions=jnp.int32(s.min_collisions),
                max_collisions=jnp.int32(s.max_collisions),
                cap_head=cap_head, cap_tail=cap_tail, cap_out=cap_out,
                # per-pair counts are diagnostics (selectivity probe):
                # production alignment never reads them
                with_counts=getattr(self, "want_counts", False),
                presorted=True, packed_ids=packed, pack_den=pack_den,
                # retries run the split pieces so only the small finish
                # program recompiles at the doubled cap_out (the fused
                # monolith bakes cap_out in — recompiling it is the shape
                # that once SIGKILLed the remote compile helper)
                packed_split=self.pairgen_split or attempt > 0,
                prescreen_w=prescreen_w,
            )
            if not bool(out["overflow"]):
                break
            printdb(
                f"pairgen: cap_out={cap_out} overflow — retrying at "
                f"{cap_out * 2} via the split pipeline"
            )
            cap_out *= 2  # unreachable with the bound above; kept as a net
            attempt += 1
        n_out = int(out["n_out"])
        # the packed-key scatter silently drops slots >= cap_out; the
        # overflow flag must have caught that, but a wrong n_out here would
        # mean silently missing overlaps — fail loudly instead
        assert n_out <= cap_out, (n_out, cap_out)
        return out, n_out

    def _candidates(
        self, occ, bases: np.ndarray = None, lengths: np.ndarray = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Host-side candidate list (test/bench surface)."""
        if occ["hash"].shape[0] == 0:  # e.g. every read shorter than k
            return np.zeros(0, np.int32), np.zeros(0, np.int32)
        out, k = self._candidates_dev(occ)
        lead = np.asarray(out["lead"][:k])
        trail = np.asarray(out["trail"][:k])
        order = np.lexsort((trail, lead))
        return lead[order], trail[order]

    # ---- stage 4: device width-bucketed chunked alignment ----
    def _align_device(
        self,
        bases: np.ndarray,
        lengths: np.ndarray,
        lead_dev,
        trail_dev,
        n_pairs: int,
    ):
        """Returns host arrays (lead, trail, ahg, bhg) of the VALID
        overlaps only — one device->host transfer for the whole stage."""
        s = self.s
        empty = tuple(np.zeros(0, np.int32) for _ in range(4))
        if n_pairs == 0:
            return empty
        from sequence_aligner_tpu.ops.align_fused import pack_reads_le

        bases_d = jnp.asarray(bases)
        lengths_d = jnp.asarray(lengths)
        packed_d = pack_reads_le(bases_d)
        la_max = bases.shape[1]
        # exact band-width-by-length lookup (float32 parity with
        # settings.band_width), uploaded once
        wtab_host = np.asarray(
            [s.band_width(l) for l in range(la_max + 1)], np.int32
        )
        wtab = jnp.asarray(wtab_host)
        widths = (
            [0] if not self.fast_dovetail
            else sorted(set(int(w) for w in wtab_host[lengths[lengths > 0]]))
        )
        kernel = "fused" if self.fast_dovetail else "quad"
        cm_tuple = tuple(int(x) for x in s.cost_matrix.reshape(-1))
        real = lengths[lengths > 0]
        ulen = (
            int(real[0])
            if real.size and bool((real == real[0]).all()) else 0
        )
        kw = dict(
            la_max=la_max, cm_tuple=cm_tuple, gO=s.gap_open, gE=s.gap_extend,
            min_identity=jnp.float32(s.min_identity),
            min_overlap=jnp.int32(s.min_overlap),
            max_ignore=jnp.int32(s.max_ignore), kernel=kernel,
        )
        bufs, cnts, retries = [], [], []
        # 2-int32 packed valid rows halve the stage's host-fetch bytes;
        # needs ids < 2^16 and hangs < 2^15 (hangs are < max_ignore on
        # every VALID row — masked rows emit 0)
        pack_out = (
            kernel == "fused"
            and getattr(self, "_max_read_id", 1 << 16) < (1 << 16)
            and int(s.max_ignore) <= (1 << 15) - 1
        )

        def _bs_pblk(count_h):
            # pow2 lane-aligned batch, floor 128: the kernels launch
            # grid=(bs // pblk,), so bs < pblk (e.g. --single-align's
            # batch_size=1) would be a ZERO-size grid returning
            # uninitialized buffers; clamp both sides
            b = _pow2_at_least(
                min(self.batch_size, _pow2_at_least(count_h, 1024)), 128
            )
            return b, min(1024, b)

        def _pad_idx(ix, count_h, b):
            # dynamic_slice CLAMPS out-of-range starts: if the chunk grid
            # ceil(count/bs)*bs overruns the index array, the last chunk
            # would silently re-read earlier slots — pad it to the grid
            # size first.  Padding slots index pair 0; masked invalid.
            need = ((count_h + b - 1) // b) * b
            if need > int(ix.shape[0]):
                ix = jnp.concatenate(
                    [ix, jnp.zeros((need - int(ix.shape[0]),), jnp.int32)]
                )
            return ix

        # single band width => the bucket index is the identity: chunks
        # dynamic-slice the pair table directly, skipping 3 chunk-sized
        # gathers (measured 0.7 s at 14.7M pairs)
        ident = kernel == "fused" and len(widths) == 1

        def _pad_tab(arr, need):
            if need > int(arr.shape[0]):
                arr = jnp.concatenate(
                    [arr, jnp.zeros((need - int(arr.shape[0]),), jnp.int32)]
                )
            return arr

        for w in widths:
            if kernel == "quad":  # full SW has no band: one bucket of all
                idx = jnp.arange(lead_dev.shape[0], dtype=jnp.int32)
                cnt = jnp.int32(n_pairs)
            elif ident:
                idx = jnp.zeros((1,), jnp.int32)  # unread dummy
                cnt = jnp.int32(n_pairs)
            else:
                idx, cnt = _bucket_indices(
                    lead_dev, lengths_d, wtab, jnp.int32(w), jnp.int32(n_pairs)
                )
            cnt_h = n_pairs if len(widths) == 1 else int(cnt)
            if cnt_h == 0:
                continue
            bs, pblk = _bs_pblk(cnt_h)
            if ident:
                grid_need = ((cnt_h + bs - 1) // bs) * bs
                lead_dev = _pad_tab(lead_dev, grid_need)
                trail_dev = _pad_tab(trail_dev, grid_need)
            else:
                idx = _pad_idx(idx, cnt_h, bs)
            if kernel == "quad":
                # full-capacity valid buffer (see the fused arm note:
                # fetches are count-sliced, so overflow retries are gone)
                vcap = bs
                for lo in range(0, cnt_h, bs):
                    def runq(v, _i=idx, _lo=lo, _c=cnt, _b=bs, _w=w, _p=pblk):
                        return _align_chunk_compact(
                            bases_d, lengths_d, packed_d, lead_dev,
                            trail_dev, _i, jnp.int32(_lo), _c,
                            bs=_b, width=_w, pblk=_p, vcap=v, **kw,
                        )

                    buf, cnt_c = runq(vcap)
                    bufs.append(buf)
                    cnts.append(cnt_c)
                    retries.append((runq, bs))
                continue

            # ---- monolithic both-phase single launch vs split phases.
            # Interleaved 32k A/B (13.9M pairs): split wins, 3.95-4.16 s
            # total vs mono 4.48-4.69 s — the ~36% tier/dud cell cut
            # beats the extra launches.  At 100k-sim (0.7M pairs) mono
            # wins, 0.66 s vs 0.78 s — fixed dispatch/sync overhead
            # dominates small buckets.  Auto mode switches on bucket
            # size; SEQALIGN_ALIGN_MONO=0/1 forces either for A/B. ----
            mono_env = os.environ.get("SEQALIGN_ALIGN_MONO")
            mono = (
                bool(int(mono_env)) if mono_env is not None
                else cnt_h <= (1 << 21)
            )
            if mono and cnt_h <= (1 << 25):
                bsm = max(_cap_at_least(cnt_h, 1024), 128)
                pblkm = next(
                    p for p in (1024, 512, 256, 128) if bsm % p == 0
                )
                if ident:
                    lead_dev = _pad_tab(lead_dev, bsm)
                    trail_dev = _pad_tab(trail_dev, bsm)
                else:
                    idx = _pad_idx(idx, bsm, bsm)

                def runm(
                    v, _i=idx, _l=lead_dev, _t=trail_dev, _c=cnt, _b=bsm,
                    _w=w, _p=pblkm,
                ):
                    return _align_chunk_compact(
                        bases_d, lengths_d, packed_d, _l, _t,
                        _i, jnp.int32(0), _c, bs=_b, width=_w, pblk=_p,
                        vcap=v, pack_out=pack_out, ident_idx=ident, **kw,
                    )

                buf, cnt_c = runm(bsm)
                bufs.append(buf)
                cnts.append(cnt_c)
                retries.append((runm, bsm))
                cells = 2 * cnt_h * (la_max + 1) * (w + 1)
                self.stats.dp_cells += cells
                self.stats.dp_cells_raw += cells
                self.stats.n_phase2_pairs += cnt_h
                continue

            # ---- fused: split phases.  Pass A: phase 1 everywhere (~54%
            # of candidates dud there and never reach phase 2, the
            # costlier kernel) ----
            p1kw = dict(
                la_max=la_max, cm_tuple=cm_tuple, gO=s.gap_open,
                gE=s.gap_extend,
            )
            import time as _time

            trace = bool(int(os.environ.get("SEQALIGN_ALIGN_TRACE", "0")))
            t0 = _time.time()
            dparts = [
                _phase1_chunk(
                    bases_d, lengths_d, packed_d, lead_dev, trail_dev, idx,
                    jnp.int32(lo), cnt, bs=bs, width=w, pblk=pblk,
                    ulen=ulen, ident_idx=ident, **p1kw,
                )
                for lo in range(0, cnt_h, bs)
            ]
            dlen_all = dparts[0] if len(dparts) == 1 else jnp.concatenate(
                dparts
            )
            if trace:  # scalar-fetch sync: attribute phase 1 alone
                int(dlen_all[0])
                t_p1 = _time.time()
            self.stats.dp_cells += cnt_h * (la_max + 1) * (w + 1)
            self.stats.dp_cells_raw += 2 * cnt_h * (la_max + 1) * (w + 1)
            # ---- pass B: phase 2 per dove-length tier (each tier's
            # kernel loops only its max dove length in rows; dove lengths
            # below the first tier are provably invalid and skipped).
            # ONE dlen sort makes every tier a contiguous slice of the
            # position order — no per-tier compaction passes ----
            tiers = _dove_tiers(la_max, w, s.min_overlap, s.min_identity)
            lo0 = tiers[0][0]
            # dispatch the dove-length sort NOW (it needs only the static
            # provable-skip bound) so it runs while the host fetches the
            # histogram and plans the tiers
            pos_s = _tier_sort(dlen_all, jnp.int32(lo0))
            # exact per-value histogram: ONE small fetch feeds both the
            # adaptive tier planner and the per-tier counts/offsets (no
            # device-side tier counting at all)
            hist = np.asarray(_dlen_hist(dlen_all, nb=la_max + 2))
            if len(tiers) > 1 and bool(
                int(os.environ.get("SEQALIGN_ADAPTIVE_TIERS", "1"))
            ):
                tiers = _plan_tiers(hist, lo0, la_max, batch=self.batch_size)
            tcnt_hs = [int(hist[a + 2 : b + 2].sum()) for a, b in tiers]
            if trace:  # the hist fetch synced phase 1
                self._trace_t_sort = _time.time()
                print(
                    f"align trace w={w}: p1={t_p1 - t0:.2f}s "
                    f"plan={self._trace_t_sort - t_p1:.2f}s "
                    f"tiers={list(zip(tiers, tcnt_hs))}",
                    file=sys.stderr, flush=True,
                )
            toff_hs = list(np.cumsum([0] + tcnt_hs[:-1]))
            # pad so the last tier's chunk grid can never overrun (slots
            # past a tier's end are masked invalid by the chunk's count)
            pos_s = jnp.concatenate([
                pos_s,
                jnp.zeros((_pow2_at_least(self.batch_size, 128),), jnp.int32),
            ])
            for (tlo, thi), tcnt_h, toff in zip(tiers, tcnt_hs, toff_hs):
                if tcnt_h == 0:
                    continue
                self.stats.n_phase2_pairs += tcnt_h
                self.stats.dp_cells += tcnt_h * (thi + 1) * (w + 1)
                bs2, pblk2 = _bs_pblk(tcnt_h)
                # full-capacity valid buffer: the host fetch is
                # tier-sliced by the ACTUAL count (pow2 tiers), so a big
                # vcap costs only device memory — and no chunk can ever
                # overflow into a retry re-run (majority-valid datasets,
                # e.g. clean high-coverage sims, used to pay 2x align)
                vcap = bs2
                tend = jnp.int32(toff + tcnt_h)
                p2kw = dict(
                    width=w, rows=thi, cm_tuple=cm_tuple, gO=s.gap_open,
                    gE=s.gap_extend,
                    min_identity=jnp.float32(s.min_identity),
                    min_overlap=jnp.int32(s.min_overlap),
                    max_ignore=jnp.int32(s.max_ignore), pblk=pblk2,
                    ulen=ulen, pack_out=pack_out, ident_idx=ident,
                )
                for lo in range(0, tcnt_h, bs2):
                    def run2(
                        v, _i=idx, _l=lead_dev, _t2=trail_dev, _d=dlen_all,
                        _t=pos_s, _lo=int(toff) + lo, _c=tend, _b=bs2,
                        _kw=p2kw,
                    ):
                        return _phase2_chunk_compact(
                            bases_d, lengths_d, packed_d, _l,
                            _t2, _i, _d, _t, jnp.int32(_lo), _c,
                            bs=_b, vcap=v, **_kw,
                        )

                    buf, cnt_c = run2(vcap)
                    bufs.append(buf)
                    cnts.append(cnt_c)
                    retries.append((run2, bs2))
        self.stats.n_alignments = n_pairs
        if not bufs:
            return empty
        host_cnt = np.asarray(jnp.stack(cnts))
        if int(os.environ.get("SEQALIGN_ALIGN_TRACE", "0")):
            import time as _time

            t_p2 = _time.time()
            print(
                f"align trace: p2={t_p2 - self._trace_t_sort:.2f}s "
                f"({len(cnts)} chunk launches)", file=sys.stderr, flush=True,
            )
            self._trace_t_p2 = t_p2
        total = int(host_cnt.sum())
        overflowed = any(
            int(c) > bufs[i].shape[0] for i, c in enumerate(host_cnt)
        )
        ncol = bufs[0].shape[1]
        if total and not overflowed and len(bufs) > 1:
            # ONE device-side concat + ONE sliced fetch for the stage
            max_vcap = max(b.shape[0] for b in bufs)
            out_cap = _cap_at_least(total + max_vcap, 1 << 14)
            packed_dev = _pack_valid_rows(
                tuple(bufs), tuple(cnts), out_cap=out_cap
            )
            t = min(out_cap, _pow2_at_least(total, 4096))
            packed_rows = np.asarray(packed_dev[:t])[:total]
        else:
            parts = []
            for i, c in enumerate(host_cnt):
                vcap_i = bufs[i].shape[0]
                c = int(c)
                if c == 0:
                    continue
                if c > vcap_i:  # rare: chunk's valid rows overflowed the cap
                    run, bs_i = retries[i]
                    printdb(
                        f"align chunk {i}: {c} valid > vcap {vcap_i}; rerun"
                    )
                    vcap2 = min(bs_i, _pow2_at_least(c, 1 << 16))
                    buf2, _ = run(vcap2)
                    parts.append(np.asarray(buf2)[:c])
                else:
                    # fetch a pow2-tier slice, not the whole padded buffer
                    t = min(vcap_i, _pow2_at_least(c, 4096))
                    parts.append(np.asarray(bufs[i][:t])[:c])
            packed_rows = (
                np.concatenate(parts) if parts
                else np.zeros((0, ncol), np.int32)
            )
        if int(os.environ.get("SEQALIGN_ALIGN_TRACE", "0")):
            import time as _time

            print(
                f"align trace: fetch={_time.time() - self._trace_t_p2:.2f}s",
                file=sys.stderr, flush=True,
            )
        n_valid = int(packed_rows.shape[0])
        self.stats.n_valid = n_valid
        if n_valid == 0:
            return empty
        if ncol == 2:  # unpack (lead<<16|trail), (bhg<<16|ahg)
            w0 = packed_rows[:, 0]
            w1 = packed_rows[:, 1]
            return (
                ((w0 >> 16) & 0xFFFF).astype(np.int32),
                (w0 & 0xFFFF).astype(np.int32),
                ((w1 << 16) >> 16).astype(np.int32),  # sign-extend ahg
                (w1 >> 16).astype(np.int32),
            )
        return (
            packed_rows[:, 0], packed_rows[:, 1],
            packed_rows[:, 2], packed_rows[:, 3],
        )

    def _align(
        self,
        bases: np.ndarray,
        lengths: np.ndarray,
        lead: np.ndarray,
        trail: np.ndarray,
    ) -> dict[str, np.ndarray]:
        """Host-facing batch alignment over an explicit pair list (test /
        bench surface; production uses the device-resident path)."""
        s = self.s
        npairs = len(lead)
        out = {
            k: np.zeros(npairs, dtype=np.int32)
            for k in OUT_KEYS if k != "valid"
        }
        out["valid"] = np.zeros(npairs, dtype=bool)
        if npairs == 0:
            return out
        la = lengths[lead - 1]
        widths = s.band_widths(la) if self.fast_dovetail else np.zeros_like(la)
        bases_d = jnp.asarray(bases)
        lengths_d = jnp.asarray(lengths)
        kernel = "fused" if self.fast_dovetail else "quad"
        cm_tuple = tuple(int(x) for x in s.cost_matrix.reshape(-1))
        kw = dict(
            la_max=bases.shape[1], cm_tuple=cm_tuple,
            gO=s.gap_open, gE=s.gap_extend,
            min_identity=jnp.float32(s.min_identity),
            min_overlap=jnp.int32(s.min_overlap),
            max_ignore=jnp.int32(s.max_ignore), kernel=kernel,
        )
        from sequence_aligner_tpu.ops.align_fused import pack_reads_le

        packed_d = pack_reads_le(bases_d)
        lead_dev = jnp.asarray(lead.astype(np.int32))
        trail_dev = jnp.asarray(trail.astype(np.int32))
        for w in np.unique(widths):
            idxs = np.nonzero(widths == w)[0].astype(np.int32)
            # lane-aligned pow2 batch >= 128 (zero-grid guard, as in
            # _align_device) with the lane block clamped to the batch
            bs = _pow2_at_least(
                min(self.batch_size, _pow2_at_least(len(idxs), 256)), 128
            )
            pblk = min(256, bs)
            pad = (-len(idxs)) % bs
            idx_dev = jnp.asarray(np.concatenate(
                [idxs, np.repeat(idxs[-1:], pad)]
            ))
            for lo in range(0, len(idxs), bs):
                res = _align_chunk(
                    bases_d, lengths_d, packed_d, lead_dev, trail_dev,
                    idx_dev, jnp.int32(lo), jnp.int32(len(idxs)),
                    bs=bs, width=int(w), pblk=pblk, **kw,
                )
                host = np.asarray(res)  # [bs, 12]
                chunk = idxs[lo : lo + bs]
                for r, k in enumerate(OUT_KEYS):
                    if k == "valid":
                        out[k][chunk] = host[: len(chunk), r].astype(bool)
                    else:
                        out[k][chunk] = host[: len(chunk), r]
        return out

    # ---- full pipeline ----
    def run(self, path_or_seqs: str | list[Sequence]) -> list[OverlapRecord]:
        """Full pipeline to OverlapRecord objects (API/test surface; the
        production emit path is ``run_arrays`` -> io.ovl.write_ovl_arrays,
        which never builds per-record Python objects)."""
        return self._to_records(self.run_arrays(path_or_seqs))

    def _to_records(self, arrs) -> list[OverlapRecord]:
        with self.timer.stage("emit.records"):
            cols = [np.asarray(c).tolist() for c in arrs]
            return OverlapRecord.bulk_build(*cols)

    def run_arrays(self, path_or_seqs: str | list[Sequence]):
        """Full pipeline to canonical (lead, trail, ahg, bhg) int32 arrays
        sorted by (lead, trail) — the array-native emission surface."""
        with self.timer.stage("encode"):
            if isinstance(path_or_seqs, str):
                from sequence_aligner_tpu.native import fasta_encode_native

                enc = fasta_encode_native(path_or_seqs)  # C++ fast path
                if enc is None:
                    enc = encode_reads(read_fasta(path_or_seqs))
                bases, lengths = enc
                n_input = bases.shape[0]
            else:
                bases, lengths = encode_reads(path_or_seqs)
                n_input = len(path_or_seqs)
            # pad the read count to a power-of-two tier so device programs
            # compile once per (N_tier, L) shape family
            n_tier = _pow2_at_least(n_input, 256)
            if n_tier > n_input:
                bases = np.pad(bases, ((0, n_tier - n_input), (0, 0)))
                lengths = np.pad(lengths, (0, n_tier - n_input))
        return self._run_encoded(bases, lengths, n_input)

    def run_stream(
        self, path: str, *, chunk_reads: int = 1 << 15
    ) -> list[OverlapRecord]:
        """Streamed variant of ``run`` (record objects)."""
        return self._to_records(
            self.run_stream_arrays(path, chunk_reads=chunk_reads)
        )

    def run_stream_arrays(self, path: str, *, chunk_reads: int = 1 << 15):
        """Streamed variant of ``run_arrays``: the read matrix is assembled on
        DEVICE chunk by chunk (donated dynamic_update_slice), so peak host
        memory is O(chunk_reads * l_max) regardless of input size and
        uploads overlap with host parsing of the next chunk (JAX dispatch
        is async).  Output is identical to ``run(path)``.

        SURVEY.md §2.5 pipeline row: the overlap stage's host input
        pipeline feeding device batches."""
        from sequence_aligner_tpu.io.stream import (
            fasta_scan, iter_encoded_chunks,
        )

        with self.timer.stage("encode"):
            n_input, l_max = fasta_scan(path)
            n_tier = _pow2_at_least(max(n_input, 1), 256)
            chunk_reads = min(chunk_reads, n_tier)
            buf = jnp.zeros((n_tier, max(l_max, 1)), jnp.int8)
            lengths = np.zeros(n_tier, np.int32)
            lo = 0
            for bases_c, lens_c in iter_encoded_chunks(
                path, chunk_reads, l_max
            ):
                m = bases_c.shape[0]
                if m < chunk_reads:  # pad the tail chunk: one compile
                    bases_c = np.pad(bases_c, ((0, chunk_reads - m), (0, 0)))
                buf = _stream_update(buf, jnp.asarray(bases_c), jnp.int32(lo))
                lengths[lo : lo + m] = lens_c
                lo += m
            assert lo == n_input, (lo, n_input)
        return self._run_encoded(buf, lengths, n_input)

    def _run_encoded(self, bases, lengths: np.ndarray, n_input: int):
        """Post-encode stages -> canonical (lead, trail, ahg, bhg) arrays;
        ``bases`` may be a host or device array of the padded [n_tier, L]
        read codes, ``lengths`` the host lengths."""
        self.stats.n_reads = n_input
        with self.timer.stage("kmer"):
            occ = self._occurrences(bases, lengths)
            # device-side reduce: fetching the [n*npos] valid mask costs
            # ~0.1s over the ~25 MB/s device tunnel
            self.stats.n_kmers = int(jnp.sum(occ["valid"].astype(jnp.int32)))
        with self.timer.stage("pairgen"):
            if occ["hash"].shape[0] == 0:
                out, n_pairs = None, 0
            else:
                out, n_pairs = self._candidates_dev(occ)
            self.stats.n_candidate_pairs = n_pairs
        printdb(f"pairgen: {n_pairs} candidate pairs")
        with self.timer.stage("align"):
            if n_pairs:
                lead_v, trail_v, ahg_v, bhg_v = self._align_device(
                    bases, lengths, out["lead"], out["trail"], n_pairs
                )
            else:
                lead_v = trail_v = ahg_v = bhg_v = np.zeros(0, np.int32)
        with self.timer.stage("emit"):
            # canonical (lead, trail) order via one vectorized lexsort;
            # the arrays go straight to the native OVL writer — no
            # per-record Python objects on the production path
            order = np.lexsort((trail_v, lead_v))
            arrs = tuple(
                np.ascontiguousarray(np.asarray(c)[order])
                for c in (lead_v, trail_v, ahg_v, bhg_v)
            )
        printdb(self.timer.report())
        if debug_enabled():
            from sequence_aligner_tpu.utils.profiling import (
                device_memory_stats,
            )

            printdb(f"device memory: {device_memory_stats()}")
        return arrs
