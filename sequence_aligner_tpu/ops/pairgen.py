"""Candidate-pair generation as sorted-array joins (the TPU idiom).

The reference's Trove hash tables (src/KmerTable.scala:26-37) cannot exist
on TPU; this module re-expresses ``calcPairData`` + ``calcDispatchData``
(src/KmerTable.scala:85-187) as sort / binary-search / segment ops with
static capacities and masking:

  1. the occurrence table is sorted by hash ONCE; per-row segment bounds
     come from run-boundary cummax/cummin fills;
  2. positional classes (head-edge / middle / tail-edge, geometry of
     src/ObjectStore.scala:32-35) are masks over the sorted table — the
     middle class additionally gets a rank->row compaction so each hash
     segment's middle members are addressable by rank;
  3. every edge occurrence's cross product with its segment's middle
     members is expanded into a flat pair table via cumulative offsets
     (capacity-padded, masked);
  4. pair ordering follows addKmerPair (src/KmerTable.scala:57-80): self
     pairs are dropped and the occurrence with strictly greater loc leads;
  5. ordered pairs are aggregated by ONE unstable single-operand sort of
     packed (fst<<16)|snd keys (sign-flipped so int32 order == unsigned
     order) when read ids fit 16 bits — the reference's own id ceiling
     (it packs pairs as (id<<16)^id, src/KmerTable.scala:73) — else by
     ONE unstable 2-key lexicographic sort; run-length counting keeps
     runs inside [min_collisions, max_collisions].

Performance design (measured on v5e through the axon tunnel,
tools/compile_probe.py + tools/pairgen_timing.py):

  * 1-key ``lax.sort`` is the cheapest primitive by far — 167 ms to sort
    84M keys, ~5 s to compile even at 64M — so aggregation AND compaction
    are expressed as sorts;
  * ``searchsorted(method='scan_unrolled')`` EXECUTES as ~20 sequential
    gather passes (25 s at 134M queries), so the stream join uses one
    scatter + cummax source-row fill plus gathers instead;
  * custom-combiner ``lax.associative_scan`` must NEVER appear in device
    code: it is a compile-time catastrophe on this toolchain (>12 min to
    compile at 4M elements vs 7 s for cummax) — it singlehandedly made
    the round-2 monolithic program uncompilable.

All shapes static.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_I32_MAX = jnp.int32(2**31 - 1)
# sign flip: packed (fst << 16) | snd keys use the full 32 bits when ids
# reach 16 bits; XOR with the sign bit makes int32 `<` match unsigned
# order, so ONE unstable int32 sort still aggregates them.  The flipped
# key can never equal the _I32_MAX invalid sentinel: that would need
# fst == snd == 65535, and self-pairs are excluded.
_SIGN = jnp.int32(-(2**31))


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


def _run_bounds(h):
    """Segment [l, r) bounds per row of a sorted key array via run-boundary
    forward/backward fills — two cummax/cummin passes instead of binary
    searches (scan_unrolled searchsorted costs ~20 sequential gather passes
    over the query array; measured 25 s at 134M queries on v5e)."""
    n = h.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), h[1:] != h[:-1]]
    )
    seg_l = jax.lax.cummax(jnp.where(first, idx, 0))
    nxt = jax.lax.cummin(jnp.where(first, idx, _I32_MAX), reverse=True)
    seg_r = jnp.minimum(
        jnp.concatenate([nxt[1:], jnp.full((1,), n, jnp.int32)]), n
    )
    return seg_l, seg_r


def _seg_mid_counts(h, is_mid):
    """Per-row middle-class count of the row's hash segment, via
    run-boundary FILLS of the exclusive mid prefix — no per-row gathers
    (the seg_l/seg_r formulation gathered the prefix twice per row:
    2 x 85M random gathers at the 1M-read scale).  Returns [n] int32:
    mid_cnt[i] = #mid rows in i's segment."""
    n = h.shape[0]
    cm = jnp.cumsum(is_mid.astype(jnp.int32)) - is_mid.astype(jnp.int32)
    total = cm[-1] + is_mid[-1].astype(jnp.int32) if n else jnp.int32(0)
    first = jnp.concatenate([jnp.ones((1,), jnp.bool_), h[1:] != h[:-1]])
    # cm is nondecreasing: forward cummax fills each row with its
    # segment start's prefix; backward cummin with the NEXT segment
    # start's prefix (= prefix at this segment's end)
    mid_at_l = jax.lax.cummax(jnp.where(first, cm, 0))
    nxtv = jax.lax.cummin(jnp.where(first, cm, _I32_MAX), reverse=True)
    mid_at_r = jnp.minimum(
        jnp.concatenate([nxtv[1:], jnp.full((1,), 2**31 - 1, jnp.int32)]),
        total,
    )
    return mid_at_r - mid_at_l


def _pos_bits(pack_den: int) -> int:
    """Bits for the position field of the uniform-length packed operand
    (rid << pb | pos): positions run 0..pack_den, so pb adapts to the
    read length and the id field gets the rest of the 31 usable bits —
    at 100 bp reads ids up to 2^24 fit (the old fixed 12-bit field
    capped the fast path at 2^18 reads)."""
    return max(int(pack_den).bit_length(), 1)


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
    """Kept rows packed to the front IN ORDER — by ONE unstable
    multi-operand sort on a position key, not scatter (row scatters
    measured ~10x slower than equivalent unstable sorts at stream scale
    on this chip; three [400M]-input scatters were ~4.5 s of the 1M
    run's finish).  Slots past n_out are zeroed."""
    n = fst.shape[0]
    n_out = jnp.sum(keep.astype(jnp.int32))
    keyp = jnp.where(keep, jnp.arange(n, dtype=jnp.int32), _I32_MAX)
    _, f_c, s_c, c_c = jax.lax.sort(
        (keyp, fst, snd, cnt), num_keys=1, is_stable=False
    )
    if cap_out > n:
        pad = cap_out - n
        z = jnp.zeros((pad,), jnp.int32)
        f_c = jnp.concatenate([f_c, z])
        s_c = jnp.concatenate([s_c, z])
        c_c = jnp.concatenate([c_c, z])
    live = jnp.arange(cap_out, dtype=jnp.int32) < n_out
    return (
        jnp.where(live, f_c[:cap_out], 0),
        jnp.where(live, s_c[:cap_out], 0),
        jnp.where(live, c_c[:cap_out], 0),
        n_out,
    )


@jax.jit
def sort_occurrences_jit(occ):
    """Standalone jitted hash sort (so the sort compiles once and its
    result is shared by the planning pass and the pair stream)."""
    return sort_occurrences(occ)


@partial(jax.jit, static_argnames=("pack_den",))
def sort_occurrences_packed_jit(occ, *, pack_den: int):
    """Uniform-read-length hash sort carrying ONE packed payload
    ((rid << pb) | pos; -1 for invalid rows) instead of permuting
    read_id/loc/valid separately — the 2-operand sort replaces the
    three table-sized payload gathers (~3 s of the 1M run's sort_occ).
    Consumers re-derive the classic fields via _unpack_occ; the float32
    loc round-trips exactly (loc = f32(pos/den), round(loc*den) = pos
    for den < 2^23)."""
    pb = _pos_bits(pack_den)
    posn = jnp.round(occ["loc"] * jnp.float32(pack_den)).astype(jnp.int32)
    packed = jnp.where(
        occ["valid"],
        (occ["read_id"] << pb) | jnp.clip(posn, 0, (1 << pb) - 1),
        jnp.int32(-1),
    )
    key = jnp.where(occ["valid"], occ["hash"], _I32_MAX)
    key, pk = jax.lax.sort((key, packed), num_keys=1, is_stable=False)
    return dict(hash=key, packed=pk)


def _unpack_occ(occ_s, pack_den: int):
    """Classic (hash, read_id, loc, valid) view of a packed-payload
    sorted table (cheap elementwise ops, fused into the consumer)."""
    if "packed" not in occ_s:
        return occ_s
    pb = _pos_bits(pack_den)
    pk = occ_s["packed"]
    valid = pk >= 0
    pos = jnp.where(valid, pk & ((1 << pb) - 1), 0)
    return dict(
        hash=occ_s["hash"],
        read_id=jnp.where(valid, pk >> pb, 0),
        loc=pos.astype(jnp.float32) / jnp.float32(pack_den),
        valid=valid,
    )


_SUM_CHUNK = 1 << 15


def _chunk_hi_lo_sums(vals):
    """Overflow-safe total of an int32 array whose elements are in
    [0, 2^31): per-chunk sums of the low 15 and high 16 bits separately.

    With chunk size 2^15, sum(lo) < 2^30 and sum(hi) <= (2^16-1)*2^15
    < 2^31, so every partial fits int32 EXACTLY without x64.  The true
    total (which may exceed int32/int53) is recombined on the host from
    the [m]-sized partials with Python integers — see ``plan_totals``.
    """
    n = vals.shape[0]
    m = max((n + _SUM_CHUNK - 1) // _SUM_CHUNK, 1)
    pad = m * _SUM_CHUNK - n
    if pad:
        vals = jnp.concatenate([vals, jnp.zeros((pad,), jnp.int32)])
    v = vals.reshape(m, _SUM_CHUNK)
    lo = jnp.sum(v & (_SUM_CHUNK - 1), axis=1)
    hi = jnp.sum(v >> 15, axis=1)
    return hi, lo


@partial(jax.jit, static_argnames=("pack_den",))
def plan_totals_device(
    occ_sorted, head_edge, tail_edge, mid_lead, mid_tail, *,
    pack_den: int = 0,
):
    """Exact raw head x middle / tail x middle cross-product totals,
    computed on device from the hash-sorted occurrence table.

    Replaces round-1's host NumPy plan (which re-hashed every read on
    host, an O(N*L log) bottleneck at scale): the per-kmer role counts
    fall out of the same segment bounds the stream itself uses, and only
    small per-chunk partial-sum arrays come back to the host.  Totals can
    exceed int32 on repeat-rich data (the round-2 version silently
    wrapped there), so the reduction is split into hi/lo chunk partials
    (``_chunk_hi_lo_sums``) recombined exactly on host.  Mirrors
    calcPairData's pair-count accounting (src/KmerTable.scala:105-128).
    """
    occ_sorted = _unpack_occ(occ_sorted, pack_den)
    h = occ_sorted["hash"]
    loc = occ_sorted["loc"]
    # the carried valid flags are authoritative: a LEGITIMATE k=16
    # hash can equal the _I32_MAX sort sentinel (e.g. "CTTT...T"),
    # and masks already zero every invalid row's contribution
    valid = occ_sorted["valid"]
    is_head = valid & (loc <= head_edge)
    is_mid = valid & (mid_lead <= loc) & (loc <= mid_tail)
    is_tail = valid & (loc >= tail_edge)
    mid_cnt = _seg_mid_counts(h, is_mid)
    h_hi, h_lo = _chunk_hi_lo_sums(jnp.where(is_head, mid_cnt, 0))
    t_hi, t_lo = _chunk_hi_lo_sums(jnp.where(is_tail, mid_cnt, 0))
    # ONE stacked array so the host pays a single fetch round trip (four
    # separate np.asarray calls were ~4 tunnel RTTs of pure latency)
    return jnp.stack([h_hi, h_lo, t_hi, t_lo])


def plan_totals(occ_sorted, pack_den: int = 0, **geom) -> tuple[int, int]:
    """Host wrapper: exact (h_total, t_total) as Python ints (arbitrary
    precision — immune to the int32/x64 truncation of naive device sums)."""
    import numpy as np

    h_hi, h_lo, t_hi, t_lo = np.asarray(
        plan_totals_device(occ_sorted, pack_den=pack_den, **geom),
        dtype=np.int64,
    )
    h_total = (int(h_hi.sum()) << 15) + int(h_lo.sum())
    t_total = (int(t_hi.sum()) << 15) + int(t_lo.sum())
    return h_total, t_total


# ---------------------------------------------------------------------------
# Candidate generation as SEPARATE compiled programs.
#
# Round 3 finding: the original single-program formulation (expand both
# edge classes + global sort + run-length + compact fused into one jit)
# produced an XLA program whose TPU compile was killed by the compile
# helper's memory limit at production caps (~40M slots per class) —
# `tpu_compile_helper subprocess exit signal SIGKILL`.  The stages below
# are natural program boundaries anyway (a sort cannot fuse with the
# scans around it); splitting costs only a few HBM round-trips of the
# stream (~milliseconds at 800 GB/s) and buys:
#   * each program compiles independently in minutes, not an hour-plus;
#   * head and tail classes share ONE compiled expansion program
#     (identical caps);
#   * in the split pipeline a cap_out overflow retry recompiles only the
#     small finish program, never the expansion or the sort.  (The packed
#     FUSED program bakes cap_out in, so its retry path falls back to the
#     split pieces — see candidate_pairs_stream's packed_split handling —
#     instead of recompiling the monolith.)
# ---------------------------------------------------------------------------


# Stream-chunk size for the chunked expansion.  With the associative_scan
# gone, full-stream programs compile in seconds (tools/compile_probe.py),
# and a single piece is fastest at runtime: each extra chunk re-runs the
# table-sized scatter and straddling-row reduction (measured 331 ms/chunk
# at 4M slots, 20 chunks = 6.5 s vs ~2 s single-piece).  The chunk
# machinery stays (tests force small chunks) as the escape hatch for
# shapes that ever outgrow the compile helper again.
_EXPAND_CHUNK = 1 << 31


@partial(jax.jit, static_argnames=("pack_den", "which"))
def _expand_prep_jit(
    occ_s, head_edge, tail_edge, mid_lead, mid_tail, *,
    pack_den: int, which: str,
):
    """Table-sized preparation for one edge class's chunked expansion:
    per-row exclusive stream offsets, middle-class rank tables, and the
    gather-operand tables.  Everything here is O(table), never O(stream).
    """
    geom = dict(
        head_edge=head_edge, tail_edge=tail_edge,
        mid_lead=mid_lead, mid_tail=mid_tail,
    )
    occ_s = _unpack_occ(occ_s, pack_den)
    h = occ_s["hash"]
    rid = occ_s["read_id"]
    loc = occ_s["loc"]
    valid = occ_s["valid"]  # authoritative (see _expand_class note)
    n = h.shape[0]

    is_mid = valid & (geom["mid_lead"] <= loc) & (loc <= geom["mid_tail"])
    if which == "head":
        edge_mask = valid & (loc <= geom["head_edge"])
    else:
        edge_mask = valid & (loc >= geom["tail_edge"])

    if pack_den:
        pb = _pos_bits(pack_den)
        posn = jnp.round(loc * jnp.float32(pack_den)).astype(jnp.int32)
        packed = (rid << pb) | jnp.clip(posn, 0, (1 << pb) - 1)

    mid_rows, mid_prefix, mid_total = _compact_indices(is_mid)
    # segment mid base/count via run-boundary fills of the exclusive mid
    # prefix — no per-row prefix gathers (2 x table-sized at 1M reads)
    first = jnp.concatenate([jnp.ones((1,), jnp.bool_), h[1:] != h[:-1]])
    mid_base = jax.lax.cummax(jnp.where(first, mid_prefix, 0))
    nxtv = jax.lax.cummin(
        jnp.where(first, mid_prefix, _I32_MAX), reverse=True
    )
    mid_at_r = jnp.minimum(
        jnp.concatenate([nxtv[1:], jnp.full((1,), 2**31 - 1, jnp.int32)]),
        mid_total,
    )
    mid_cnt = mid_at_r - mid_base

    npairs = jnp.where(edge_mask, mid_cnt, 0)
    cum = jnp.cumsum(npairs)
    total = cum[-1] if n else jnp.int32(0)
    excl = cum - npairs
    # mb_off[r] = mid_base[r] - excl[r]: the slot's middle rank is then
    # mb_off[row] + t — one gathered value instead of two
    prep = dict(
        excl=excl, active=npairs > 0, total=total,
        mb_off=mid_base - excl,
    )
    if pack_den:
        # fused per-row operand table [n, 2]: (packed a operand, mb_off);
        # one 2-wide row gather replaces two stream-sized element gathers
        prep["a_tab"] = jnp.stack([packed, mid_base - excl], axis=1)
        prep["mid_pk"] = packed[mid_rows]
    else:
        prep["a_rid"] = rid
        prep["a_loc"] = loc
        prep["m_rid"] = rid[mid_rows]
        prep["m_loc"] = loc[mid_rows]
    return prep


@partial(
    jax.jit, static_argnames=("chunk", "pack_den", "emit_key", "emit_diag")
)
def _expand_chunk_jit(
    prep, t0, *, chunk: int, pack_den: int, emit_key: bool,
    emit_diag: bool = False,
):
    """Slots [t0, t0 + chunk) of one edge class's raw-pair stream.

    ONE compiled program serves every chunk of both classes (t0 is
    traced): per-chunk footprint is O(chunk), which keeps the XLA program
    inside the remote compile helper's memory limit — the full-stream
    formulation of the same scatter+cummax fills was SIGKILLed at
    production caps.  The chunk's boundary carry is the straddling source
    row r0 (the active row with the largest stream offset <= t0), seeded
    into slot 0 of every fill.
    """
    excl = prep["excl"]
    active = prep["active"]
    total = prep["total"]
    n = excl.shape[0]
    iota_n = jnp.arange(n, dtype=jnp.int32)

    # straddling row: largest active row with excl <= t0
    r0 = jnp.max(jnp.where(active & (excl <= t0), iota_n, -1))
    r0c = jnp.clip(r0, 0, n - 1)
    has0 = r0 >= 0

    in_win = active & (excl >= t0) & (excl < t0 + chunk)
    pos_c = jnp.where(in_win, excl - t0, chunk)
    t = t0 + jnp.arange(chunk, dtype=jnp.int32)

    def fill_mono(vals):
        """Segment-broadcast of a per-row NONDECREASING value: seed slot 0
        with the straddling row's value, scatter in-window run starts,
        cummax-fill."""
        seed = jnp.where(has0, vals[r0c], 0)
        base = (
            jnp.zeros((chunk + 1,), jnp.int32)
            .at[0].set(seed)
            .at[pos_c].max(jnp.where(in_win, vals, 0))
        )
        return jax.lax.cummax(base[:chunk])

    # source-row broadcast: the row index is monotone over run starts, so
    # ONE seeded scatter + cummax fill yields each slot's source row, and
    # every per-row quantity follows by gathers.  (An earlier formulation
    # ran one fill per quantity plus a last-nonzero lax.associative_scan
    # for the packed operand — that custom-combiner scan is a compile-time
    # catastrophe on the TPU toolchain: >12 min for the scan ALONE at 4M
    # elements, vs 7 s for cummax; see tools/compile_probe.py.)
    ei = fill_mono(iota_n)
    ok = t < total
    if pack_den:
        mid_pk = prep["mid_pk"]
        g = prep["a_tab"][ei]  # ONE 2-wide row gather: (a operand, mb_off)
        a_pk = g[:, 0]
        mrank = jnp.clip(g[:, 1] + t, 0, max(mid_pk.shape[0] - 1, 0))
        b_pk = mid_pk[mrank]
        pb = _pos_bits(pack_den)
        a_id = a_pk >> pb
        b_id = b_pk >> pb
        a_first = (a_pk & ((1 << pb) - 1)) > (
            b_pk & ((1 << pb) - 1)
        )
    else:
        m_rid = prep["m_rid"]
        mrank = jnp.clip(
            prep["mb_off"][ei] + t, 0, max(m_rid.shape[0] - 1, 0)
        )
        a_id, a_loc = prep["a_rid"][ei], prep["a_loc"][ei]
        b_id, b_loc = m_rid[mrank], prep["m_loc"][mrank]
        a_first = a_loc > b_loc  # strict-greater loc leads (:65-71)
    ok &= a_id != b_id  # self pairs skipped (src/KmerTable.scala:61-63)
    fst = jnp.where(a_first, a_id, b_id)
    snd = jnp.where(a_first, b_id, a_id)
    if emit_key:
        # sign-flipped so int32 sort order == unsigned (fst, snd) order
        # for ids up to 65535 (the reference's own id ceiling,
        # src/KmerTable.scala:73)
        key = jnp.where(ok, ((fst << 16) | snd) ^ _SIGN, _I32_MAX)
        if emit_diag:
            # collision diagonal pos_fst - pos_snd (packed fast path
            # only): feeds the optional diagonal-coherence prescreen
            pm = (1 << pb) - 1
            pos_a, pos_b = a_pk & pm, b_pk & pm  # keep pb = field width
            diag = jnp.where(a_first, pos_a - pos_b, pos_b - pos_a)
            return key, jnp.where(ok, diag, 0)
        return key
    # masked pair emission: invalid slots carry +inf in BOTH columns so
    # the radix sorts need no separate ok array
    return jnp.where(ok, fst, _I32_MAX), jnp.where(ok, snd, _I32_MAX)


@jax.jit
def _chunk_straddlers_jit(excl, active, t0s):
    """Per-chunk straddling rows for the host-planned sliced expansion:
    r0s[i] = last ACTIVE row with excl <= t0s[i] (-1 if none).  One tiny
    fetch replaces the per-chunk full-table reduce AND lets each chunk
    program slice its row range."""
    iota = jnp.arange(excl.shape[0], dtype=jnp.int32)

    def one(t0):
        return jnp.max(jnp.where(active & (excl <= t0), iota, -1))

    return jax.lax.map(one, t0s)


@partial(jax.jit, static_argnames=("rpad",))
def _pad_prep_rows_jit(row_tabs, *, rpad: int):
    """Pad the sliced-expansion row tables by ``rpad`` inert rows
    (excl = +inf, inactive) so a chunk's dynamic_slice can never clamp
    backwards past its straddler."""
    excl, active, *ops = row_tabs
    out = [
        jnp.concatenate([excl, jnp.full((rpad,), jnp.int32(2**30))]),
        jnp.concatenate([active, jnp.zeros((rpad,), jnp.bool_)]),
    ]
    for op in ops:
        if op.ndim == 2:
            out.append(jnp.concatenate(
                [op, jnp.zeros((rpad, op.shape[1]), op.dtype)]
            ))
        else:
            out.append(jnp.concatenate([op, jnp.zeros((rpad,), op.dtype)]))
    return tuple(out)


@partial(
    jax.jit,
    static_argnames=("chunk", "R", "pack_den", "emit_key", "emit_diag"),
)
def _expand_chunk_sliced_jit(
    row_tabs, mid_tabs, total, t0, r0, *,
    chunk: int, R: int, pack_den: int, emit_key: bool, emit_diag: bool = False,
):
    """Slots [t0, t0 + chunk) of one edge class's stream, reading ONLY
    rows [r0, r0 + R) of the (padded) row tables.

    The unsliced chunk program scatters/filters the ENTIRE row table per
    chunk — at 1M reads that is 13 chunks x an 85M-row masked scatter,
    ~20 s of the 30 s expansion.  The host plans each chunk's straddling
    row via _chunk_straddlers_jit (one tiny fetch) and R = a pow2/8 tier
    of the largest row span, so per-chunk work is O(R + chunk).  The
    straddler sits at LOCAL row 0 (has0 <=> r0 >= 0); excl is monotone,
    so a chunk's rows are contiguous."""
    has0 = r0 >= 0
    rl = jnp.maximum(r0, 0)

    def sl(a):
        if a.ndim == 2:
            return jax.lax.dynamic_slice(a, (rl, 0), (R, a.shape[1]))
        return jax.lax.dynamic_slice(a, (rl,), (R,))

    excl, active, *ops = (sl(a) for a in row_tabs)
    iota_r = jnp.arange(R, dtype=jnp.int32)
    in_win = active & (excl >= t0) & (excl < t0 + chunk)
    pos_c = jnp.where(in_win, excl - t0, chunk)
    t = t0 + jnp.arange(chunk, dtype=jnp.int32)

    # local source-row fill; the straddler is local row 0, so seed 0
    base = jnp.zeros((chunk + 1,), jnp.int32).at[pos_c].max(
        jnp.where(in_win, iota_r, 0)
    )
    ei = jax.lax.cummax(base[:chunk])
    ok = (t < total) & has0
    if pack_den:
        (a_tab,) = ops
        (mid_pk,) = mid_tabs
        g = a_tab[ei]  # ONE 2-wide row gather: (a operand, mb_off)
        a_pk = g[:, 0]
        mrank = jnp.clip(g[:, 1] + t, 0, max(mid_pk.shape[0] - 1, 0))
        b_pk = mid_pk[mrank]
        pb = _pos_bits(pack_den)
        a_id = a_pk >> pb
        b_id = b_pk >> pb
        a_first = (a_pk & ((1 << pb) - 1)) > (b_pk & ((1 << pb) - 1))
    else:
        a_rid, a_loc, mb_off = ops
        m_rid, m_loc = mid_tabs
        mrank = jnp.clip(mb_off[ei] + t, 0, max(m_rid.shape[0] - 1, 0))
        a_id = a_rid[ei]
        b_id = m_rid[mrank]
        a_first = a_loc[ei] > m_loc[mrank]  # strict-greater loc leads
    ok &= a_id != b_id  # self pairs skipped (src/KmerTable.scala:61-63)
    fst = jnp.where(a_first, a_id, b_id)
    snd = jnp.where(a_first, b_id, a_id)
    if emit_key:
        key = jnp.where(ok, ((fst << 16) | snd) ^ _SIGN, _I32_MAX)
        if emit_diag:
            pm = (1 << pb) - 1
            pos_a, pos_b = a_pk & pm, b_pk & pm
            diag = jnp.where(a_first, pos_a - pos_b, pos_b - pos_a)
            return key, jnp.where(ok, diag, 0)
        return key
    return jnp.where(ok, fst, _I32_MAX), jnp.where(ok, snd, _I32_MAX)


def _chunk_sizes(cap: int, chunk: int | None = None) -> list[int]:
    """Split a stream capacity into chunk-sized pieces (the tail piece
    may be smaller; sub-chunk caps are a single piece).  Very large caps
    (> 2^26 slots) are always chunked at 2^25 so the expansion program's
    working set stays ~1.5 GB regardless of dataset scale (a 201M-slot
    single piece exhausted HBM on the 1M-read run)."""
    chunk = _EXPAND_CHUNK if chunk is None else chunk
    if cap > (1 << 26):
        chunk = min(chunk, 1 << 25)
    if cap <= chunk:
        return [cap] if cap else []
    sizes = [chunk] * (cap // chunk)
    if cap % chunk:
        sizes.append(cap % chunk)
    return sizes


def _expand_stream_chunked(
    occ_s, edges, *, cap, pack_den, which, emit_key, chunk_size=None,
    emit_diag=False, host_planned=False,
):
    """One edge class's full stream via the chunked programs.  Returns
    (key [cap], total) when emit_key ((key, diag, total) with emit_diag),
    else (fst, snd, total) — validity is encoded as _I32_MAX sentinels in
    BOTH pair columns (invalid slots sink in the radix sorts without a
    separate ok array).

    ``host_planned`` (host-orchestrated callers only — it fetches the
    per-chunk straddling rows) switches multi-chunk expansions to the
    row-SLICED chunk program: per-chunk work drops from O(table) to
    O(row span), which is the difference between 30 s and ~10 s at the
    1M-read scale (13 chunks x 85M-row masked scatters otherwise)."""
    prep = _expand_prep_jit(occ_s, **edges, pack_den=pack_den, which=which)
    pieces = []
    sizes = _chunk_sizes(cap, chunk_size)
    if host_planned and len(sizes) > 1:
        import numpy as np

        if chunk_size is None and cap > (1 << 26):
            # the 2^25 piece size exists to bound the UNSLICED chunk's
            # table-sized working set; sliced chunks are O(R + chunk),
            # so larger pieces just amortize the per-dispatch costs
            big = 1 << 26
            sizes = [big] * (cap // big) + (
                [cap % big] if cap % big else []
            )
        t0s = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
        r0s = np.asarray(_chunk_straddlers_jit(
            prep["excl"], prep["active"],
            jnp.asarray(np.minimum(t0s, 2**31 - 1), jnp.int32),
        ))
        spans = [
            max(int(r0s[i + 1]), int(r0s[i]), 1) - max(int(r0s[i]), 0) + 1
            for i in range(len(sizes))
        ]
        R = _finish_cap(max(spans), 1 << 14)
        if pack_den:
            row_tabs = (prep["excl"], prep["active"], prep["a_tab"])
            mid_tabs = (prep["mid_pk"],)
        else:
            row_tabs = (
                prep["excl"], prep["active"],
                prep["a_rid"], prep["a_loc"], prep["mb_off"],
            )
            mid_tabs = (prep["m_rid"], prep["m_loc"])
        row_tabs = _pad_prep_rows_jit(row_tabs, rpad=R)
        for i, c in enumerate(sizes):
            pieces.append(_expand_chunk_sliced_jit(
                row_tabs, mid_tabs, prep["total"], jnp.int32(t0s[i]),
                jnp.int32(r0s[i]), chunk=c, R=R, pack_den=pack_den,
                emit_key=emit_key, emit_diag=emit_diag,
            ))
        sizes = []
    t0 = 0
    for c in sizes:
        pieces.append(_expand_chunk_jit(
            prep, jnp.int32(t0), chunk=c, pack_den=pack_den,
            emit_key=emit_key, emit_diag=emit_diag,
        ))
        t0 += c
    cat = lambda ps: (
        jnp.concatenate(ps) if len(ps) != 1 else ps[0]
    ) if ps else jnp.zeros((0,), jnp.int32)
    if emit_key and emit_diag:
        return cat([p[0] for p in pieces]), cat([p[1] for p in pieces]), \
            prep["total"]
    if emit_key:
        return cat(pieces), prep["total"]
    if not pieces:
        z = jnp.zeros((0,), jnp.int32)
        return z, z, prep["total"]
    return cat([p[0] for p in pieces]), cat([p[1] for p in pieces]), \
        prep["total"]


@jax.jit
def _sort_keys_jit(key_h, key_t):
    """ONE unstable single-operand sort of the concatenated packed keys
    (~7x less sort work than two stable 2-operand passes)."""
    return jax.lax.sort(
        (jnp.concatenate([key_h, key_t]),), num_keys=1, is_stable=False
    )[0]


@jax.jit
def _sort_keys_diag_jit(key_h, key_t, diag_h, diag_t):
    """(key, diag) 2-key unstable sort: runs stay grouped by pair key and
    each run's collision diagonals come out ascending — the layout the
    diagonal-coherence prescreen needs."""
    return jax.lax.sort(
        (jnp.concatenate([key_h, key_t]),
         jnp.concatenate([diag_h, diag_t])),
        num_keys=2, is_stable=False,
    )


@partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _sort_pairs_np_jit(h_fst, h_snd, t_fst, t_snd):
    """Aggregation sort for the general-id path (>16-bit read ids): ONE
    unstable 2-key lexicographic sort — there is no payload, so stability
    buys nothing, and the earlier two stable passes cost ~2x.  Operands
    arrive pre-masked (invalid rows carry +inf in both columns and sink)
    and are donated — at 1M-read caps they are multi-GB and die here."""
    fstm = jnp.concatenate([h_fst, t_fst])
    sndm = jnp.concatenate([h_snd, t_snd])
    return jax.lax.sort((fstm, sndm), num_keys=2, is_stable=False)


def _run_length_keep(fst2, snd2, okv, min_collisions, max_collisions):
    """Run-length counts via forward/backward run-boundary fills; keep =
    run representative with count inside the collision band
    (src/KmerTable.scala:155-187).  The backward fill uses
    ``cummin(reverse=True)`` — ``jnp.flip`` materializes full-stream
    copies (2 x 1.6 GB at 1M-read caps) that pushed the finish past HBM."""
    n = fst2.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate(
        [
            jnp.ones((1,), jnp.bool_),
            (fst2[1:] != fst2[:-1]) | (snd2[1:] != snd2[:-1]),
        ]
    )
    start_fill = jax.lax.cummax(jnp.where(first, idx, 0))
    nxt = jax.lax.cummin(jnp.where(first, idx, _I32_MAX), reverse=True)
    nxt = jnp.concatenate([nxt[1:], jnp.full((1,), n, jnp.int32)])
    cnt = jnp.minimum(nxt, n) - start_fill  # exact at run-start positions
    keep = first & okv & (min_collisions <= cnt) & (cnt <= max_collisions)
    return cnt, keep


def _finish_core(
    key_s, min_collisions, max_collisions, *, cap_out: int,
    with_counts: bool, diag_s=None, screen_w=None,
):
    """Sorted packed keys -> run-length counts -> collision-band filter ->
    compacted (lead, trail, count, n_out).

    Compaction is BY SORT, not by scatter: kept run representatives carry
    distinct keys, so one unstable 2-operand sort (masked key, count)
    moves them to the front already in canonical key order, and the
    compacted table is a slice.  (The earlier cumsum + two-scatter
    compaction spent ~0.7 s per stream-sized scatter; the whole sort is
    ~0.2 s at 84M.)

    With ``diag_s`` (the run-ascending collision diagonals from the 2-key
    sort) and ``screen_w``, the diagonal-coherence prescreen additionally
    requires some ADJACENT pair of a run's collisions to lie within
    ``screen_w`` diagonals of each other (runs of size 1 are exempt) —
    see candidate_pairs_stream for the rationale and safety story."""
    okv = key_s != _I32_MAX
    uk = key_s ^ _SIGN  # un-flip; low/high 16-bit fields are (fst, snd)
    fst2 = jnp.where(okv, (uk >> 16) & 0xFFFF, _I32_MAX)
    snd2 = uk & 0xFFFF
    cnt, keep = _run_length_keep(fst2, snd2, okv, min_collisions, max_collisions)
    if diag_s is not None:
        n = key_s.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        same = jnp.concatenate(
            [jnp.zeros((1,), jnp.bool_), key_s[1:] == key_s[:-1]]
        ) & okv
        near = jnp.concatenate(
            [jnp.zeros((1,), jnp.bool_),
             (diag_s[1:] - diag_s[:-1]) <= screen_w]
        )
        mark = (same & near).astype(jnp.int32)
        cm = jnp.cumsum(mark)
        first = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), key_s[1:] != key_s[:-1]]
        )
        seg_l = jax.lax.cummax(jnp.where(first, idx, 0))
        nxt = jax.lax.cummin(jnp.where(first, idx, _I32_MAX), reverse=True)
        nxt = jnp.minimum(
            jnp.concatenate([nxt[1:], jnp.full((1,), n, jnp.int32)]), n
        )
        # any near-diagonal adjacent pair inside the run [l, r)?
        passes = (cm[nxt - 1] - cm[seg_l]) > 0
        keep = keep & (passes | (cnt < 2))  # size-1 runs exempt
        n_out = jnp.sum(keep.astype(jnp.int32))
    else:
        n_out = jnp.sum(keep.astype(jnp.int32))
    kmask = jnp.where(keep, key_s, _I32_MAX)
    if with_counts:
        key_c, cnt_c = jax.lax.sort(
            (kmask, jnp.where(keep, cnt, 0)), num_keys=1, is_stable=False
        )
    else:  # production: counts are diagnostics — 1-operand sort suffices
        key_c = jax.lax.sort((kmask,), num_keys=1, is_stable=False)[0]
        cnt_c = None
    if cap_out > key_c.shape[0]:  # degenerate: cap_out beyond the stream
        pad = cap_out - key_c.shape[0]
        key_c = jnp.concatenate([key_c, jnp.full((pad,), _I32_MAX)])
        if with_counts:
            cnt_c = jnp.concatenate([cnt_c, jnp.zeros((pad,), jnp.int32)])
    slot_ok = key_c[:cap_out] != _I32_MAX
    keyc = jnp.where(slot_ok, key_c[:cap_out] ^ _SIGN, 0)
    lead = jnp.where(slot_ok, (keyc >> 16) & 0xFFFF, 0)
    trail = keyc & 0xFFFF
    ocnt = cnt_c[:cap_out] if with_counts else None
    return dict(lead=lead, trail=trail, count=ocnt, n_out=n_out)


@partial(jax.jit, static_argnames=("cap_out", "with_counts"))
def _finish_packed_jit(
    key_s, min_collisions, max_collisions, *, cap_out: int, with_counts: bool
):
    return _finish_core(
        key_s, min_collisions, max_collisions,
        cap_out=cap_out, with_counts=with_counts,
    )


@partial(jax.jit, static_argnames=("cap_out", "with_counts"))
def _finish_screened_jit(
    key_s, diag_s, min_collisions, max_collisions, screen_w, *,
    cap_out: int, with_counts: bool,
):
    return _finish_core(
        key_s, min_collisions, max_collisions,
        cap_out=cap_out, with_counts=with_counts,
        diag_s=diag_s, screen_w=screen_w,
    )


def _finish_cap(n: int, floor: int = 1 << 14) -> int:
    """Capacity tier for the exact kept count (pow2/8 steps)."""
    c = floor
    while c < n:
        c += max(c // 8, 1)
    return c


@jax.jit
def _np_keep_count_jit(fst2, snd2, min_collisions, max_collisions):
    """Run-length pass for the general-id path: (n_keep, cnt, keep).
    The scalar n_keep sizes the compaction exactly (the raw_total-based
    bound on cap_out over-reserves by >10x); cnt/keep feed the compaction
    so the scans never re-run."""
    okv = fst2 != _I32_MAX
    cnt, keep = _run_length_keep(fst2, snd2, okv, min_collisions, max_collisions)
    return jnp.sum(keep.astype(jnp.int32)), cnt, keep


@partial(
    jax.jit, static_argnames=("cap_out",), donate_argnums=(0, 1, 2, 3)
)
def _finish_np_jit(fst2, snd2, cnt, keep, *, cap_out: int):
    lead, trail, ocnt, n_out = compact_pairs(fst2, snd2, cnt, keep, cap_out)
    return dict(lead=lead, trail=trail, count=ocnt, n_out=n_out)


@partial(
    jax.jit,
    static_argnames=("cap_head", "cap_tail", "cap_out", "pack_den",
                     "with_counts", "chunk_size", "screen"),
)
def _pairgen_fused_jit(
    occ_s, head_edge, tail_edge, mid_lead, mid_tail,
    min_collisions, max_collisions, screen_w=None, *,
    cap_head: int, cap_tail: int, cap_out: int, pack_den: int,
    with_counts: bool, chunk_size: int, screen: bool = False,
):
    """Packed-id pair generation as ONE compiled program: both class
    expansions, the key sort, run-length counting and sort-compaction
    fused — saves the split pipeline's inter-program HBM round trips and
    per-dispatch tunnel latency.  (Safe to fuse now that the
    associative_scan is gone; the split pieces remain the test, retry
    and non-packed surfaces.)"""
    geom = dict(
        head_edge=head_edge, tail_edge=tail_edge,
        mid_lead=mid_lead, mid_tail=mid_tail,
    )
    if screen:
        key_h, diag_h, h_tot = _expand_stream_chunked(
            occ_s, geom, cap=cap_head, pack_den=pack_den, which="head",
            emit_key=True, chunk_size=chunk_size, emit_diag=True,
        )
        key_t, diag_t, t_tot = _expand_stream_chunked(
            occ_s, geom, cap=cap_tail, pack_den=pack_den, which="tail",
            emit_key=True, chunk_size=chunk_size, emit_diag=True,
        )
        key_s, diag_s = _sort_keys_diag_jit(key_h, key_t, diag_h, diag_t)
        out = _finish_screened_jit(
            key_s, diag_s, min_collisions, max_collisions, screen_w,
            cap_out=cap_out, with_counts=with_counts,
        )
        return dict(out, h_tot=h_tot, t_tot=t_tot)
    key_h, h_tot = _expand_stream_chunked(
        occ_s, geom, cap=cap_head, pack_den=pack_den, which="head",
        emit_key=True, chunk_size=chunk_size,
    )
    key_t, t_tot = _expand_stream_chunked(
        occ_s, geom, cap=cap_tail, pack_den=pack_den, which="tail",
        emit_key=True, chunk_size=chunk_size,
    )
    key_s = _sort_keys_jit(key_h, key_t)
    out = _finish_packed_jit(
        key_s, min_collisions, max_collisions,
        cap_out=cap_out, with_counts=with_counts,
    )
    return dict(out, h_tot=h_tot, t_tot=t_tot)


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
    packed_ids: bool = False,
    pack_den: int = 0,
    with_counts: bool = True,
    packed_split: bool = False,
    prescreen_w: int | None = None,
):
    """Global-stream candidate generation (the single-chip fast path).

    Host orchestrator over the split programs above: expand the head and
    tail edge x middle cross-product streams (one shared compiled program
    when cap_head == cap_tail), aggregate by sort, run-length count and
    compact.  All dispatches are async — the host never blocks between
    stages; intermediates live in HBM.

    Everything is 1-D: on TPU, flat gathers from flat tables are ~10x
    cheaper than 2-D lane-axis gathers (take_along_axis) — an earlier
    per-lead-row design built around the latter paid ~10 s at 4k reads.

    Capacities are exact: ``plan_totals_device`` computes the true
    h_total/t_total on device, and raw_total // min_collisions bounds
    cap_out, so overflow retries never fire in practice (and when they
    do, only the small finish program recompiles).

    Semantics identical to calcPairData + calcDispatchData
    (src/KmerTable.scala:85-187): per unique k-mer, head-edge x middle and
    tail-edge x middle pairs, loc-ordered (strictly greater loc leads,
    src/KmerTable.scala:65-71), self-pairs dropped, collision count kept
    within [min_collisions, max_collisions].

    ``prescreen_w`` (packed fast path only) enables the diagonal-coherence
    prescreen: a pair with >= 2 collisions must have some adjacent pair of
    its diagonal-sorted collisions within ``prescreen_w`` of each other.
    Rationale: any alignment passing the validity bar (identity >= 0.98
    over >= 40 columns) contains an exact-match run of >= 22 bases — >= 11
    shared k-mers on ONE diagonal — so genuine overlaps produce tightly
    clustered collision diagonals, while repeat-driven junk scatters.
    This is an EMPIRICALLY-lossless filter (verified byte-identical on the
    c_ruddii and crp177 datasets plus randomized tests), not a theorem:
    a pathological pair could validate through k-mers that the edge/middle
    class geometry never counted.  It is off by default and opt-in via the
    engine (Overlapper(prescreen=True) / --prescreen).
    """
    occ_s = occ if presorted else sort_occurrences_jit(occ)
    edges = dict(
        head_edge=head_edge, tail_edge=tail_edge,
        mid_lead=mid_lead, mid_tail=mid_tail,
    )
    screen = bool(prescreen_w) and packed_ids and pack_den > 0
    if packed_ids and packed_split:
        # split pieces as SEPARATE dispatches: overflow retries touch only
        # the finish program, and each piece compiles independently
        if screen:
            key_h, diag_h, h_tot = _expand_stream_chunked(
                occ_s, edges, cap=cap_head, pack_den=pack_den,
                which="head", emit_key=True, emit_diag=True,
                host_planned=True,
            )
            key_t, diag_t, t_tot = _expand_stream_chunked(
                occ_s, edges, cap=cap_tail, pack_den=pack_den,
                which="tail", emit_key=True, emit_diag=True,
                host_planned=True,
            )
            key_s, diag_s = _sort_keys_diag_jit(key_h, key_t, diag_h, diag_t)
            out = _finish_screened_jit(
                key_s, diag_s, min_collisions, max_collisions,
                jnp.int32(prescreen_w),
                cap_out=cap_out, with_counts=with_counts,
            )
        else:
            key_h, h_tot = _expand_stream_chunked(
                occ_s, edges, cap=cap_head, pack_den=pack_den, which="head",
                emit_key=True, host_planned=True,
            )
            key_t, t_tot = _expand_stream_chunked(
                occ_s, edges, cap=cap_tail, pack_den=pack_den, which="tail",
                emit_key=True, host_planned=True,
            )
            key_s = _sort_keys_jit(key_h, key_t)
            out = _finish_packed_jit(
                key_s, min_collisions, max_collisions,
                cap_out=cap_out, with_counts=with_counts,
            )
    elif packed_ids:
        fused = _pairgen_fused_jit(
            occ_s, **edges,
            min_collisions=min_collisions, max_collisions=max_collisions,
            screen_w=jnp.int32(prescreen_w) if screen else None,
            cap_head=cap_head, cap_tail=cap_tail, cap_out=cap_out,
            pack_den=pack_den, with_counts=with_counts,
            chunk_size=_EXPAND_CHUNK, screen=screen,
        )
        h_tot, t_tot = fused["h_tot"], fused["t_tot"]
        out = {k: fused[k] for k in ("lead", "trail", "count", "n_out")}
    else:
        h_fst, h_snd, h_tot = _expand_stream_chunked(
            occ_s, edges, cap=cap_head, pack_den=pack_den, which="head",
            emit_key=False, host_planned=True,
        )
        t_fst, t_snd, t_tot = _expand_stream_chunked(
            occ_s, edges, cap=cap_tail, pack_den=pack_den, which="tail",
            emit_key=False, host_planned=True,
        )
        import warnings

        with warnings.catch_warnings():
            # CPU cannot honor the donation; the warning is expected noise
            warnings.filterwarnings(
                "ignore", message="Some donated buffers were not usable"
            )
            fst2, snd2 = _sort_pairs_np_jit(h_fst, h_snd, t_fst, t_snd)
        # size the compaction from the TRUE kept count (one scalar
        # fetch): raw_total // min_collisions over-reserves by >10x
        n_keep_dev, cnt, keep = _np_keep_count_jit(
            fst2, snd2, min_collisions, max_collisions
        )
        cap_eff = min(cap_out, _finish_cap(int(n_keep_dev)))
        with warnings.catch_warnings():
            warnings.filterwarnings(
                "ignore", message="Some donated buffers were not usable"
            )
            out = _finish_np_jit(fst2, snd2, cnt, keep, cap_out=cap_eff)
    overflow = (h_tot > cap_head) | (t_tot > cap_tail) | (out["n_out"] > cap_out)
    return dict(out, h_tot=h_tot, t_tot=t_tot, overflow=overflow)
