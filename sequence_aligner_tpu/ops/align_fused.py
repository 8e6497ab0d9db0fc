"""Fused Pallas dovetail kernels: traceback folded into the DP fill.

The round-1 kernels emitted a per-cell direction code array
([la+1, w+1, P] int32 per phase, ~86 MB per 16k-pair batch) and walked
it afterwards with a step-locked XLA scan — ~228 *sequential* HBM
gathers per batch, which dominated end-to-end time.  These kernels
eliminate the traceback entirely: each cell's full backtrack outcome is
a function of its predecessor cell's (already final) outcome, and is
propagated as auxiliary per-cell state DURING the fill:

  aux(q) = (stop coords, correct, error)
  p      = pred(q, argmax-branch(q))
  aux(q) = cont(p) ? aux(p) + contrib(q) : (coords(p), contrib(q))

where contrib(q) = match/mismatch for an M-branch (chars-equal bit),
error for X/Y gap branches; cont(p) = max(M,X,Y)(p) > 0.  Path length
needs no state of its own: every backtrack step contributes exactly one
match or one error, so align_len == correct + error.

The kernels are VPU-issue-bound (band width 13 -> every logical op is a
handful of 8x128 vregs), so the round-5 row steps cut vector-op count
three ways on top of the round-4 design:

  * extraction: instead of 2-3 sublane REDUCTIONS per row (row max,
    first-argmax column, masked aux capture), the running best is an
    ELEMENTWISE packed word per band position, (value << .. | (IM - i)
    << .. | (KM - k)), whose int32 `>` order is exactly the reference's
    strict-> row-major running max (earlier row, then smaller column,
    wins ties).  A per-position aux capture rides the same compare; ONE
    band reduction at kernel end decodes (best, i, j, aux).
  * gated chains: the in-row X recurrence out[k] = A[k] ? out[k-1]
    : V[k] packs its gate into the VALUE's sign bit, so each
    log-doubling step is shift+compare+select (3 ops) instead of the
    5-op (A, V) pair composition.  Phase 2's AFFINE chain (+1 error per
    traversed cell) becomes a constant chain via the change of variable
    out'[k] = out[k] + (w - k): gated steps then carry out' unchanged,
    and one add before / subtract after the chain restores the counts
    (transient field overflow is harmless — the packed word is a plain
    integer and fields are only decoded after the final subtract).
  * static boundaries: with a uniform read length (ulen), phase 2's
    in-band masks are only live for the first zero_row rows and the last
    ~w rows; the kernel runs three fori_loops (masked head, unmasked
    interior, masked tail) instead of paying the mask ops every row.
    Phase 1 additionally drops its (i <= alen) extraction gate when
    every lane spans all la_max rows.

The packed extraction and the merged phase-2 aux word each need their
fields to fit 31 bits; shapes that exceed the budget (reads ~>= 1000 bp)
fall back to the round-4 row steps (_phase1_row_legacy /
_phase2_row_legacy), kept verbatim.

M and Y branches read the previous row's aux (vector ops); the X branch
reads the *current* row at k-1 — the in-row chain above.  The row steps
are pure functions shared by the Pallas kernels (TPU) and a lax.scan
formulation (every other backend), so both paths are one source of
semantics.  Semantics are validated element-for-element against the
NumPy oracle (oracle/align.py, replicating src/BioLibs.scala:373-591),
including strict-> running max in row-major scan order and M -> X -> Y
branch preference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -(2**30)  # python int: jnp scalars become captured consts in kernels


# Tests flip this to route the engines through the packed Pallas kernels
# under the Pallas interpreter on CPU (covers the TPU-only code paths —
# grid sizing, packed unpack, in-kernel dove shift — in CPU CI).
FORCE_PACKED_INTERPRET = False


def _interpret() -> bool:
    """Non-TPU backends take the lax.scan formulation of the same row
    steps (Pallas interpret mode is far slower than compiled scans)."""
    if FORCE_PACKED_INTERPRET:
        return False
    return jax.default_backend() != "tpu"


def kernel_interpret() -> bool:
    """interpret= value for the packed kernels: True only when a non-TPU
    backend was forced onto the packed path (tests)."""
    return FORCE_PACKED_INTERPRET and jax.default_backend() != "tpu"


def _max3(a, b, c):
    return jnp.maximum(a, jnp.maximum(b, c))


def _band_cummax(v, w: int):
    """Running max along the (sublane) band axis of v [w, P] via
    log-steps of shift+max (out-of-range contributions = -inf)."""
    sh = 1
    while sh < w:
        shifted = jnp.concatenate(
            [jnp.full((sh, v.shape[1]), _NEG), v[:-sh]], axis=0
        )
        v = jnp.maximum(v, shifted)
        sh *= 2
    return v


def _branch(mv, xv, yv):
    """Cell branch with M -> X -> Y preference: 0=M, 1=X, 2=Y."""
    mx = _max3(mv, xv, yv)
    return jnp.where(mv == mx, 0, jnp.where(xv == mx, 1, 2)), mx


def _gated_chain(A, V):
    """Resolve the in-row recurrence out[k] = A[k] ? out[k-1] : V[k]
    along the band (sublane) axis by log-doubling composition of gated
    constant maps f_k(x) = A_k ? x : V_k  (compose: A = A_g & A_f,
    V = A_g ? V_f : V_g).  A is an int32 0/1 mask (Mosaic rejects i1
    vectors); row 0 must have A == 0, which grounds every composition so
    shifted-in padding never reaches a live value.  (Legacy-path form;
    the fast rows use _gated_chain_sign.)"""
    cols, p = A.shape
    sh = 1
    while sh < cols:
        pad = jnp.zeros((sh, p), jnp.int32)
        A_sh = jnp.concatenate([pad, A[:-sh]], axis=0)
        V_sh = jnp.concatenate([pad, V[:-sh]], axis=0)
        V = jnp.where(A == 1, V_sh, V)
        A = A * A_sh
        sh *= 2
    return V


def _gated_chain_affine(A, V, b):
    """Affine variant for the count chain: f_k(x) = A_k ? x + b_k : V_k
    (compose: A = A_g & A_f, V = A_g ? V_f + b_g : V_g, b = b_g + b_f).
    (Legacy-path form.)"""
    cols, p = A.shape
    sh = 1
    while sh < cols:
        pad = jnp.zeros((sh, p), jnp.int32)
        A_sh = jnp.concatenate([pad, A[:-sh]], axis=0)
        V_sh = jnp.concatenate([pad, V[:-sh]], axis=0)
        b_sh = jnp.concatenate([pad, b[:-sh]], axis=0)
        V = jnp.where(A == 1, V_sh + b, V)
        b = b + b_sh
        A = A * A_sh
        sh *= 2
    return V


def _gated_chain_sign(W, cols: int):
    """Sign-gated constant chain: W = V | (gate << 31) with V >= 0;
    resolves out[k] = gate[k] ? out[k-1] : V[k] in ceil(log2 cols) steps
    of shift + compare + select (the gate rides the value's sign bit, so
    no separate (A, V) pair composition).  Row 0 must have gate == 0:
    the chain is then fully grounded within the log steps and the result
    always comes from a gate-0 source, i.e. its sign bit is clear."""
    p = W.shape[1]
    sh = 1
    while sh < cols:
        W_sh = jnp.concatenate([jnp.zeros((sh, p), jnp.int32), W[:-sh]], axis=0)
        W = jnp.where(W < 0, W_sh, W)
        sh *= 2
    return W


def _extract_bits(n_rows: int, w: int, cm_tuple):
    """Static layout for the packed elementwise running-max extraction:
    (value << (ibits+kbits)) | ((IM - row) << kbits) | (KM - col).
    int32 `>` on these words IS the reference's strict-> row-major
    running max (value desc, then row asc, then column asc on ties).
    Returns (ibits, kbits), or None when the worst-case DP value cannot
    share 31 bits with the coordinates (long-read shapes -> legacy rows).
    """
    kbits = (w + 1).bit_length()
    ibits = max(int(n_rows).bit_length(), 1)
    vmax = (n_rows + w + 2) * max(max(cm_tuple), 1)
    if vmax.bit_length() + ibits + kbits <= 31:
        return (ibits, kbits)
    return None


def _sub_row(a_code, b_codes, cm_tuple, pblk):
    """Substitution scores for one DP row: cm[a, b] with a [P] fixed per
    pair and b [w, P] varying along the band.

    Two-level select: build the four per-pair columns cm[a, c] (cheap [P]
    ops), then select over b — 6 band-shaped ops instead of the 30 a
    16-way chain costs (the kernels are vector-issue-bound)."""
    a1 = a_code == 1
    a2 = a_code == 2
    a3 = a_code == 3

    def col(c):
        return jnp.where(
            a3, jnp.int32(cm_tuple[12 + c]),
            jnp.where(
                a2, jnp.int32(cm_tuple[8 + c]),
                jnp.where(a1, jnp.int32(cm_tuple[4 + c]), jnp.int32(cm_tuple[c])),
            ),
        )

    t0, t1, t2, t3 = (col(c)[None, :] for c in range(4))
    return jnp.where(
        b_codes == 0, t0,
        jnp.where(b_codes == 1, t1, jnp.where(b_codes == 2, t2, t3)),
    )


def _sub_planes(b_codes, cm_tuple):
    """Hoisted form for a FIXED b window (phase 1): the four per-a-code
    score planes cm[a, b_codes] are built once before the row loop; each
    row then pays 3 band selects instead of _sub_row's 6 band + ~15 [P]
    ops.  (Phase 2's window slides per row, so it keeps _sub_row.)"""
    def plane(a):
        c = [jnp.int32(cm_tuple[4 * a + b]) for b in range(4)]
        return jnp.where(
            b_codes == 0, c[0],
            jnp.where(b_codes == 1, c[1],
                      jnp.where(b_codes == 2, c[2], c[3])),
        )

    return tuple(plane(a) for a in range(4))


def _sub_from_planes(a_code, planes):
    a = a_code[None, :]
    return jnp.where(
        a == 0, planes[0],
        jnp.where(a == 1, planes[1], jnp.where(a == 2, planes[2], planes[3])),
    )


# ---------------------------------------------------------------------------
# Phase 1 — banded SW of A vs B[0:width], anchoring where B's prefix
# lands in A (src/BioLibs.scala:399-466).
# ---------------------------------------------------------------------------


def _p1_consts(cols: int, pblk: int, w: int, gE: int, xpk):
    """Loop-invariant [*, P] constants, built ONCE per kernel/scan (the
    round-4 rows rebuilt the iota products every row inside fori_loop,
    where Mosaic does not hoist them)."""
    karr = jax.lax.broadcasted_iota(jnp.int32, (cols, pblk), 0)
    k1 = jax.lax.broadcasted_iota(jnp.int32, (w, pblk), 0) + 1
    d = dict(
        karr=karr,
        k1gE=k1 * gE,
        k21gE=(k1 + 1) * gE,
        Km1=(karr - 1) & 0xFFFF,
    )
    if xpk is not None:
        ibits, kbits = xpk
        d["IM"] = (1 << ibits) - 1
        d["kcode1"] = ((1 << kbits) - 1) - k1
    return d


def _phase1_row_fast(
    carry, i, a_code, *, planes, alen, cst, w, gO, gE, xpk, gate_len,
):
    """One DP row of the phase-1 banded SW with in-fill stop propagation
    — the round-5 low-op form (packed elementwise extraction, sign-gated
    X chain, fused aux select tree).  ``gate_len=False`` skips the
    (i <= alen) extraction gate (uniform-length lanes span all rows)."""
    mp, xp, yp, sp, cont, R, capA = carry
    ibits, kbits = xpk
    pblk = a_code.shape[0]
    sub = _sub_from_planes(a_code, planes)
    zrow1 = jnp.zeros((1, pblk), jnp.int32)
    m_new = jnp.concatenate(
        [zrow1, sub + _max3(mp[:-1], yp[:-1], jnp.maximum(xp[:-1], 0))],
        axis=0,
    )
    y_new = jnp.concatenate(
        [zrow1, gE + _max3(mp[1:] + gO, yp[1:], jnp.maximum(xp[1:] + gO, 0))],
        axis=0,
    )
    c = jnp.maximum(jnp.maximum(m_new[:-1], y_new[:-1]) + gO, 0)
    run = _band_cummax(c - cst["k1gE"], w)
    x_new = jnp.concatenate([zrow1, cst["k21gE"] + run], axis=0)
    mx = _max3(m_new, x_new, y_new)
    cont_new = (mx > 0).astype(jnp.int32)
    is_m = m_new == mx

    # M branch: pred = (i-1, k-1); Y branch: pred = (i-1, k) — one fused
    # select tree over (aux, liveness, dead-pred coords)
    sp_sh = jnp.concatenate([zrow1, sp[:-1]], axis=0)
    cont_sh = jnp.concatenate([zrow1, cont[:-1]], axis=0)
    st = jnp.where(is_m, sp_sh, sp)
    ct = jnp.where(is_m, cont_sh, cont)
    cell = ((i - 1) << 16) | jnp.where(is_m, cst["Km1"], cst["karr"])
    s0 = jnp.where(ct == 1, st, cell)

    # X branch: pred = (i, k-1) — in-row recurrence, sign-gated chain
    # (row 0 is never X-updated: chain grounded)
    is_x = jnp.concatenate(
        [zrow1,
         ((x_new[1:] == mx[1:]) & (m_new[1:] != mx[1:])).astype(jnp.int32)],
        axis=0,
    )
    lc = jnp.concatenate([zrow1, cont_new[:-1]], axis=0)
    xbase = (i << 16) | cst["Km1"]
    V = jnp.where(is_x == 1, xbase, s0)
    s_new = _gated_chain_sign(V | ((is_x * lc) << 31), w + 1)

    # running best: elementwise packed (value, -row, -col) max per band
    # position + per-position aux capture; ONE reduction at kernel end
    val = jnp.maximum(mx[1:], 0)
    addv = ((cst["IM"] - i) << kbits) + cst["kcode1"]
    P = (val << (ibits + kbits)) | addv
    if gate_len:
        P = jnp.where((i <= alen)[None, :], P, 0)
    upd = P > R
    capA = jnp.where(upd, s_new[1:], capA)
    R = jnp.where(upd, P, R)
    return m_new, x_new, y_new, s_new, cont_new, R, capA


def _phase1_init_fast(cols, w, pblk):
    zero = jnp.zeros((cols, pblk), jnp.int32)
    zw = jnp.zeros((w, pblk), jnp.int32)
    return zero, zero, zero, zero, zero, zw, zw


def _p1_final(R, capA, xpk):
    """Decode the packed running best: (best, bi, jb, fst) [P] each,
    matching the legacy per-row extraction (zeros when never positive)."""
    ibits, kbits = xpk
    IM, KM = (1 << ibits) - 1, (1 << kbits) - 1
    rb = jnp.max(R, axis=0)
    sel = R == rb[None, :]
    cap = jnp.max(jnp.where(sel, capA, 0), axis=0)
    best = rb >> (ibits + kbits)
    pos = best > 0
    z = jnp.zeros_like(best)
    bi = jnp.where(pos, IM - ((rb >> kbits) & IM), z)
    bj = jnp.where(pos, KM - (rb & KM), z)
    fst = jnp.where(pos, cap, z)
    return best, bi, bj, fst


def _phase1_row_legacy(
    carry, i, a_code, *, planes, alen, karr, la_max, w, gO, gE, cm_tuple,
):
    """Round-4 row step, kept verbatim for shapes whose packed encodings
    exceed 31 bits (reads ~>= 1000 bp).  ``cont`` carries the previous
    row's liveness mask (mx > 0) so it is never recomputed."""
    mp, xp, yp, sp, cont, best, bi, bj, fst = carry
    pblk = a_code.shape[0]
    sub = _sub_from_planes(a_code, planes)
    zrow1 = jnp.zeros((1, pblk), jnp.int32)
    m_new = jnp.concatenate(
        [zrow1, sub + _max3(mp[:-1], yp[:-1], jnp.maximum(xp[:-1], 0))],
        axis=0,
    )
    y_new = jnp.concatenate(
        [zrow1, gE + _max3(mp[1:] + gO, yp[1:], jnp.maximum(xp[1:] + gO, 0))],
        axis=0,
    )
    c = _max3(m_new[:-1] + gO, y_new[:-1] + gO, jnp.zeros((w, pblk), jnp.int32))
    k1 = jax.lax.broadcasted_iota(jnp.int32, (w, pblk), 0) + 1
    run = _band_cummax(c - k1 * gE, w)
    x_new = jnp.concatenate([zrow1, (k1 + 1) * gE + run], axis=0)

    br, mx = _branch(m_new, x_new, y_new)
    cont_i = cont  # row i-1 liveness, carried from its own mx

    # M branch: pred = (i-1, k-1); Y branch: pred = (i-1, k)
    pm_cont = jnp.concatenate([zrow1, cont_i[:-1]], 0)
    pm_st = jnp.concatenate([zrow1, sp[:-1]], 0)
    im1 = (i - 1) << 16
    pm_cell = (karr - 1) & 0xFFFF
    selM = jnp.where(pm_cont == 1, pm_st, im1 | pm_cell)
    selY = jnp.where(cont_i == 1, sp, im1 | karr)
    s0 = jnp.where(br == 0, selM, selY)

    # X branch: pred = (i, k-1)
    i16 = i << 16
    is_x = jnp.concatenate(
        [zrow1, (br[1:] == 1).astype(jnp.int32)], axis=0
    )
    lc = jnp.concatenate([zrow1, (mx[:-1] > 0).astype(jnp.int32)], axis=0)
    xbase = i16 | ((karr - 1) & 0xFFFF)
    vx = jnp.where(is_x == 1, jnp.where(lc == 1, 0, xbase), s0)
    s_new = _gated_chain(is_x * lc, vx)

    # running max: strict > in row-major scan order, first col wins
    row_t = mx[1:]
    rb = jnp.max(row_t, axis=0)
    kia = jax.lax.broadcasted_iota(jnp.int32, row_t.shape, 0)
    jb = jnp.min(jnp.where(row_t == rb[None, :], kia, la_max + w + 2), axis=0) + 1
    sel = karr == jb[None, :]
    cap = jnp.max(jnp.where(sel, s_new, 0), axis=0)
    upd = (i <= alen) & (rb > best)
    best = jnp.where(upd, rb, best)
    bi = jnp.where(upd, i, bi)
    bj = jnp.where(upd, jb, bj)
    fst = jnp.where(upd, cap, fst)
    cont_new = (mx > 0).astype(jnp.int32)
    return m_new, x_new, y_new, s_new, cont_new, best, bi, bj, fst


def _phase1_init_legacy(cols, pblk):
    zero = jnp.zeros((cols, pblk), jnp.int32)
    z = jnp.zeros((pblk,), jnp.int32)
    return zero, zero, zero, zero, zero, z, z, z, z


def _unpack_static(w_ref, r: int):
    """Code row r of a packed-words ref, r a Python int ([pblk] int32).
    Arithmetic >> is safe under the & 3 mask: bits r*2, r*2+1 land in the
    low two positions regardless of sign fill."""
    return (w_ref[r >> 4, :] >> (2 * (r & 15))) & 3


def _unpack_dyn(w_ref, r):
    """Code row r of a packed-words ref, r a traced scalar."""
    row = w_ref[pl.ds(r >> 4, 1), :]
    return (row[0] >> (2 * (r & 15))) & 3


def _lsr(x, sh):
    """Logical right shift of int32 x by per-lane sh in [0, 31] (Mosaic
    int32 >> is arithmetic; clearing the sign-filled bit after a 1-step
    pre-shift makes the rest logical)."""
    x1 = (x >> 1) & jnp.int32(0x7FFFFFFF)
    return jnp.where(sh == 0, x, x1 >> jnp.maximum(sh - 1, 0))


def _shift_words(aw, ds, wpr: int):
    """Per-lane dove shift on packed words: out[q] holds codes
    ds .. ds+15 of word-stream aw at q = 0, i.e. code (r + ds) of A sits
    at bit 2*(r % 16) of out[r // 16] — the in-kernel replacement for a
    [la_max, P] element gather.  Word-level rotation is log-doubling
    selects along sublanes; the sub-word residue is a per-lane variable
    bit shift."""
    pblk = aw.shape[1]
    m = ds >> 4
    sh = (2 * (ds & 15))[None, :]
    rot = aw
    step, bit = 1, 0
    while step <= wpr:  # m <= wpr (ds <= 16 * wpr)
        take = ((m >> bit) & 1)[None, :]
        shifted = jnp.concatenate(
            [rot[step:], jnp.zeros((min(step, wpr), pblk), jnp.int32)[:step]],
            axis=0,
        ) if step < wpr else jnp.zeros((wpr, pblk), jnp.int32)
        rot = jnp.where(take == 1, shifted, rot)
        step *= 2
        bit += 1
    nxt = jnp.concatenate(
        [rot[1:], jnp.zeros((1, pblk), jnp.int32)], axis=0
    )
    hi = jnp.where(sh == 0, 0, (nxt << (31 - sh)) << 1)
    return jnp.where(sh == 0, rot, _lsr(rot, sh) | hi)


def _phase1_packed_kernel(
    aw_ref, bw_ref, alen_ref,
    best_ref, bi_ref, bj_ref, fi_ref, fj_ref,
    *, la_max: int, w: int, gO: int, gE: int, cm_tuple, wpr_b: int,
    ulen: int = 0,
):
    pblk = aw_ref.shape[1]
    cols = w + 1
    b_codes = jnp.concatenate(
        [
            _unpack_static(bw_ref, r)[None, :]
            if r < 16 * wpr_b
            else jnp.zeros((1, pblk), jnp.int32)
            for r in range(w)
        ],
        axis=0,
    )
    alen = alen_ref[0, :]
    planes = _sub_planes(b_codes, cm_tuple)  # hoisted out of the row loop
    xpk = _extract_bits(la_max, w, cm_tuple)

    if xpk is not None:
        cst = _p1_consts(cols, pblk, w, gE, xpk)
        gate_len = not (ulen and ulen == la_max)

        def body(i, carry):
            return _phase1_row_fast(
                carry, i, _unpack_dyn(aw_ref, i - 1), planes=planes,
                alen=alen, cst=cst, w=w, gO=gO, gE=gE, xpk=xpk,
                gate_len=gate_len,
            )

        *_, R, capA = jax.lax.fori_loop(
            1, la_max + 1, body, _phase1_init_fast(cols, w, pblk)
        )
        best, bi, bj, fst = _p1_final(R, capA, xpk)
    else:
        karr = jax.lax.broadcasted_iota(jnp.int32, (cols, pblk), 0)

        def body(i, carry):
            return _phase1_row_legacy(
                carry, i, _unpack_dyn(aw_ref, i - 1), planes=planes,
                alen=alen, karr=karr, la_max=la_max, w=w, gO=gO, gE=gE,
                cm_tuple=cm_tuple,
            )

        *_, best, bi, bj, fst = jax.lax.fori_loop(
            1, la_max + 1, body, _phase1_init_legacy(cols, pblk)
        )
    best_ref[0, :] = best
    bi_ref[0, :] = bi
    bj_ref[0, :] = bj
    fi_ref[0, :] = fst >> 16
    fj_ref[0, :] = fst & 0xFFFF


def _phase1_fused_scan(a_t, b_t, a_len, *, la_max, w, gO, gE, cm_tuple):
    """CPU/backstop path: the same row step under lax.scan (no Pallas)."""
    p = a_t.shape[1]
    cols = w + 1
    b_codes = b_t[0:w, :]
    planes = _sub_planes(b_codes, cm_tuple)
    xpk = _extract_bits(la_max, w, cm_tuple)
    rows_i = jnp.arange(1, la_max + 1, dtype=jnp.int32)

    if xpk is not None:
        cst = _p1_consts(cols, p, w, gE, xpk)

        def step(carry, xs):
            i, a_code = xs
            return _phase1_row_fast(
                carry, i, a_code, planes=planes, alen=a_len, cst=cst,
                w=w, gO=gO, gE=gE, xpk=xpk, gate_len=True,
            ), None

        (*_, R, capA), _ = jax.lax.scan(
            step, _phase1_init_fast(cols, w, p), (rows_i, a_t[:la_max])
        )
        best, bi, bj, fst = _p1_final(R, capA, xpk)
        return best, bi, bj, fst >> 16, fst & 0xFFFF

    karr = jax.lax.broadcasted_iota(jnp.int32, (cols, p), 0)

    def step(carry, xs):
        i, a_code = xs
        return _phase1_row_legacy(
            carry, i, a_code, planes=planes, alen=a_len, karr=karr,
            la_max=la_max, w=w, gO=gO, gE=gE, cm_tuple=cm_tuple,
        ), None

    (*_, best, bi, bj, fst), _ = jax.lax.scan(
        step, _phase1_init_legacy(cols, p), (rows_i, a_t[:la_max])
    )
    return best, bi, bj, fst >> 16, fst & 0xFFFF


# ---------------------------------------------------------------------------
# Phase 2 — rotated-band dovetail DP from the phase-1 anchor
# (src/BioLibs.scala:473-589).
# ---------------------------------------------------------------------------


def _p2_pack(la_max: int, w: int):
    """Static bit layout for the MERGED phase-2 aux chain: when
    (stop_u, stop_k, correct, error) all fit one non-negative int32
    ((u << sh_u) | (k << sh_k) | (corr << bits_c) | err), the stop-coord
    and count recurrences share ONE gated chain instead of two.  Returns
    (sh_u, sh_k, bits_c) or None (fall back to the dual-chain form for
    long-read shapes whose fields exceed 31 bits)."""
    bits_u = max(la_max.bit_length(), 1)
    bits_k = (w + 1).bit_length()
    bits_c = (la_max + w + 2).bit_length()
    if bits_u + bits_k + 2 * bits_c <= 31:
        return (bits_k + 2 * bits_c, 2 * bits_c, bits_c)
    return None


def _p2_consts(cols: int, pblk: int, w: int, gE: int, pack, xpk):
    """Loop-invariant constants for the fast phase-2 row."""
    sh_u, sh_k, bits_c = pack
    ubits, kbits = xpk
    karr = jax.lax.broadcasted_iota(jnp.int32, (cols, pblk), 0)
    k1 = jax.lax.broadcasted_iota(jnp.int32, (w, pblk), 0) + 1
    km = (1 << (sh_u - sh_k)) - 1
    return dict(
        karr=karr,
        k1gE=k1 * gE,
        k21gE=(k1 + 1) * gE,
        not_w=karr != w,
        kshm=karr << sh_k,
        kshy=(karr + 1) << sh_k,
        # xbase for the X dead-left case, +1 for the X step's own error
        km1sh1=(((karr - 1) & km) << sh_k) + 1,
        wk=w - karr,
        UM=(1 << ubits) - 1,
        kcode=((1 << kbits) - 1) - karr,
    )


def _phase2_row_fast(
    carry, u, a_code, nxt_row, *, dlen, blen, cst, w, zero_row,
    gO, gE, cm_tuple, pack, xpk, jmask: bool,
):
    """One DP row of the rotated-band phase 2 — the round-5 low-op form.

    ``jmask`` statically selects whether the in-band (1 <= j <= blen)
    masks are applied; interior rows of uniform-length batches skip them
    (the masks are provably all-true there).  The (u <= dlen) part of the
    round-4 ``inb`` moved to the extraction gate: cells in rows beyond a
    lane's dove length may now hold garbage, but they only ever feed
    later rows of the same lane (also beyond dlen) and the extraction
    gate keeps them out of the running best — outputs are identical.
    The band window of B is carried and slid one row per step."""
    mp, xp, yp, sp, cont, R, capA, b_codes = carry
    sh_u, sh_k, bits_c = pack
    ubits, kbits = xpk
    pblk = a_code.shape[0]
    zrow1 = jnp.zeros((1, pblk), jnp.int32)
    sub = _sub_row(a_code, b_codes, cm_tuple, pblk)
    eq = a_code[None, :] == b_codes
    shift = lambda r: jnp.concatenate([r[1:], zrow1], axis=0)
    m_in = sub + _max3(mp, yp, jnp.maximum(xp, 0))
    y_in = gE + _max3(
        shift(mp) + gO, shift(yp), jnp.maximum(shift(xp) + gO, 0)
    )
    if jmask:
        j = cst["karr"] + (u - zero_row)
        jb_ok = (j >= 1) & (j <= blen[None, :])
        m_new = jnp.where(jb_ok, m_in, 0)
        y_new = jnp.where(jb_ok & cst["not_w"], y_in, 0)
        c = jnp.maximum(jnp.maximum(m_new[:-1], y_new[:-1]) + gO, 0)
        run = _band_cummax(jnp.where(jb_ok[1:], c - cst["k1gE"], _NEG), w)
        x_new = jnp.where(
            jb_ok, jnp.concatenate([zrow1, cst["k21gE"] + run], axis=0), 0
        )
    else:
        m_new = m_in
        y_new = jnp.where(cst["not_w"], y_in, 0)
        c = jnp.maximum(jnp.maximum(m_new[:-1], y_new[:-1]) + gO, 0)
        run = _band_cummax(c - cst["k1gE"], w)
        x_new = jnp.concatenate([zrow1, cst["k21gE"] + run], axis=0)
    mx = _max3(m_new, x_new, y_new)
    cont_new = (mx > 0).astype(jnp.int32)
    is_m = m_new == mx

    # M branch: pred = (u-1, k); Y branch: pred = (u-1, k+1)
    st = jnp.where(is_m, sp, shift(sp))
    ct = jnp.where(is_m, cont, shift(cont))
    cell = ((u - 1) << sh_u) + jnp.where(is_m, cst["kshm"], cst["kshy"])
    dctr = jnp.where(is_m & eq, 1 << bits_c, 1)  # match or error
    s0 = jnp.where(ct == 1, st, cell) + dctr

    # X branch: pred = (u, k-1).  The affine chain (+1 error per
    # traversed cell) becomes a CONSTANT sign-gated chain via the change
    # of variable out' = out + (w - k): gated steps carry out' unchanged
    # (out[k] = out[k-1] + 1 <=> out'[k] = out'[k-1]); one add before /
    # subtract after the chain restores the counts exactly.
    is_x = jnp.concatenate(
        [zrow1,
         ((x_new[1:] == mx[1:]) & (m_new[1:] != mx[1:])).astype(jnp.int32)],
        axis=0,
    )
    lc = jnp.concatenate([zrow1, cont_new[:-1]], axis=0)
    xbase1 = (u << sh_u) + cst["km1sh1"]
    V = jnp.where(is_x == 1, xbase1, s0)
    W = (V + cst["wk"]) | ((is_x * lc) << 31)
    s_new = _gated_chain_sign(W, w + 1) - cst["wk"]

    # running best: packed elementwise max + aux capture (decoded once
    # at kernel end); rows beyond the lane's dove length are gated out
    val = jnp.maximum(mx, 0)
    addv = ((cst["UM"] - u) << kbits) + cst["kcode"]
    P = (val << (ubits + kbits)) | addv
    P = jnp.where((u <= dlen)[None, :], P, 0)
    upd = P > R
    capA = jnp.where(upd, s_new, capA)
    R = jnp.where(upd, P, R)

    b_next = jnp.concatenate([b_codes[1:], nxt_row[None, :]], axis=0)
    return m_new, x_new, y_new, s_new, cont_new, R, capA, b_next


def _phase2_init_fast(cols, pblk, b0):
    zero = jnp.zeros((cols, pblk), jnp.int32)
    return zero, zero, zero, zero, zero, zero, zero, b0


def _p2_final(R, capA, xpk, pack):
    """Decode the packed running best into the legacy output tuple
    (best, bu, bk, uf, kf, corr, err)."""
    ubits, kbits = xpk
    UM, KM = (1 << ubits) - 1, (1 << kbits) - 1
    rb = jnp.max(R, axis=0)
    sel = R == rb[None, :]
    cap = jnp.max(jnp.where(sel, capA, 0), axis=0)
    best = rb >> (ubits + kbits)
    pos = best > 0
    z = jnp.zeros_like(best)
    bu = jnp.where(pos, UM - ((rb >> kbits) & UM), z)
    bk = jnp.where(pos, KM - (rb & KM), z)
    fst = jnp.where(pos, cap, z)
    uf, kf, corr, err = _p2_decode(fst, None, pack)
    return best, bu, bk, uf, kf, corr, err


def _phase2_row_legacy(
    carry, u, a_code, nxt_row, *, dlen, blen, karr, la_max, w, zero_row,
    gO, gE, cm_tuple, pack,
):
    """Round-4 row step, kept verbatim for long-read shapes.  ``pack``
    selects the aux encoding: None -> dual chains (st packs u<<16|k, ct
    packs correct<<16|error); (sh_u, sh_k, bits_c) -> ONE merged chain
    carrying all four fields."""
    if pack is None:
        mp, xp, yp, sp, cp, cont, best, bu, bk, fst, fct, b_codes = carry
    else:
        sh_u, sh_k, bits_c = pack
        mp, xp, yp, sp, cont, best, bu, bk, fst, b_codes = carry
    pblk = a_code.shape[0]
    cols = w + 1
    sub = _sub_row(a_code, b_codes, cm_tuple, pblk)
    eq = a_code[None, :] == b_codes
    j = karr - zero_row + u
    inb = (u <= dlen)[None, :] & (j >= 1) & (j <= blen[None, :])
    m_new = jnp.where(inb, sub + _max3(mp, yp, jnp.maximum(xp, 0)), 0)
    zrow1 = jnp.zeros((1, pblk), jnp.int32)
    shift = lambda r: jnp.concatenate([r[1:], zrow1], axis=0)
    y_new = jnp.where(
        inb & (karr != w),
        gE + _max3(shift(mp) + gO, shift(yp), jnp.maximum(shift(xp) + gO, 0)),
        0,
    )
    c = _max3(m_new[:-1] + gO, y_new[:-1] + gO, jnp.zeros((w, pblk), jnp.int32))
    k1 = jax.lax.broadcasted_iota(jnp.int32, (w, pblk), 0) + 1
    run = _band_cummax(jnp.where(inb[1:], c - k1 * gE, -(2**30)), w)
    x_band = (k1 + 1) * gE + run
    x_new = jnp.concatenate([zrow1, x_band], axis=0)
    x_new = jnp.where(inb & (karr != 0), x_new, 0)

    br, mx = _branch(m_new, x_new, y_new)
    cont_i = cont  # row u-1 liveness, carried from its own mx
    is_m = br == 0

    # M branch: pred = (u-1, k); Y branch: pred = (u-1, k+1)
    sel_cont = jnp.where(is_m, cont_i, shift(cont_i)) == 1
    is_x = jnp.concatenate(
        [zrow1, (br[1:] == 1).astype(jnp.int32)], axis=0
    )
    lc = jnp.concatenate([zrow1, (mx[:-1] > 0).astype(jnp.int32)], axis=0)
    ax = is_x * lc

    if pack is None:
        um1 = (u - 1) << 16
        sel_st = jnp.where(is_m, sp, shift(sp))
        sel_cell = jnp.where(is_m, um1 | karr, um1 | (karr + 1))
        sel_ct = jnp.where(is_m, cp, shift(cp))
        dctr = jnp.where(is_m & eq, 1 << 16, 1)  # match or error, packed
        s0 = jnp.where(sel_cont, sel_st, sel_cell)
        c0 = jnp.where(sel_cont, sel_ct, 0) + dctr

        u16 = u << 16
        xbase = u16 | ((karr - 1) & 0xFFFF)
        vs = jnp.where(is_x == 1, jnp.where(lc == 1, 0, xbase), s0)
        vc = jnp.where(is_x == 1, 1, c0)  # X without left-cont: 0 + 1 step
        s_new = _gated_chain(ax, vs)
        c_new = _gated_chain_affine(ax, vc, ax)
    else:
        um1 = (u - 1) << sh_u
        sel_st = jnp.where(is_m, sp, shift(sp))
        sel_cell = jnp.where(
            is_m, um1 | (karr << sh_k), um1 | ((karr + 1) << sh_k)
        )
        dctr = jnp.where(is_m & eq, 1 << bits_c, 1)  # match or error
        s0 = jnp.where(sel_cont, sel_st, sel_cell) + dctr
        km = (1 << (sh_u - sh_k)) - 1
        xbase = (u << sh_u) | (((karr - 1) & km) << sh_k)
        vs = jnp.where(is_x == 1, jnp.where(lc == 1, 0, xbase) + 1, s0)
        s_new = _gated_chain_affine(ax, vs, ax)

    rb = jnp.max(mx, axis=0)
    kb = jnp.min(jnp.where(mx == rb[None, :], karr, la_max + w + 2), axis=0)
    sel = karr == kb[None, :]
    upd = rb > best
    best = jnp.where(upd, rb, best)
    bu = jnp.where(upd, u, bu)
    bk = jnp.where(upd, kb, bk)
    fst = jnp.where(upd, jnp.max(jnp.where(sel, s_new, 0), axis=0), fst)

    # slide the band window down one row of b_pad
    b_next = jnp.concatenate([b_codes[1:], nxt_row[None, :]], axis=0)
    cont_new = (mx > 0).astype(jnp.int32)
    if pack is None:
        fct = jnp.where(upd, jnp.max(jnp.where(sel, c_new, 0), axis=0), fct)
        return (m_new, x_new, y_new, s_new, c_new, cont_new, best, bu, bk,
                fst, fct, b_next)
    return m_new, x_new, y_new, s_new, cont_new, best, bu, bk, fst, b_next


def _p2_decode(fst, fct, pack):
    """(uf, kf, corr, err) from the captured aux state(s)."""
    if pack is None:
        return fst >> 16, fst & 0xFFFF, fct >> 16, fct & 0xFFFF
    sh_u, sh_k, bits_c = pack
    mc = (1 << bits_c) - 1
    mk = (1 << (sh_u - sh_k)) - 1
    return (
        fst >> sh_u, (fst >> sh_k) & mk, (fst >> bits_c) & mc, fst & mc
    )


def _phase2_init_legacy(cols, pblk, b0, pack):
    zero = jnp.zeros((cols, pblk), jnp.int32)
    z = jnp.zeros((pblk,), jnp.int32)
    if pack is None:
        return zero, zero, zero, zero, zero, zero, z, z, z, z, z, b0
    return zero, zero, zero, zero, zero, z, z, z, z, b0


def _phase2_packed_kernel(
    aw_ref, bw_ref, ds_ref, dlen_ref, blen_ref,
    best_ref, bu_ref, bk_ref, uf_ref, kf_ref, c_ref, e_ref,
    sw_ref,
    *, la_max: int, w: int, zero_row: int, gO: int, gE: int, cm_tuple,
    wpr: int, wpr_b: int, ulen: int = 0,
):
    """Phase 2 on packed words: the dove shift happens HERE (word
    rotation + per-lane bit shift into VMEM scratch, once per pair), and
    both operands unpack row-by-row — no [la_max, P] shifted-code plane
    or [la_max + w + 1, P] padded-B plane ever exists.  With a static
    uniform read length (``ulen``) the row loop splits into masked-head /
    unmasked-interior / masked-tail fori_loops."""
    pblk = aw_ref.shape[1]
    cols = w + 1
    dlen = dlen_ref[0, :]
    blen = blen_ref[0, :]
    pack = _p2_pack(la_max, w)
    xpk = _extract_bits(la_max, w, cm_tuple)
    sw_ref[:, :] = _shift_words(aw_ref[:, :], ds_ref[0, :], wpr)

    # band window for u = 1: window row r holds B code (r - zero_row)
    b0 = jnp.concatenate(
        [
            _unpack_static(bw_ref, r - zero_row)[None, :]
            if 0 <= r - zero_row < 16 * wpr_b
            else jnp.zeros((1, pblk), jnp.int32)
            for r in range(cols)
        ],
        axis=0,
    )

    def _nxt(u):
        jb = u + cols - zero_row - 1  # B code index entering the window
        brow = bw_ref[pl.ds(jnp.clip(jb >> 4, 0, wpr_b - 1), 1), :]
        return jnp.where(jb < 16 * wpr_b, (brow[0] >> (2 * (jb & 15))) & 3, 0)

    if pack is not None and xpk is not None:
        cst = _p2_consts(cols, pblk, w, gE, pack, xpk)

        def mk_body(jmask):
            def body(u, carry):
                return _phase2_row_fast(
                    carry, u, _unpack_dyn(sw_ref, u - 1), _nxt(u),
                    dlen=dlen, blen=blen, cst=cst, w=w, zero_row=zero_row,
                    gO=gO, gE=gE, cm_tuple=cm_tuple, pack=pack, xpk=xpk,
                    jmask=jmask,
                )
            return body

        init = _phase2_init_fast(cols, pblk, b0)
        if ulen:
            # interior rows have 1 <= j <= blen for the whole band:
            # u in [zero_row + 1, ulen - w + zero_row]
            h_end = min(zero_row + 1, la_max + 1)
            t_start = max(h_end, min(la_max + 1, ulen - w + zero_row + 1))
            carry = jax.lax.fori_loop(1, h_end, mk_body(True), init)
            carry = jax.lax.fori_loop(h_end, t_start, mk_body(False), carry)
            carry = jax.lax.fori_loop(
                t_start, la_max + 1, mk_body(True), carry
            )
        else:
            carry = jax.lax.fori_loop(1, la_max + 1, mk_body(True), init)
        best, bu, bk, uf, kf, corr, err = _p2_final(
            carry[5], carry[6], xpk, pack
        )
    else:
        karr = jax.lax.broadcasted_iota(jnp.int32, (cols, pblk), 0)

        def body(u, carry):
            return _phase2_row_legacy(
                carry, u, _unpack_dyn(sw_ref, u - 1), _nxt(u),
                dlen=dlen, blen=blen, karr=karr, la_max=la_max, w=w,
                zero_row=zero_row, gO=gO, gE=gE, cm_tuple=cm_tuple,
                pack=pack,
            )

        out = jax.lax.fori_loop(
            1, la_max + 1, body, _phase2_init_legacy(cols, pblk, b0, pack)
        )
        if pack is None:
            *_, best, bu, bk, fst, fct, _b = out
        else:
            *_, best, bu, bk, fst, _b = out
            fct = None
        uf, kf, corr, err = _p2_decode(fst, fct, pack)
    best_ref[0, :] = best
    bu_ref[0, :] = bu
    bk_ref[0, :] = bk
    uf_ref[0, :] = uf
    kf_ref[0, :] = kf
    c_ref[0, :] = corr
    e_ref[0, :] = err


def _phase2_fused_scan(
    a_shift, b_pad, dove_len, b_len, *, la_max, w, zero_row, gO, gE, cm_tuple
):
    p = a_shift.shape[1]
    cols = w + 1
    pack = _p2_pack(la_max, w)
    xpk = _extract_bits(la_max, w, cm_tuple)
    npad = b_pad.shape[0]
    b0 = b_pad[1 : cols + 1, :]
    # next window rows for u = 1..la_max: b_pad[min(u + cols, npad - 1)]
    tail = jnp.broadcast_to(
        b_pad[npad - 1][None, :], (max(la_max + 1 + cols - npad, 0), p)
    )
    nxt_rows = jnp.concatenate([b_pad[cols + 1 :], tail], axis=0)[:la_max]
    rows_u = jnp.arange(1, la_max + 1, dtype=jnp.int32)

    if pack is not None and xpk is not None:
        cst = _p2_consts(cols, p, w, gE, pack, xpk)

        def step(carry, xs):
            u, a_code, nxt = xs
            return _phase2_row_fast(
                carry, u, a_code, nxt, dlen=dove_len, blen=b_len, cst=cst,
                w=w, zero_row=zero_row, gO=gO, gE=gE, cm_tuple=cm_tuple,
                pack=pack, xpk=xpk, jmask=True,
            ), None

        carry, _ = jax.lax.scan(
            step, _phase2_init_fast(cols, p, b0),
            (rows_u, a_shift[:la_max], nxt_rows),
        )
        return _p2_final(carry[5], carry[6], xpk, pack)

    karr = jax.lax.broadcasted_iota(jnp.int32, (cols, p), 0)

    def step(carry, xs):
        u, a_code, nxt = xs
        return _phase2_row_legacy(
            carry, u, a_code, nxt, dlen=dove_len, blen=b_len, karr=karr,
            la_max=la_max, w=w, zero_row=zero_row, gO=gO, gE=gE,
            cm_tuple=cm_tuple, pack=pack,
        ), None

    out, _ = jax.lax.scan(
        step, _phase2_init_legacy(cols, p, b0, pack),
        (rows_u, a_shift[:la_max], nxt_rows),
    )
    if pack is None:
        *_, best, bu, bk, fst, fct, _b = out
    else:
        *_, best, bu, bk, fst, _b = out
        fct = None
    uf, kf, corr, err = _p2_decode(fst, fct, pack)
    return best, bu, bk, uf, kf, corr, err


def _vec_spec(pblk):
    return pl.BlockSpec((1, pblk), lambda i: (0, i))


def _vec_shape(p):
    return jax.ShapeDtypeStruct((1, p), jnp.int32)


def phase1_fused(a_t, b_t, a_len, *, la_max, w, gO, gE, cm_tuple, pblk=256):
    """Code-plane phase 1 (lax.scan) — the non-TPU semantic backstop; the
    TPU path runs the packed-word Pallas kernel (phase1_fused_packed)."""
    return _phase1_fused_scan(
        a_t, b_t, a_len, la_max=la_max, w=w, gO=gO, gE=gE,
        cm_tuple=cm_tuple,
    )


def phase2_fused(
    a_shift, b_pad, dove_len, b_len, *,
    la_max, w, zero_row, gO, gE, cm_tuple, pblk=256,
):
    """Code-plane phase 2 (lax.scan) — the non-TPU semantic backstop."""
    return _phase2_fused_scan(
        a_shift, b_pad, dove_len, b_len, la_max=la_max, w=w,
        zero_row=zero_row, gO=gO, gE=gE, cm_tuple=cm_tuple,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "la_max", "w", "gO", "gE", "cm_tuple", "pblk", "interpret", "ulen",
    ),
)
def phase1_fused_packed(
    aw_t, bw_t, a_len, *, la_max, w, gO, gE, cm_tuple, pblk=256,
    interpret=False, ulen=0,
):
    """Phase 1 from packed words ([wpr, P] int32 per operand, wpr =
    ceil(L/16)): operands unpack row-by-row inside the kernel, so the
    [la_max, P] code planes (and their 26M-element gathers per chunk)
    never exist.  ``interpret=True`` runs the SAME kernel under the Pallas
    interpreter so CPU CI covers the TPU kernel code.  ``ulen`` (static)
    marks every lane as spanning the full la_max rows (uniform-length
    batches), dropping the per-row length gate."""
    p = aw_t.shape[1]
    # a pblk > p would launch a zero-size grid and return uninitialized
    # buffers — callers clamp (models/overlapper.py), this fails loudly
    assert p >= pblk and p % pblk == 0, (p, pblk)
    wpr, wpr_b = aw_t.shape[0], bw_t.shape[0]
    kernel = functools.partial(
        _phase1_packed_kernel, la_max=la_max, w=w, gO=gO, gE=gE,
        cm_tuple=cm_tuple, wpr_b=wpr_b, ulen=ulen,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(p // pblk,),
        in_specs=[
            pl.BlockSpec((wpr, pblk), lambda i: (0, i)),
            pl.BlockSpec((wpr_b, pblk), lambda i: (0, i)),
            _vec_spec(pblk),
        ],
        out_specs=[_vec_spec(pblk)] * 5,
        out_shape=[_vec_shape(p)] * 5,
        interpret=interpret,
    )(aw_t, bw_t, a_len[None, :])
    return tuple(o[0] for o in outs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "la_max", "w", "zero_row", "gO", "gE", "cm_tuple", "pblk",
        "interpret", "ulen",
    ),
)
def phase2_fused_packed(
    aw_t, bw_t, dove_start, dove_len, b_len, *,
    la_max, w, zero_row, gO, gE, cm_tuple, pblk=256, interpret=False,
    ulen=0,
):
    """Phase 2 from packed words with the in-kernel dove shift."""
    p = aw_t.shape[1]
    assert p >= pblk and p % pblk == 0, (p, pblk)
    wpr, wpr_b = aw_t.shape[0], bw_t.shape[0]
    kernel = functools.partial(
        _phase2_packed_kernel, la_max=la_max, w=w, zero_row=zero_row,
        gO=gO, gE=gE, cm_tuple=cm_tuple, wpr=wpr, wpr_b=wpr_b, ulen=ulen,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(p // pblk,),
        in_specs=[
            pl.BlockSpec((wpr, pblk), lambda i: (0, i)),
            pl.BlockSpec((wpr_b, pblk), lambda i: (0, i)),
            _vec_spec(pblk),
            _vec_spec(pblk),
            _vec_spec(pblk),
        ],
        out_specs=[_vec_spec(pblk)] * 7,
        out_shape=[_vec_shape(p)] * 7,
        scratch_shapes=[pltpu.VMEM((wpr, pblk), jnp.int32)],
        interpret=interpret,
    )(
        aw_t, bw_t, dove_start[None, :], dove_len[None, :], b_len[None, :]
    )
    return tuple(o[0] for o in outs)


@jax.jit
def pack_reads_le(bases):
    """[N, L] int8 codes -> [N, ceil(L/16)] int32, base r in bits
    2*(r % 16) of word r // 16 (little-endian: shift-friendly layout for
    the per-pair dove shift; distinct from encode.pack_2bit's seqHash
    big-endian transport packing)."""
    n, l = bases.shape
    wpad = (-l) % 16
    b = jnp.pad(bases.astype(jnp.uint32), ((0, 0), (0, wpad))).reshape(
        n, -1, 16
    )
    sh = jnp.arange(16, dtype=jnp.uint32) * 2
    return jnp.sum(b << sh[None, None, :], axis=2).astype(jnp.int32)


def _dove_shift_packed(packed, a_idx, ds, la_max: int):
    """codes[r, p] = A[r + ds[p]] via word gathers + per-lane bit shifts.

    The naive formulation is a [la_max, P] element gather (26M random
    gathers per 262k-pair chunk, ~230 ms at the TPU's ~113M gathers/s);
    gathering the 2-bit-packed words instead needs 16x fewer gathers, and
    the sub-word shift is an elementwise variable-amount bit shift.
    Rows past the read's end decode as code 0 — those rows are beyond
    dove_len, so every cell they feed is out-of-band (dead)."""
    n, words = packed.shape
    bs = a_idx.shape[0]
    m = ds >> 4
    s = (2 * (ds & 15)).astype(jnp.uint32)[None, :]
    q = jnp.arange(words + 1, dtype=jnp.int32)[:, None]
    wq = m[None, :] + q
    in_rng = wq < words
    flat = packed.reshape(-1)
    w = flat[
        (a_idx[None, :] * words + jnp.minimum(wq, words - 1)).reshape(-1)
    ].reshape(words + 1, bs)
    w = jnp.where(in_rng, w, 0).astype(jnp.uint32)
    lo = w[:-1] >> s
    hi = (w[1:] << (jnp.uint32(31) - s)) << jnp.uint32(1)  # avoids shift-by-32
    ow = jnp.where(s == 0, w[:-1], lo | hi)  # [words, bs]
    rep = jnp.repeat(ow, 16, axis=0)[:la_max]
    sh = (2 * (jnp.arange(la_max) % 16)).astype(jnp.uint32)[:, None]
    return ((rep >> sh) & 3).astype(jnp.int32)


def _fused_core(
    a_t, b_t, a_len, b_len, shift_fn, *,
    cm_tuple, gO, gE, min_identity, min_overlap, max_ignore,
    la_max: int, lb_max: int, width: int, pblk: int,
):
    """Code-plane body of the fused dovetail (non-TPU backends): phase 1,
    dove anchor, phase 2, validity.  ``shift_fn(dove_start) ->
    [la_max, P]`` provides the dove-shifted A codes."""
    p = a_t.shape[1]
    w = width
    zero_row = w // 2

    p1 = phase1_fused(
        a_t, b_t, a_len, la_max=la_max, w=w, gO=gO, gE=gE,
        cm_tuple=cm_tuple, pblk=pblk,
    )

    def run_phase2(dove_start, dove_len):
        # dove-shifted A; B padded so row (u+k) of the carried band
        # window is B[k - zero_row + u - 1]
        a_shift = shift_fn(dove_start)
        pad_top = zero_row + 1
        pad_bot = max(la_max + w + 1 - pad_top - lb_max, 0)
        b_pad = jnp.concatenate(
            [
                jnp.zeros((pad_top, p), jnp.int32),
                b_t,
                jnp.zeros((pad_bot, p), jnp.int32),
            ],
            axis=0,
        )
        return phase2_fused(
            a_shift, b_pad, dove_len, b_len,
            la_max=la_max, w=w, zero_row=zero_row, gO=gO, gE=gE,
            cm_tuple=cm_tuple, pblk=pblk,
        )

    return _dovetail_glue(
        p1, run_phase2, a_len, b_len, width=w,
        min_identity=min_identity, min_overlap=min_overlap,
        max_ignore=max_ignore,
    )


def _fused_core_packed(
    aw_t, bw_t, a_len, b_len, *,
    cm_tuple, gO, gE, min_identity, min_overlap, max_ignore,
    la_max: int, lb_max: int, width: int, pblk: int, interpret: bool = False,
):
    """Packed-word body of the fused dovetail (the TPU path): operands
    are [wpr, P] int32 word planes; both phases and the dove shift run
    inside the Pallas kernels.  ``interpret=True`` runs the kernels under
    the Pallas interpreter (CPU CI parity coverage of the TPU path)."""
    w = width
    p1 = phase1_fused_packed(
        aw_t, bw_t, a_len, la_max=la_max, w=w, gO=gO, gE=gE,
        cm_tuple=cm_tuple, pblk=pblk, interpret=interpret,
    )

    def run_phase2(dove_start, dove_len):
        return phase2_fused_packed(
            aw_t, bw_t, dove_start, dove_len, b_len,
            la_max=la_max, w=w, zero_row=w // 2, gO=gO, gE=gE,
            cm_tuple=cm_tuple, pblk=pblk, interpret=interpret,
        )

    return _dovetail_glue(
        p1, run_phase2, a_len, b_len, width=w,
        min_identity=min_identity, min_overlap=min_overlap,
        max_ignore=max_ignore,
    )


def _dovetail_glue(
    p1, run_phase2, a_len, b_len, *,
    width: int, min_identity, min_overlap, max_ignore,
):
    """Phase-1 -> dove anchor -> phase-2 -> reference validity, shared by
    the code-plane and packed-word cores (validity semantics:
    src/ObjectStore.scala:102-141)."""
    w = width
    zero_row = w // 2
    best1, bi, bj, fi_c, fj_c = p1
    dud_short = b_len < w  # reference would index past B (BioLibs.scala:418)
    act1 = (best1 > 0) & ~dud_short
    # inactive pairs keep the best-cell coords (lax-path traceback parity)
    fi = jnp.where(act1, fi_c, bi)
    fj = jnp.where(act1, fj_c, bj)
    dud = ~act1 | (fj != 0)
    dove_start = fi
    dove_len = a_len - dove_start

    best2, bu, bk, uf_c, kf_c, corr_c, err_c = run_phase2(dove_start, dove_len)
    act2 = (best2 > 0) & ~dud
    uf = jnp.where(act2, uf_c, bu)
    kf = jnp.where(act2, kf_c, bk)
    z = jnp.zeros_like(uf)
    corr = jnp.where(act2, corr_c, z)
    err = jnp.where(act2, err_c, z)
    steps = corr + err  # each backtrack step is exactly one match or error

    dud_all = dud | (best2 <= 0)
    start_i = uf + dove_start
    start_j = kf - zero_row + uf
    end_i = bu + dove_start
    end_j = bk - zero_row + bu

    tot = (corr + err).astype(jnp.float32)
    err_ratio = corr.astype(jnp.float32) / tot
    ident_ok = err_ratio >= min_identity
    len_ok = steps >= min_overlap
    dovetail = ((start_i == 0) & (b_len == end_j)) | (
        (start_j == 0) & (a_len == end_i)
    )
    ahg = start_i - start_j
    bhg = b_len - a_len + ahg
    hang_ok = (jnp.abs(ahg) < max_ignore) & (jnp.abs(bhg) < max_ignore)
    valid = ~dud_all & (tot > 0) & ident_ok & len_ok & dovetail & hang_ok
    return dict(
        start_i=start_i, start_j=start_j, end_i=end_i, end_j=end_j,
        correct=corr, error=err, align_len=steps, dud=dud_all,
        valid=valid, ahg=ahg, bhg=bhg,
        align_valid=~dud_all & (tot > 0) & ident_ok & len_ok & dovetail,
    )


@functools.partial(
    jax.jit,
    static_argnames=("la_max", "lb_max", "width", "cm_tuple", "gO", "gE", "pblk"),
)
def fast_dovetail_batch_fused(
    a_bases, a_len, b_bases, b_len, *,
    cm_tuple, gO, gE, min_identity, min_overlap, max_ignore,
    la_max: int, lb_max: int, width: int, pblk: int = 256,
):
    """Two-phase banded dovetail alignment, fully fused (no traceback).

    The production banded-dovetail aligner (replaced the direction-code
    + step-locked-traceback formulation) — same
    outputs, same reference semantics (src/BioLibs.scala:373-591,
    validity src/ObjectStore.scala:102-141)."""
    p = a_bases.shape[0]
    kw = dict(
        cm_tuple=cm_tuple, gO=gO, gE=gE, min_identity=min_identity,
        min_overlap=min_overlap, max_ignore=max_ignore,
        la_max=la_max, lb_max=lb_max, width=width, pblk=pblk,
    )
    if not _interpret():  # TPU: packed-word Pallas kernels
        aw_t = pack_reads_le(a_bases).T
        bw_t = pack_reads_le(b_bases).T
        return _fused_core_packed(
            aw_t, bw_t, a_len, b_len, interpret=kernel_interpret(), **kw
        )

    a_t = a_bases.astype(jnp.int32).T
    b_t = b_bases.astype(jnp.int32).T

    def shift_flat(dove_start):
        rows = jnp.arange(la_max, dtype=jnp.int32)[:, None]
        lanes = jnp.arange(p, dtype=jnp.int32)[None, :]
        idx = jnp.clip(rows + dove_start[None, :], 0, la_max - 1) * p + lanes
        return a_t.reshape(-1)[idx.reshape(-1)].reshape(la_max, p)

    return _fused_core(a_t, b_t, a_len, b_len, shift_flat, **kw)
