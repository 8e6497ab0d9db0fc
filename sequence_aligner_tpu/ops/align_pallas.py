"""Pallas TPU kernels for the banded dovetail DP fill.

The XLA scan formulation (ops/align_lax.py) pays per-op dispatch overhead
on every DP row (~2 ms/row regardless of batch width); these kernels put
the whole row loop INSIDE one Mosaic kernel so a row costs a handful of
VPU instructions.  Layout follows the lax version: band on sublanes, pair
batch on lanes, direction codes (branch bits + continue bit + match bit)
emitted per cell for the step-locked XLA traceback.

Kernel 1 (phase 1, src/BioLibs.scala:399-459): banded SW of A vs B[0:w].
Kernel 2 (phase 2, :495-534): rotated-coordinate band DP; the caller
pre-shifts A by each pair's dove_start and pre-pads B so every in-kernel
read is a contiguous row slice (no per-lane gathers).

The cost matrix is baked into the kernel as 16 scalar constants
(static per AlignSettings), so substitution scoring is a compare/select
chain — no table gathers.

Traceback codes: bits 0-1 branch (0=M 1=X 2=Y, M->X->Y preference),
bit 2 max>0 (continue), bit 3 chars-equal (for match/error counting).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -(2**30)  # python int: jnp scalars become captured consts in pallas kernels


def _sub_scores(idx, cm_tuple):
    """Substitution scores via a compare/select chain over the 16 baked
    cost constants; idx = a_code*4 + b_code in [0, 16)."""
    out = jnp.full(idx.shape, jnp.int32(cm_tuple[0]))
    for v in range(1, 16):
        out = jnp.where(idx == v, jnp.int32(cm_tuple[v]), out)
    return out


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


def _max3(a, b, c):
    return jnp.maximum(a, jnp.maximum(b, c))


def _dir_code(mv, xv, yv, eq8):
    """eq8: int32 tensor, 8 where the chars match else 0 (kept integer —
    Mosaic rejects i1 vector bitcasts that bool concats can trigger)."""
    mx = _max3(mv, xv, yv)
    branch = jnp.where(mv == mx, 0, jnp.where(xv == mx, 1, 2))
    return branch | jnp.where(mx > 0, 4, 0) | eq8


def _phase1_kernel(
    a_ref, b_ref, alen_ref, dirs_ref, best_ref, bi_ref, bj_ref,
    mp, xp, yp,
    *, la_max: int, w: int, gO: int, gE: int, cm_tuple,
):
    pblk = a_ref.shape[1]
    cols = w + 1
    mp[:] = jnp.zeros((cols, pblk), jnp.int32)
    xp[:] = jnp.zeros((cols, pblk), jnp.int32)
    yp[:] = jnp.zeros((cols, pblk), jnp.int32)
    # dirs_ref is rank-3 [la_max+1, cols, pblk]: the DP row index lives on
    # the untiled leading dim so the per-row dynamic store needs no
    # sublane alignment proof (Mosaic rejects pl.ds(i*cols) when cols % 8)
    dirs_ref[0] = jnp.zeros((cols, pblk), jnp.int32)
    b_codes = b_ref[0:w, :]  # [w, P]
    alen = alen_ref[0, :]

    def body(i, carry):
        best, bi, bj = carry
        a_code = a_ref[i - 1, :]  # [P]
        idx = a_code[None, :] * 4 + b_codes
        sub = _sub_scores(idx, cm_tuple)
        eq8 = jnp.where(a_code[None, :] == b_codes, 8, 0)
        m_p, x_p, y_p = mp[:], xp[:], yp[:]
        zero = jnp.zeros((1, pblk), jnp.int32)
        m_new = jnp.concatenate(
            [zero, sub + _max3(m_p[:-1], y_p[:-1], jnp.maximum(x_p[:-1], 0))],
            axis=0,
        )
        y_new = jnp.concatenate(
            [zero, gE + _max3(m_p[1:] + gO, y_p[1:], jnp.maximum(x_p[1:] + gO, 0))],
            axis=0,
        )
        c = _max3(m_new[:-1] + gO, y_new[:-1] + gO, jnp.zeros((w, pblk), jnp.int32))
        karr = jax.lax.broadcasted_iota(jnp.int32, (w, pblk), 0) + 1
        v = c - karr * gE
        run = _band_cummax(v, w)
        x_new = jnp.concatenate([zero, (karr + 1) * gE + run], axis=0)
        eq_full = jnp.concatenate([jnp.zeros((1, pblk), jnp.int32), eq8], axis=0)
        dirs_ref[i] = _dir_code(m_new, x_new, y_new, eq_full)
        row_t = _max3(m_new, x_new, y_new)[1:]
        rb = jnp.max(row_t, axis=0)
        kia = jax.lax.broadcasted_iota(jnp.int32, row_t.shape, 0)
        jb = jnp.min(jnp.where(row_t == rb[None, :], kia, la_max + w + 2), axis=0) + 1
        upd = (i <= alen) & (rb > best)
        best = jnp.where(upd, rb, best)
        bi = jnp.where(upd, i, bi)
        bj = jnp.where(upd, jb, bj)
        mp[:] = m_new
        xp[:] = x_new
        yp[:] = y_new
        return best, bi, bj

    z = jnp.zeros((pblk,), jnp.int32)
    best, bi, bj = jax.lax.fori_loop(1, la_max + 1, body, (z, z, z))
    best_ref[0, :] = best
    bi_ref[0, :] = bi
    bj_ref[0, :] = bj


def _phase2_kernel(
    a_ref, bwin_ref, dlen_ref, blen_ref, dirs_ref, best_ref, bu_ref, bk_ref,
    mp, xp, yp,
    *, la_max: int, w: int, zero_row: int, gO: int, gE: int, cm_tuple,
):
    """Rotated band DP.  a_ref is the dove-shifted A (row u holds
    A[u + dove_start - 1], zero-padded); bwin_ref is rank-3
    [la_max+1, cols, pblk] with bwin[u, k] = B[k - zero_row + u - 1]
    (caller pregathers the sliding window so the per-row load is a
    dynamic index on the untiled leading dim — Mosaic cannot prove
    sublane alignment for a pl.ds(u, cols) window load)."""
    pblk = a_ref.shape[1]
    cols = w + 1
    mp[:] = jnp.zeros((cols, pblk), jnp.int32)
    xp[:] = jnp.zeros((cols, pblk), jnp.int32)
    yp[:] = jnp.zeros((cols, pblk), jnp.int32)
    dirs_ref[0] = jnp.zeros((cols, pblk), jnp.int32)
    dlen = dlen_ref[0, :]
    blen = blen_ref[0, :]

    def body(u, carry):
        best, bu, bk = carry
        a_code = a_ref[u - 1, :]  # pre-shifted: A[u + ds - 1]
        b_codes = bwin_ref[u]  # [cols, pblk]: rows j-1 for k = 0..w
        idx = a_code[None, :] * 4 + b_codes
        sub = _sub_scores(idx, cm_tuple)
        eq8 = jnp.where(a_code[None, :] == b_codes, 8, 0)
        karr = jax.lax.broadcasted_iota(jnp.int32, (cols, pblk), 0)
        j = karr - zero_row + u
        inb = (u <= dlen)[None, :] & (j >= 1) & (j <= blen[None, :])
        m_p, x_p, y_p = mp[:], xp[:], yp[:]
        m_new = jnp.where(inb, sub + _max3(m_p, y_p, jnp.maximum(x_p, 0)), 0)
        zrow1 = jnp.zeros((1, pblk), jnp.int32)
        shift = lambda r: jnp.concatenate([r[1:], zrow1], axis=0)
        y_new = jnp.where(
            inb & (karr != w),
            gE + _max3(shift(m_p) + gO, shift(y_p), jnp.maximum(shift(x_p) + gO, 0)),
            0,
        )
        c = _max3(m_new[:-1] + gO, y_new[:-1] + gO, jnp.zeros((w, pblk), jnp.int32))
        k1 = jax.lax.broadcasted_iota(jnp.int32, (w, pblk), 0) + 1
        v = jnp.where(inb[1:], c - k1 * gE, _NEG)
        run = _band_cummax(v, w)
        x_band = (k1 + 1) * gE + run
        x_new = jnp.concatenate([zrow1, x_band], axis=0)
        x_new = jnp.where(inb & (karr != 0), x_new, 0)
        dirs_ref[u] = _dir_code(m_new, x_new, y_new, eq8)
        row_t = _max3(m_new, x_new, y_new)
        rb = jnp.max(row_t, axis=0)
        kia = jax.lax.broadcasted_iota(jnp.int32, row_t.shape, 0)
        kb = jnp.min(jnp.where(row_t == rb[None, :], kia, la_max + w + 2), axis=0)
        upd = rb > best
        best = jnp.where(upd, rb, best)
        bu = jnp.where(upd, u, bu)
        bk = jnp.where(upd, kb, bk)
        mp[:] = m_new
        xp[:] = x_new
        yp[:] = y_new
        return best, bu, bk

    z = jnp.zeros((pblk,), jnp.int32)
    best, bu, bk = jax.lax.fori_loop(1, la_max + 1, body, (z, z, z))
    best_ref[0, :] = best
    bu_ref[0, :] = bu
    bk_ref[0, :] = bk


def _interpret() -> bool:
    import jax

    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit, static_argnames=("la_max", "w", "gO", "gE", "cm_tuple", "pblk")
)
def phase1_fill_pallas(a_t, b_t, a_len, *, la_max, w, gO, gE, cm_tuple, pblk=256):
    """a_t [la_max, P] int32, b_t [>=w, P], a_len [P].
    Returns dirs [(la_max+1)*(w+1), P], best/bi/bj [P]."""
    p = a_t.shape[1]
    cols = w + 1
    grid = (p // pblk,)
    kernel = functools.partial(
        _phase1_kernel, la_max=la_max, w=w, gO=gO, gE=gE, cm_tuple=cm_tuple
    )
    dirs, best, bi, bj = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((la_max, pblk), lambda i: (0, i)),
            pl.BlockSpec((b_t.shape[0], pblk), lambda i: (0, i)),
            pl.BlockSpec((1, pblk), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((la_max + 1, cols, pblk), lambda i: (0, 0, i)),
            pl.BlockSpec((1, pblk), lambda i: (0, i)),
            pl.BlockSpec((1, pblk), lambda i: (0, i)),
            pl.BlockSpec((1, pblk), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((la_max + 1, cols, p), jnp.int32),
            jax.ShapeDtypeStruct((1, p), jnp.int32),
            jax.ShapeDtypeStruct((1, p), jnp.int32),
            jax.ShapeDtypeStruct((1, p), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((cols, pblk), jnp.int32),
            pltpu.VMEM((cols, pblk), jnp.int32),
            pltpu.VMEM((cols, pblk), jnp.int32),
        ],
        interpret=_interpret(),
    )(a_t, b_t, a_len[None, :])
    return dirs.reshape((la_max + 1) * cols, p), best[0], bi[0], bj[0]


@functools.partial(
    jax.jit,
    static_argnames=("la_max", "w", "zero_row", "gO", "gE", "cm_tuple", "pblk"),
)
def phase2_fill_pallas(
    a_shift, b_pad, dove_len, b_len, *,
    la_max, w, zero_row, gO, gE, cm_tuple, pblk=256,
):
    """a_shift [la_max, P] (row u-1 holds A[u+ds-1], clamped reads OK),
    b_pad [la_max + w + zero_row + 2, P] with row (k+u) = B[k-zr+u-1]."""
    p = a_shift.shape[1]
    cols = w + 1
    # pregather the per-row sliding windows: bwin[u, k] = b_pad[u + k]
    win_idx = (
        jnp.arange(la_max + 1, dtype=jnp.int32)[:, None]
        + jnp.arange(cols, dtype=jnp.int32)[None, :]
    )
    b_win = jnp.take(b_pad, win_idx.reshape(-1), axis=0).reshape(
        la_max + 1, cols, p
    )
    grid = (p // pblk,)
    kernel = functools.partial(
        _phase2_kernel, la_max=la_max, w=w, zero_row=zero_row,
        gO=gO, gE=gE, cm_tuple=cm_tuple,
    )
    dirs, best, bu, bk = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((la_max, pblk), lambda i: (0, i)),
            pl.BlockSpec((la_max + 1, cols, pblk), lambda i: (0, 0, i)),
            pl.BlockSpec((1, pblk), lambda i: (0, i)),
            pl.BlockSpec((1, pblk), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((la_max + 1, cols, pblk), lambda i: (0, 0, i)),
            pl.BlockSpec((1, pblk), lambda i: (0, i)),
            pl.BlockSpec((1, pblk), lambda i: (0, i)),
            pl.BlockSpec((1, pblk), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((la_max + 1, cols, p), jnp.int32),
            jax.ShapeDtypeStruct((1, p), jnp.int32),
            jax.ShapeDtypeStruct((1, p), jnp.int32),
            jax.ShapeDtypeStruct((1, p), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((cols, pblk), jnp.int32),
            pltpu.VMEM((cols, pblk), jnp.int32),
            pltpu.VMEM((cols, pblk), jnp.int32),
        ],
        interpret=_interpret(),
    )(a_shift, b_win, dove_len[None, :], b_len[None, :])
    return dirs.reshape((la_max + 1) * cols, p), best[0], bu[0], bk[0]


@functools.partial(
    jax.jit,
    static_argnames=("la_max", "lb_max", "width", "cm_tuple", "gO", "gE", "pblk"),
)
def fast_dovetail_batch_pallas_idx(
    bases, lengths, a_idx, b_idx, *,
    cm_tuple, gO, gE, min_identity, min_overlap, max_ignore,
    la_max: int, lb_max: int, width: int, pblk: int = 256,
):
    """Device-resident variant: reads stay on device ([N, L] uploaded once
    per run); per-pair operands are row-gathered on device from int32
    pair-index vectors — avoiding the per-batch host gather + transfer of
    [P, L] base arrays (expensive over a remote-device tunnel).  Returns
    the OUT_KEYS-stacked [10, P] int32 result (one fetch per batch)."""
    from sequence_aligner_tpu.ops.align_lax import stack_result

    return stack_result(fast_dovetail_batch_pallas(
        bases[a_idx], lengths[a_idx], bases[b_idx], lengths[b_idx],
        cm_tuple=cm_tuple, gO=gO, gE=gE, min_identity=min_identity,
        min_overlap=min_overlap, max_ignore=max_ignore,
        la_max=la_max, lb_max=lb_max, width=width, pblk=pblk,
    ))


@functools.partial(
    jax.jit,
    static_argnames=("la_max", "lb_max", "width", "cm_tuple", "gO", "gE", "pblk"),
)
def fast_dovetail_batch_pallas(
    a_bases, a_len, b_bases, b_len, *,
    cm_tuple, gO, gE, min_identity, min_overlap, max_ignore,
    la_max: int, lb_max: int, width: int, pblk: int = 256,
):
    """Two-phase banded dovetail alignment with Pallas fills.

    Drop-in equivalent of ops.align_lax.fast_dovetail_batch (same outputs,
    same semantics) with the DP row loops inside Mosaic kernels; the
    tracebacks stay step-locked XLA scans over the emitted direction
    codes (match bit included, so no char gathers).
    """
    from sequence_aligner_tpu.ops.align_lax import _traceback

    p = a_bases.shape[0]
    w = width
    cols = w + 1
    gOj = jnp.int32(gO)
    gEj = jnp.int32(gE)
    a_t = a_bases.astype(jnp.int32).T  # [la_max, P]
    b_t = b_bases.astype(jnp.int32).T

    dud_short = b_len < w

    # ---- phase 1 ----
    dirs1, best1, bi, bj = phase1_fill_pallas(
        a_t, b_t, a_len, la_max=la_max, w=w, gO=gO, gE=gE,
        cm_tuple=cm_tuple, pblk=pblk,
    )
    act1 = (best1 > 0) & ~dud_short
    fi, fj, _, _, _ = _traceback(
        dirs1, cols, bi, bj, act1, la_max + w + 2,
        moves={0: (-1, -1), 1: (0, -1), 2: (-1, 0)},
    )
    dud = ~act1 | (fj != 0)
    dove_start = fi
    dove_len = a_len - dove_start
    zero_row = w // 2

    # ---- phase 2 inputs: dove-shifted A, zero_row-padded B ----
    # per-pair dove shift as a flat 1-D gather (2-D take_along_axis lane
    # gathers cost ~100x more on TPU)
    rows = jnp.arange(la_max, dtype=jnp.int32)[:, None]
    lanes = jnp.arange(p, dtype=jnp.int32)[None, :]
    sh_idx = jnp.clip(rows + dove_start[None, :], 0, la_max - 1) * p + lanes
    a_shift = a_t.reshape(-1)[sh_idx.reshape(-1)].reshape(la_max, p)
    # row u-1 holds A[u + ds - 1]
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
    dirs2, best2, bu, bk = phase2_fill_pallas(
        a_shift, b_pad, dove_len, b_len,
        la_max=la_max, w=w, zero_row=zero_row, gO=gO, gE=gE,
        cm_tuple=cm_tuple, pblk=pblk,
    )

    act2 = (best2 > 0) & ~dud
    uf, kf, corr, err, steps = _traceback(
        dirs2, cols, bu, bk, act2, la_max + w + 2,
        moves={0: (-1, 0), 1: (0, -1), 2: (-1, 1)},
        count_from_code=True,
    )

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
