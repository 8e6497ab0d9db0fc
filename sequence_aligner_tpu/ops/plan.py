"""Host-side capacity planning for the device pair-generation stage.

Computes exact head x middle / tail x middle cross-product totals with
vectorized NumPy so the jitted pairgen program can be built with adequate
static capacities up front — device programs compile once per capacity
tier, so good planning avoids both overflow retries (recompiles) and
wasted HBM.
"""

from __future__ import annotations

import numpy as np

from sequence_aligner_tpu.core.settings import AlignSettings


def host_kmer_hashes(
    bases: np.ndarray, lengths: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized NumPy mirror of ops.kmer.kmer_scan.
    Returns (hash int32 [N, P], loc float32 [N, P], valid bool [N, P])."""
    n, l = bases.shape
    npos = max(l - k + 1, 0)
    if npos == 0 or k <= 0:
        return (
            np.zeros((n, 0), np.int32),
            np.zeros((n, 0), np.float32),
            np.zeros((n, 0), bool),
        )
    h = np.zeros((n, npos), dtype=np.int32)
    b32 = bases.astype(np.int32)
    for t in range(min(k, 16)):
        h = (h << 2) ^ b32[:, t : t + npos]
    pos = np.arange(npos, dtype=np.int32)[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        loc = pos.astype(np.float32) / (lengths - k).astype(np.float32)[:, None]
    valid = pos <= (lengths[:, None] - k)
    return h, loc, valid


def plan_pair_capacities(
    bases: np.ndarray, lengths: np.ndarray, s: AlignSettings
) -> dict:
    """Exact raw cross-product totals + suggested capacities."""
    h, loc, valid = host_kmer_hashes(bases, lengths, s.kmer_size)
    h, loc, valid = h.ravel(), loc.ravel(), valid.ravel()
    is_head = valid & (loc <= s.kmer_head_edge)
    is_mid = valid & (s.kmer_mid_lead_edge <= loc) & (loc <= s.kmer_mid_tail_edge)
    is_tail = valid & (loc >= s.kmer_tail_edge)
    n_reads = bases.shape[0]
    rid = np.repeat(
        np.arange(n_reads, dtype=np.int64), h.shape[0] // max(n_reads, 1)
    ) if n_reads else np.zeros(0, np.int64)
    hv = h.ravel()[valid]
    uniq, inv = np.unique(hv, return_inverse=True)
    m = len(uniq)
    head_cnt = np.bincount(inv[is_head[valid]], minlength=m).astype(np.int64)
    mid_cnt = np.bincount(inv[is_mid[valid]], minlength=m).astype(np.int64)
    tail_cnt = np.bincount(inv[is_tail[valid]], minlength=m).astype(np.int64)
    h_total = int((head_cnt * mid_cnt).sum())
    t_total = int((tail_cnt * mid_cnt).sum())
    # per-occurrence expansion size (all four roles), accumulated per read
    n_o = np.zeros(valid.sum(), dtype=np.int64)
    vh = is_head[valid]
    vm = is_mid[valid]
    vt = is_tail[valid]
    n_o += np.where(vh, mid_cnt[inv], 0)
    n_o += np.where(vt, mid_cnt[inv], 0)
    n_o += np.where(vm, head_cnt[inv] + tail_cnt[inv], 0)
    rid_valid = rid[valid]
    row_tot = np.bincount(rid_valid, weights=n_o, minlength=n_reads)
    occ_per_read = np.bincount(rid_valid[n_o > 0], minlength=n_reads)
    return dict(
        h_total=h_total,
        t_total=t_total,
        n_kmers=int(valid.sum()),
        n_unique=m,
        row_max=int(row_tot.max()) if n_reads else 0,
        occ_max=int(occ_per_read.max()) if n_reads else 0,
        raw_total=int(row_tot.sum()),
        row_tot=row_tot.astype(np.int64),  # per-read raw slot counts
    )
