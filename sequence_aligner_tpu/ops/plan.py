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
    hv = h[valid]
    uniq, inv = np.unique(hv, return_inverse=True)
    m = len(uniq)
    head_cnt = np.bincount(inv[is_head[valid]], minlength=m).astype(np.int64)
    mid_cnt = np.bincount(inv[is_mid[valid]], minlength=m).astype(np.int64)
    tail_cnt = np.bincount(inv[is_tail[valid]], minlength=m).astype(np.int64)
    h_total = int((head_cnt * mid_cnt).sum())
    t_total = int((tail_cnt * mid_cnt).sum())
    if h_total >= 2**31 or t_total >= 2**31:
        raise NotImplementedError(
            f"raw pair totals ({h_total}, {t_total}) exceed int32; shard the "
            "input by hash prefix (parallel.shard) before pair generation"
        )
    return dict(
        h_total=h_total,
        t_total=t_total,
        n_kmers=int(valid.sum()),
        n_unique=m,
    )
