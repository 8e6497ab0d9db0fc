#!/usr/bin/env python
"""Collision-count vs alignment-validity correlation on the 32k bench
dataset (VERDICT r3 #5): the align stage runs ~36 DP alignments per
emitted record; is there a count threshold above min_collisions that is
empirically lossless, and how much would it cut?"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from sequence_aligner_tpu.utils.profiling import ensure_compile_cache

    ensure_compile_cache()
    import numpy as np

    from sequence_aligner_tpu.core.settings import AlignSettings
    from sequence_aligner_tpu.models.overlapper import Overlapper
    from sequence_aligner_tpu.ops.encode import encode_reads
    from sequence_aligner_tpu.pipeline.datasets import c_ruddii_reads

    n_reads = int(os.environ.get("BENCH_READS", "32000"))
    seqs = c_ruddii_reads(n_reads=n_reads, read_len=100)
    s = AlignSettings.amos_parity()
    ov = Overlapper(s)
    ov.want_counts = True  # production skips count materialization
    bases, lengths = encode_reads(seqs)
    n_tier = 1 << max((n_reads - 1).bit_length(), 8)
    bases = np.pad(bases, ((0, n_tier - n_reads), (0, 0)))
    lengths = np.pad(lengths, (0, n_tier - n_reads))
    occ = ov._occurrences(bases, lengths)
    out, n_pairs = ov._candidates_dev(occ)
    lead = np.asarray(out["lead"][:n_pairs]).astype(np.int64)
    trail = np.asarray(out["trail"][:n_pairs]).astype(np.int64)
    count = np.asarray(out["count"][:n_pairs])
    print(f"candidates: {n_pairs}")

    vl, vt, _, _ = ov._align_device(
        bases, lengths, out["lead"], out["trail"], n_pairs
    )
    print(f"valid: {len(vl)} ({n_pairs / max(len(vl), 1):.1f} aligns/record)")

    ckey = (lead << 20) | trail
    vkey = (vl.astype(np.int64) << 20) | vt.astype(np.int64)
    is_valid = np.isin(ckey, vkey)
    assert int(is_valid.sum()) == len(vl)

    print("\ncount  n_pairs  n_valid   (per-count)")
    cmax = int(count.max())
    hist_p = np.bincount(count, minlength=cmax + 1)
    hist_v = np.bincount(count[is_valid], minlength=cmax + 1)
    for c in range(int(count.min()), min(cmax, 40) + 1):
        if hist_p[c]:
            print(f"{c:5d} {hist_p[c]:9d} {hist_v[c]:8d}")
    print("\nthreshold t: keep count>=t — pairs kept, valid LOST")
    cum_p = hist_p[::-1].cumsum()[::-1]
    cum_v_lost = hist_v.cumsum()
    for t in range(2, 26):
        lost = int(cum_v_lost[t - 1]) if t >= 1 else 0
        kept = int(cum_p[t]) if t <= cmax else 0
        print(f"  t={t:2d}: kept {kept:9d} ({kept / n_pairs * 100:5.1f}%)  "
              f"valid lost {lost}")


if __name__ == "__main__":
    main()
