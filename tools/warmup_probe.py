#!/usr/bin/env python
"""Per-program warmup probe: runs the production pipeline's jitted
programs one at a time at the exact bench shapes, printing a timestamp
after each completes — pinpoints which program a wedged/slow warmup is
stuck in (the bench itself is silent until the whole warmup pass ends).
Also serves as an incremental compile-cache warmer."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def t(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


def main():
    from sequence_aligner_tpu.utils.profiling import ensure_compile_cache

    ensure_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    t(f"jax ready, devices={jax.devices()}")

    from sequence_aligner_tpu.core.settings import AlignSettings
    from sequence_aligner_tpu.models.overlapper import Overlapper
    from sequence_aligner_tpu.pipeline.datasets import c_ruddii_reads

    n_reads = int(os.environ.get("BENCH_READS", "32000"))
    seqs = c_ruddii_reads(n_reads=n_reads, read_len=100)
    s = AlignSettings.amos_parity()
    ov = Overlapper(s)
    t(f"dataset ready: {len(seqs)} reads")

    from sequence_aligner_tpu.ops.encode import encode_reads

    bases, lengths = encode_reads(seqs)
    n_tier = 1 << max((n_reads - 1).bit_length(), 8)
    if n_tier > n_reads:
        bases = np.pad(bases, ((0, n_tier - n_reads), (0, 0)))
        lengths = np.pad(lengths, (0, n_tier - n_reads))
    t("encoded")

    occ = ov._occurrences(bases, lengths)
    int(np.asarray(occ["hash"][-1]))  # scalar fetch = real sync on axon
    t("kmer_scan compiled+ran")

    from sequence_aligner_tpu.ops.pairgen import (
        plan_totals, sort_occurrences_jit,
    )

    occ_s = sort_occurrences_jit(occ)
    int(np.asarray(occ_s["hash"][-1]))
    t("sort_occurrences compiled+ran")

    geom = dict(
        head_edge=jnp.float32(s.kmer_head_edge),
        tail_edge=jnp.float32(s.kmer_tail_edge),
        mid_lead=jnp.float32(s.kmer_mid_lead_edge),
        mid_tail=jnp.float32(s.kmer_mid_tail_edge),
    )
    h_tot, t_tot = plan_totals(occ_s, **geom)
    t(f"plan_totals compiled+ran: h={h_tot} t={t_tot}")

    out, n_pairs = ov._candidates_dev(occ)
    t(f"candidate stream compiled+ran: {n_pairs} pairs")

    res = ov._align_device(bases, lengths, out["lead"], out["trail"], n_pairs)
    t(f"align compiled+ran: {len(res[0])} valid")


if __name__ == "__main__":
    main()
