#!/usr/bin/env python
"""Engine-flow pairgen trace: replicate Overlapper._candidates_dev piece
by piece with a scalar-fetch sync after each dispatch, TWO passes (the
bench's warmup + timed shape).  Env knobs mirror bench.py: TRACE_READS
(32000), TRACE_SIM (coverage, 0 = c_ruddii shred), TRACE_K (12).  At
>= 2^16 reads the engine takes the general-id path (2-key pair sort +
run-length + compaction) and so does the trace."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from sequence_aligner_tpu.utils.profiling import ensure_compile_cache

    ensure_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sequence_aligner_tpu.core.settings import AlignSettings
    from sequence_aligner_tpu.models.overlapper import Overlapper, _cap_at_least
    import sequence_aligner_tpu.ops.pairgen as pg
    from sequence_aligner_tpu.ops.encode import encode_reads
    from sequence_aligner_tpu.pipeline.datasets import c_ruddii_reads

    n_reads = int(os.environ.get("TRACE_READS", "32000"))
    sim = float(os.environ.get("TRACE_SIM", "0"))
    k = int(os.environ.get("TRACE_K", "12"))
    if sim:
        from sequence_aligner_tpu.pipeline.datasets import simulated_reads

        seqs = simulated_reads(n_reads, 100, coverage=sim, error_rate=0)
    else:
        seqs = c_ruddii_reads(n_reads=n_reads, read_len=100)
    s = AlignSettings.amos_parity(kmer_size=k)
    bases, lengths = encode_reads(seqs)
    n_tier = 256
    while n_tier < n_reads:
        n_tier *= 2
    bases = np.pad(bases, ((0, n_tier - n_reads), (0, 0)))
    lengths = np.pad(lengths, (0, n_tier - n_reads))
    ov = Overlapper(s)

    geom = dict(
        head_edge=jnp.float32(s.kmer_head_edge),
        tail_edge=jnp.float32(s.kmer_tail_edge),
        mid_lead=jnp.float32(s.kmer_mid_lead_edge),
        mid_tail=jnp.float32(s.kmer_mid_tail_edge),
    )

    def run_pass(tag):
        t_all = time.time()
        marks = [("start", time.time())]

        def mark(label, sync_val=None):
            if sync_val is not None:
                np.asarray(sync_val)  # fetch = true sync through tunnel
            marks.append((label, time.time()))

        occ = ov._occurrences(bases, lengths)
        mark("kmer_scan", occ["hash"][-1])
        den = ov._uniform_den if hasattr(ov, "_uniform_den") else 0
        if den:
            occ_s = pg.sort_occurrences_packed_jit(occ, pack_den=den)
        else:
            occ_s = pg.sort_occurrences_jit(occ)
        mark("sort_occ", occ_s["hash"][-1])
        h_tot, t_tot = pg.plan_totals(occ_s, pack_den=den, **geom)
        mark("plan")
        cap_head = _cap_at_least(h_tot, 1 << 14)
        cap_tail = _cap_at_least(t_tot, 1 << 14)
        cap_out = _cap_at_least((h_tot + t_tot) // 2, 1 << 14)
        packed = n_tier < (1 << 16)
        if packed:
            key_h, _ = pg._expand_stream_chunked(
                occ_s, geom, cap=cap_head, pack_den=den, which="head",
                emit_key=True, host_planned=True)
            mark("expand_head", key_h[-1])
            key_t, _ = pg._expand_stream_chunked(
                occ_s, geom, cap=cap_tail, pack_den=den, which="tail",
                emit_key=True, host_planned=True)
            mark("expand_tail", key_t[-1])
            key_s = pg._sort_keys_jit(key_h, key_t)
            mark("sort_keys", key_s[-1])
            out = pg._finish_packed_jit(
                key_s, jnp.int32(s.min_collisions),
                jnp.int32(s.max_collisions),
                cap_out=cap_out, with_counts=True)
            mark("finish", out["n_out"])
        else:  # general-id path (the engine's route at >= 2^16 reads)
            import warnings

            h_fst, h_snd, _ = pg._expand_stream_chunked(
                occ_s, geom, cap=cap_head, pack_den=den, which="head",
                emit_key=False, host_planned=True)
            mark("expand_head", h_fst[-1])
            t_fst, t_snd, _ = pg._expand_stream_chunked(
                occ_s, geom, cap=cap_tail, pack_den=den, which="tail",
                emit_key=False, host_planned=True)
            mark("expand_tail", t_fst[-1])
            with warnings.catch_warnings():
                warnings.filterwarnings(
                    "ignore", message="Some donated buffers were not usable")
                fst2, snd2 = pg._sort_pairs_np_jit(h_fst, h_snd, t_fst, t_snd)
            mark("sort_pairs", fst2[-1])
            n_keep_dev, cnt, keep = pg._np_keep_count_jit(
                fst2, snd2, jnp.int32(s.min_collisions),
                jnp.int32(s.max_collisions))
            mark("keep_count", n_keep_dev)
            cap_eff = min(cap_out, pg._finish_cap(int(n_keep_dev)))
            with warnings.catch_warnings():
                warnings.filterwarnings(
                    "ignore", message="Some donated buffers were not usable")
                out = pg._finish_np_jit(fst2, snd2, cnt, keep, cap_out=cap_eff)
            mark("finish", out["n_out"])
        print(f"--- pass {tag} (total {time.time() - t_all:.2f}s) ---")
        for (l0, t0), (l1, t1) in zip(marks, marks[1:]):
            print(f"  {l1:14s}: {(t1 - t0) * 1e3:8.1f} ms")

    # uniform-den detection needs _occurrences once first
    run_pass("warm")
    run_pass("timed")


if __name__ == "__main__":
    main()
