#!/usr/bin/env python
"""Per-piece wall-clock of the split pairgen programs at bench shapes
(block_until_ready between pieces; requires the warm compile cache)."""

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

    n_reads = int(os.environ.get("BENCH_READS", "32000"))
    seqs = c_ruddii_reads(n_reads=n_reads, read_len=100)
    s = AlignSettings.amos_parity()
    ov = Overlapper(s)
    bases, lengths = encode_reads(seqs)
    n_tier = 1 << max((n_reads - 1).bit_length(), 8)
    if n_tier > n_reads:
        bases = np.pad(bases, ((0, n_tier - n_reads), (0, 0)))
        lengths = np.pad(lengths, (0, n_tier - n_reads))
    occ = ov._occurrences(bases, lengths)
    jax.block_until_ready(occ["hash"])

    def sync(out):
        # block_until_ready does not truly sync through the axon tunnel;
        # a scalar fetch does
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "reshape")]
        return int(np.asarray(leaves[0].reshape(-1)[-1]))

    def t(label, fn, reps=3):
        out = fn()
        sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn()
            sync(out)
        print(f"{label:28s}: {(time.time() - t0) / reps * 1e3:9.1f} ms",
              flush=True)
        return out

    occ_s = t("sort_occurrences", lambda: pg.sort_occurrences_jit(occ))
    geom = dict(
        head_edge=jnp.float32(s.kmer_head_edge),
        tail_edge=jnp.float32(s.kmer_tail_edge),
        mid_lead=jnp.float32(s.kmer_mid_lead_edge),
        mid_tail=jnp.float32(s.kmer_mid_tail_edge),
    )
    h_tot, t_tot = pg.plan_totals(occ_s, **geom)
    print(f"totals: h={h_tot} t={t_tot}")
    cap_head = _cap_at_least(h_tot, 1 << 14)
    cap_tail = _cap_at_least(t_tot, 1 << 14)
    cap_out = _cap_at_least(min((h_tot + t_tot) // 2, h_tot + t_tot), 1 << 14)
    print(f"caps: head={cap_head} tail={cap_tail} out={cap_out}")

    den = getattr(ov, "_uniform_den", 0)
    prep = t("expand_prep (head)", lambda: pg._expand_prep_jit(
        occ_s, **geom, pack_den=den, which="head"))
    ck = pg._chunk_sizes(cap_head)
    print(f"chunks: {len(ck)} x {ck[0]}")
    t("expand_chunk x1", lambda: pg._expand_chunk_jit(
        prep, jnp.int32(0), chunk=ck[0], pack_den=den, emit_key=True))

    key_h, _ = pg._expand_stream_chunked(
        occ_s, geom, cap=cap_head, pack_den=den, which="head", emit_key=True)
    key_t, _ = pg._expand_stream_chunked(
        occ_s, geom, cap=cap_tail, pack_den=den, which="tail", emit_key=True)
    jax.block_until_ready((key_h, key_t))
    t("expand full (both classes)", lambda: jax.block_until_ready(tuple(
        pg._expand_stream_chunked(
            occ_s, geom, cap=c, pack_den=den, which=w, emit_key=True)[0]
        for w, c in (("head", cap_head), ("tail", cap_tail)))))
    key_s = t("sort_keys (84M)", lambda: pg._sort_keys_jit(key_h, key_t))
    out = t("finish_packed", lambda: pg._finish_packed_jit(
        key_s, jnp.int32(s.min_collisions), jnp.int32(s.max_collisions),
        cap_out=cap_out, with_counts=True))
    print(f"n_out = {int(out['n_out'])}")


if __name__ == "__main__":
    main()
