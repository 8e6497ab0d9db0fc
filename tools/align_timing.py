#!/usr/bin/env python
"""Align-stage attribution on chip: phase1 vs phase2 kernels vs gathers,
and pblk (lane-block) sweep, on a bench-shaped 262k-pair batch."""

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
    from sequence_aligner_tpu.ops import align_fused as af

    s = AlignSettings.amos_parity()
    la_max = 100
    w = s.band_width(la_max)
    cm = tuple(int(x) for x in s.cost_matrix.reshape(-1))
    P = 1 << 18
    rng = np.random.RandomState(0)
    genome = rng.randint(0, 4, 4000, dtype=np.int8)
    starts = rng.randint(0, 3800, P)
    a = np.stack([genome[st : st + la_max] for st in starts])
    b = np.stack([genome[st + 30 : st + 30 + la_max] for st in starts])
    lens = np.full((P,), la_max, np.int32)

    aw_t = jnp.asarray(af.pack_reads_le(jnp.asarray(a))).T
    bw_t = jnp.asarray(af.pack_reads_le(jnp.asarray(b))).T
    al = jnp.asarray(lens)
    jax.block_until_ready((aw_t, bw_t))

    def sync(out):
        # block_until_ready does not truly sync on the axon tunnel
        # backend; a scalar FETCH does
        leaves = jax.tree_util.tree_leaves(out)
        return int(np.asarray(leaves[0].reshape(-1)[0]))

    def t(label, fn, reps=3):
        sync(fn())
        t0 = time.time()
        for _ in range(reps):
            sync(fn())
        dt = (time.time() - t0) / reps
        print(f"{label:34s}: {dt * 1e3:8.1f} ms  "
              f"({P / dt / 1e6:6.1f} Mpairs/s)", flush=True)

    kw = dict(la_max=la_max, w=w, gO=s.gap_open, gE=s.gap_extend, cm_tuple=cm)
    for pblk in (256, 512, 1024):
        t(f"phase1_packed pblk={pblk}", lambda pb=pblk: af.phase1_fused_packed(
            aw_t, bw_t, al, pblk=pb, **kw))
    ds = jnp.zeros((P,), jnp.int32)
    dl = al
    for pblk in (256, 512, 1024):
        t(f"phase2_packed pblk={pblk}", lambda pb=pblk: af.phase2_fused_packed(
            aw_t, bw_t, ds, dl, al, zero_row=w // 2, pblk=pb, **kw))

    # full fused (glue + both phases) at default pblk
    t("fused core packed (both+glue)", lambda: af._fused_core_packed(
        aw_t, bw_t, al, al, cm_tuple=cm, gO=s.gap_open, gE=s.gap_extend,
        min_identity=jnp.float32(s.min_identity),
        min_overlap=jnp.int32(s.min_overlap),
        max_ignore=jnp.int32(s.max_ignore),
        la_max=la_max, lb_max=la_max, width=w, pblk=256)["valid"])


if __name__ == "__main__":
    main()
