"""Packed-align stage ablation: word gathers, phase1_packed, phase2_packed."""
import numpy as np, time, jax, jax.numpy as jnp
from functools import partial
from sequence_aligner_tpu.utils.profiling import ensure_compile_cache
ensure_compile_cache()
from sequence_aligner_tpu.core.settings import AlignSettings
from sequence_aligner_tpu.ops.align_fused import (
    pack_reads_le, phase1_fused_packed, phase2_fused_packed)

s = AlignSettings.amos_parity()
N, L, BS, w = 32768, 100, 1 << 18, 12
key = jax.random.PRNGKey(0)
bases = jax.random.randint(key, (N, L), 0, 4, dtype=jnp.int8)
lengths = jnp.full((N,), L, jnp.int32)
packed = pack_reads_le(bases)
ai = jax.random.randint(jax.random.PRNGKey(1), (BS,), 0, N, dtype=jnp.int32)
bi = jax.random.randint(jax.random.PRNGKey(2), (BS,), 0, N, dtype=jnp.int32)
cmt = tuple(int(x) for x in s.cost_matrix.reshape(-1))

def timeit(name, fn, n=5):
    fn()
    t0 = time.time()
    for _ in range(n): out = fn()
    print(f"{name}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)

@jax.jit
def stage_g(packed, ai, bi):
    aw_t = packed[ai].T
    bw_t = packed[bi].T
    return aw_t[-1, -1] + bw_t[-1, -1]
timeit("word gathers", lambda: int(stage_g(packed, ai, bi)))

@jax.jit
def stage_p1(packed, lengths, ai, bi):
    aw_t = packed[ai].T
    bw_t = packed[bi].T
    r = phase1_fused_packed(aw_t, bw_t, lengths[ai], la_max=L, w=w,
        gO=s.gap_open, gE=s.gap_extend, cm_tuple=cmt, pblk=256)
    return r[0][-1] + r[3][-1]
timeit("+ phase1_packed", lambda: int(stage_p1(packed, lengths, ai, bi)))

@jax.jit
def stage_p2(packed, lengths, ai, bi):
    aw_t = packed[ai].T
    bw_t = packed[bi].T
    ds = jnp.clip(ai % 40, 0, L - 1)
    r = phase2_fused_packed(aw_t, bw_t, ds, lengths[ai] - ds, lengths[bi],
        la_max=L, w=w, zero_row=w // 2, gO=s.gap_open, gE=s.gap_extend,
        cm_tuple=cmt, pblk=256)
    return r[0][-1] + r[3][-1]
timeit("gathers + phase2_packed", lambda: int(stage_p2(packed, lengths, ai, bi)))

for pb in (512, 1024):
    @jax.jit
    def stage_p1b(packed, lengths, ai, bi, pb=pb):
        aw_t = packed[ai].T
        bw_t = packed[bi].T
        r = phase1_fused_packed(aw_t, bw_t, lengths[ai], la_max=L, w=w,
            gO=s.gap_open, gE=s.gap_extend, cm_tuple=cmt, pblk=pb)
        return r[0][-1] + r[3][-1]
    timeit(f"+ phase1_packed pblk={pb}", lambda: int(stage_p1b(packed, lengths, ai, bi)))
