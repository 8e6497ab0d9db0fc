import numpy as np, time, jax, jax.numpy as jnp
from functools import partial
from sequence_aligner_tpu.utils.profiling import ensure_compile_cache
ensure_compile_cache()
from sequence_aligner_tpu.core.settings import AlignSettings
from sequence_aligner_tpu.ops.align_fused import (
    _dove_shift_packed, pack_reads_le, phase1_fused, phase2_fused)

s = AlignSettings.amos_parity()
N, L, BS, w = 32768, 100, 1 << 18, 12
zr = w // 2
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
def stage_a(bases, ai, bi):  # operand gathers + transposes
    a_t = bases[ai].astype(jnp.int32).T
    b_t = bases[bi].astype(jnp.int32).T
    return a_t[-1,-1] + b_t[-1,-1]
timeit("a_t+b_t gather/transpose", lambda: int(stage_a(bases, ai, bi)))

@jax.jit
def stage_p1(bases, lengths, ai, bi):
    a_t = bases[ai].astype(jnp.int32).T
    b_t = bases[bi].astype(jnp.int32).T
    best1, bi1, bj, fi, fj = phase1_fused(a_t, b_t, lengths[ai], la_max=L, w=w,
        gO=s.gap_open, gE=s.gap_extend, cm_tuple=cmt, pblk=256)
    return best1[-1] + fi[-1]
timeit("+ phase1", lambda: int(stage_p1(bases, lengths, ai, bi)))

@jax.jit
def stage_shift(packed, ai):
    ds = jax.random.randint(jax.random.PRNGKey(3), (BS,), 0, 60, dtype=jnp.int32)
    return _dove_shift_packed(packed, ai, ds, L)[-1, -1]
timeit("packed dove shift alone", lambda: int(stage_shift(packed, ai)))

@jax.jit
def stage_p2(bases, packed, lengths, ai, bi):
    b_t = bases[bi].astype(jnp.int32).T
    ds = jax.random.randint(jax.random.PRNGKey(3), (BS,), 0, 60, dtype=jnp.int32)
    a_shift = _dove_shift_packed(packed, ai, ds, L)
    pad_top = zr + 1
    pad_bot = max(L + w + 1 - pad_top - L, 0)
    b_pad = jnp.concatenate([jnp.zeros((pad_top, BS), jnp.int32), b_t,
                             jnp.zeros((pad_bot, BS), jnp.int32)], axis=0)
    outs = phase2_fused(a_shift, b_pad, lengths[ai] - ds, lengths[bi],
        la_max=L, w=w, zero_row=zr, gO=s.gap_open, gE=s.gap_extend,
        cm_tuple=cmt, pblk=256)
    return outs[0][-1]
timeit("shift + b_pad + phase2", lambda: int(stage_p2(bases, packed, lengths, ai, bi)))

from sequence_aligner_tpu.models.overlapper import _align_chunk
idx = jnp.arange(BS, dtype=jnp.int32)
kw = dict(la_max=L, cm_tuple=cmt, gO=s.gap_open, gE=s.gap_extend,
          min_identity=jnp.float32(s.min_identity),
          min_overlap=jnp.int32(s.min_overlap),
          max_ignore=jnp.int32(s.max_ignore), kernel="fused")
@jax.jit
def full(bases, lengths, packed, lead, trail, idx):
    return _align_chunk(bases, lengths, packed, lead, trail, idx,
                        jnp.int32(0), jnp.int32(BS), bs=BS, width=w, pblk=256, **kw)[0, 0]
timeit("full chunk", lambda: int(full(bases, lengths, packed, ai+1, bi+1, idx)))
