import time, sys
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from sequence_aligner_tpu.utils.profiling import ensure_compile_cache
ensure_compile_cache()
from sequence_aligner_tpu.core.settings import AlignSettings
from sequence_aligner_tpu.models.overlapper import Overlapper, _cap_at_least
from sequence_aligner_tpu.ops.encode import encode_reads
from sequence_aligner_tpu.ops.pairgen import (
    sort_occurrences_jit, plan_totals_device, expand_raw_pairs,
    candidate_pairs_stream, _I32_MAX)
from sequence_aligner_tpu.pipeline.datasets import c_ruddii_reads

s = AlignSettings.amos_parity()
seqs = c_ruddii_reads(n_reads=32000, read_len=100)
bases, lengths = encode_reads(seqs)
ov = Overlapper(s)
occ = ov._occurrences(np.pad(bases, ((0, 768), (0, 0))),
                      np.pad(lengths, (0, 768)))
geom = dict(head_edge=jnp.float32(s.kmer_head_edge),
            tail_edge=jnp.float32(s.kmer_tail_edge),
            mid_lead=jnp.float32(s.kmer_mid_lead_edge),
            mid_tail=jnp.float32(s.kmer_mid_tail_edge))
occ_s = sort_occurrences_jit(occ)
h_tot, t_tot = plan_totals_device(occ_s, **geom)
h_tot, t_tot = int(h_tot), int(t_tot)
print("totals", h_tot, t_tot, flush=True)
cap_head = _cap_at_least(h_tot, 1 << 14)
cap_tail = _cap_at_least(t_tot, 1 << 14)
out_bound = (h_tot + t_tot) // max(s.min_collisions, 1)
cap_out = _cap_at_least(min(out_bound, h_tot + t_tot), 1 << 14)
print("caps", cap_head, cap_tail, cap_out, flush=True)
pack_den = ov._uniform_den

def timeit(name, fn, n=3):
    fn()
    t0 = time.time()
    for _ in range(n): fn()
    print(f"{name}: {(time.time()-t0)/n*1000:.0f} ms", flush=True)

timeit("sort_occ", lambda: int(sort_occurrences_jit(occ)["hash"][-1]))

@partial(jax.jit, static_argnames=("ch","ct","pd"))
def j_expand(occ_s, ch, ct, pd):
    fst, snd, ok, ht, tt = expand_raw_pairs(occ_s, geom, ch, ct, pack_den=pd)
    return fst[-1] + snd[-1] + ht + tt
timeit("expand_raw_pairs", lambda: int(j_expand(occ_s, cap_head, cap_tail, pack_den)))

@partial(jax.jit, static_argnames=("ch","ct","pd"))
def j_expand_sort(occ_s, ch, ct, pd):
    fst, snd, ok, ht, tt = expand_raw_pairs(occ_s, geom, ch, ct, pack_den=pd)
    key = jnp.where(ok, (fst << 16) | snd, _I32_MAX)
    key_s = jax.lax.sort((key,), num_keys=1, is_stable=False)[0]
    return key_s[-1] + key_s[0]
timeit("+ packed sort", lambda: int(j_expand_sort(occ_s, cap_head, cap_tail, pack_den)))

def full():
    out = candidate_pairs_stream(
        occ_s, **geom, min_collisions=jnp.int32(s.min_collisions),
        max_collisions=jnp.int32(s.max_collisions),
        cap_head=cap_head, cap_tail=cap_tail, cap_out=cap_out,
        presorted=True, packed_ids=True, pack_den=pack_den)
    return int(out["n_out"])
timeit("full stream", full)
