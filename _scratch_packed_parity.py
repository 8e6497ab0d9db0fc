"""TPU parity: packed-word Pallas core vs the code-plane scan core,
same inputs, all output keys, varied lengths + widths + edge cases."""
import numpy as np, jax, jax.numpy as jnp
from sequence_aligner_tpu.utils.profiling import ensure_compile_cache
ensure_compile_cache()
from sequence_aligner_tpu.core.settings import AlignSettings
from sequence_aligner_tpu.ops import align_fused as AF

assert jax.default_backend() == "tpu", jax.default_backend()
s = AlignSettings.amos_parity()
rng = np.random.default_rng(7)
P, L = 512, 100
cmt = tuple(int(x) for x in s.cost_matrix.reshape(-1))

for trial, (lmin, lmax, wdt) in enumerate(
    [(L, L, 13), (30, L, 13), (5, 60, 9), (L, L, 7)]
):
    a = rng.integers(0, 4, (P, L)).astype(np.int8)
    b = rng.integers(0, 4, (P, L)).astype(np.int8)
    # plant real dovetails: b = suffix of a + noise for half the pairs
    half = P // 2
    sh = rng.integers(0, 40, half)
    for i in range(half):
        k = int(sh[i])
        b[i, : L - k] = a[i, k:]
    al = rng.integers(lmin, lmax + 1, P).astype(np.int32)
    bl = rng.integers(lmin, lmax + 1, P).astype(np.int32)
    for arr, ln in ((a, al), (b, bl)):
        for i in range(P):
            arr[i, ln[i]:] = 0
    kw = dict(
        cm_tuple=cmt, gO=s.gap_open, gE=s.gap_extend,
        min_identity=jnp.float32(s.min_identity),
        min_overlap=jnp.int32(s.min_overlap),
        max_ignore=jnp.int32(s.max_ignore),
        la_max=L, lb_max=L, width=wdt, pblk=256,
    )
    ad, bd = jnp.asarray(a), jnp.asarray(b)
    ald, bld = jnp.asarray(al), jnp.asarray(bl)

    @jax.jit
    def run_packed(ad, bd, ald, bld):
        return AF._fused_core_packed(
            AF.pack_reads_le(ad).T, AF.pack_reads_le(bd).T, ald, bld, **kw
        )

    @jax.jit
    def run_scan(ad, bd, ald, bld):
        a_t = ad.astype(jnp.int32).T
        b_t = bd.astype(jnp.int32).T

        def shift_flat(ds):
            rows = jnp.arange(L, dtype=jnp.int32)[:, None]
            lanes = jnp.arange(P, dtype=jnp.int32)[None, :]
            idx = jnp.clip(rows + ds[None, :], 0, L - 1) * P + lanes
            return a_t.reshape(-1)[idx.reshape(-1)].reshape(L, P)

        return AF._fused_core(a_t, b_t, ald, bld, shift_flat, **kw)

    rp = {k: np.asarray(v) for k, v in run_packed(ad, bd, ald, bld).items()}
    rs = {k: np.asarray(v) for k, v in run_scan(ad, bd, ald, bld).items()}
    bad = []
    for k in rs:
        if not np.array_equal(rp[k], rs[k]):
            n = int(np.sum(rp[k] != rs[k]))
            i = int(np.argmax(rp[k] != rs[k]))
            bad.append((k, n, i, rp[k].flat[i], rs[k].flat[i]))
    nv = int(np.sum(rs["valid"]))
    print(f"trial {trial} w={wdt} valid={nv} -> "
          + ("OK" if not bad else f"MISMATCH {bad[:4]}"), flush=True)
print("done")
