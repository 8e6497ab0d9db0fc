"""Vectorized k-mer extraction on device.

Re-expresses the reference's per-read k-mer loop (src/BioLibs.scala:54-61 +
the seqHash packing of src/ObjectStore.scala:48-67) as a jitted op over the
whole read batch: the rolling 2-bit hash is an unrolled shift/xor over k
static slices (k <= 16 contributes to the hash; larger k only widens the
window, like the reference's min(16, len) cap), and the normalized position
``loc = i / (len - k)`` is computed in float32 for bit-parity with the
reference's Float arithmetic.

Output is a flat occurrence table (hash, read_id, loc, valid) of static
shape [N * (L_max - k + 1)] — invalid slots (past each read's end) are
masked, never compacted on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k",))
def kmer_scan(bases: jax.Array, lengths: jax.Array, read_ids: jax.Array, k: int):
    """bases [N, L] int8, lengths [N] int32, read_ids [N] int32 ->
    dict(hash, read_id, loc, valid) each [N * (L - k + 1)].
    """
    n, l = bases.shape
    npos = max(l - k + 1, 0)
    if npos == 0 or k <= 0:
        z = jnp.zeros((0,), dtype=jnp.int32)
        return dict(
            hash=z, read_id=z, loc=jnp.zeros((0,), jnp.float32),
            valid=jnp.zeros((0,), jnp.bool_),
        )
    b32 = bases.astype(jnp.int32)
    h = jnp.zeros((n, npos), dtype=jnp.int32)
    for t in range(min(k, 16)):
        h = (h << 2) ^ jax.lax.dynamic_slice_in_dim(b32, t, npos, axis=1)
    pos = jnp.arange(npos, dtype=jnp.int32)[None, :]
    # loc = i / (len - k) in float32 (0/0 -> NaN like the reference)
    denom = (lengths - k).astype(jnp.float32)[:, None]
    loc = pos.astype(jnp.float32) / denom
    valid = pos <= (lengths[:, None] - k)
    rid = jnp.broadcast_to(read_ids[:, None], (n, npos))
    return dict(
        hash=h.reshape(-1),
        read_id=rid.reshape(-1).astype(jnp.int32),
        loc=loc.reshape(-1),
        valid=valid.reshape(-1),
    )
