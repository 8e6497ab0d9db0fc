#!/usr/bin/env python
"""Two-pairs-per-int32 (SWAR) viability probe for the DP kernels.

Round-4's dtype probe showed Mosaic cannot lower sub-32-bit vector
arithmetic (int16 maxsi / compare fail to legalize), which blocks dtype
packing but NOT manual packing: two 15-bit lanes per int32 with
mask/shift emulation (VERDICT r4 next-step 1a).  This probe measures the
emulation's real cost on chip.

The DP row steps are dominated by max / compare+select ops (~35 of the
~70 vector ops per row are max3/branch/select trees; adds and shifts are
the rest).  SWAR arithmetic on guarded 15-bit fields:

  * add: 1 op on half the vregs — a true 2x win;
  * max/select: has NO branchless sub-word form cheaper than ~6 ops
    (the classic guard-bit trick: diff = (a | H) - b isolates per-field
    borrow in the guard bits, m = (diff & H) >> 15, mask = H - m (or
    m * 0x7FFF), result = b ^ ((a ^ b) & mask)) — 6 ops on half the
    vregs = 3x the vector work of one native max.

So the break-even depends on the op mix; this probe times a max-heavy
synthetic chain both ways (native int32 [13, 1024] vs SWAR-packed
[13, 512]) inside a Pallas kernel shaped like the phase-1 row loop.

Result (v5e through the axon tunnel, 2026-08-21): SWAR-packed max
chains run 1.07x SLOWER than native at equal logical volume (46.5 ms vs
49.6 ms for the same element count) — the ~7-op emulation slightly
exceeds the 2x vreg saving even on max, which is SWAR's CHEAPEST case.
The DP rows are dominated by compare+select trees whose SWAR form needs
the same per-field flag extraction plus extra mask assembly per select,
so the full row step packs strictly worse than this probe's ratio.
Two-pairs-per-int32 packing is a measured dead end for this kernel
family on this toolchain; the op-count cuts that DO land are the
round-5 row-step rewrites (packed extraction, sign-gated chains,
boundary specialization).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from sequence_aligner_tpu.utils.profiling import ensure_compile_cache

    ensure_compile_cache()
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    P = 1024
    ROWS, COLS, REPS = 100, 13, 30  # phase-1-shaped volume

    def native_kernel(x_ref, o_ref):
        def body(i, v):
            for _ in range(REPS):
                v = jnp.maximum(v, pltpu_roll(v))
            return v

        o_ref[:, :] = jax.lax.fori_loop(0, ROWS, body, x_ref[:, :])

    def pltpu_roll(v):
        return jnp.concatenate([v[1:], v[:1]], axis=0)

    def swar_max(a, b):
        # 15-bit fields at bits 0-14 and 16-30, guard bits 15 and 31:
        # borrow isolation — each field's a >= b flag lands in its guard
        GUARD = jnp.int32((1 << 15) | -(2**31))
        diff = (a | GUARD) - b
        f0 = (diff >> 15) & 1
        f1 = (diff >> 31) & 1  # arithmetic shift; & 1 keeps the flag
        mask = (f0 * jnp.int32(0x7FFF)) | ((f1 * jnp.int32(0x7FFF)) << 16)
        return b ^ ((a ^ b) & mask)

    def swar_kernel(x_ref, o_ref):
        def body(i, v):
            for _ in range(REPS):
                v = swar_max(v, pltpu_roll(v))
            return v

        o_ref[:, :] = jax.lax.fori_loop(0, ROWS, body, x_ref[:, :])

    def run(kernel, p):
        x = jnp.asarray(
            np.random.RandomState(0).randint(0, 1 << 14, (COLS, p), np.int32)
        )

        @jax.jit
        def go(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((COLS, p), jnp.int32),
            )(x)

        def sync():
            return int(np.asarray(go(x))[0, 0])

        sync()
        t0 = time.time()
        for _ in range(10):
            sync()
        return (time.time() - t0) / 10 * 1e3

    t_native = run(native_kernel, P)       # 1024 lanes, 1 value each
    t_swar = run(swar_kernel, P // 2)      # 512 lanes, 2 values each
    print(f"native max chain  [13,{P}]  : {t_native:7.2f} ms")
    print(f"SWAR   max chain  [13,{P//2}]  : {t_swar:7.2f} ms "
          f"(same logical volume)")
    print(f"SWAR / native ratio: {t_swar / t_native:.2f}x "
          f"({'LOSES' if t_swar > t_native else 'wins'} at equal volume)")


if __name__ == "__main__":
    main()
