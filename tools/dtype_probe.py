#!/usr/bin/env python
"""Does int16 double VPU throughput on this chip for the DP kernels'
op mix (max / add / compare / select on [band, lanes] arrays)?

The fused dovetail kernels are VPU-issue-bound on [w + 1, pblk] int32
arrays (tools/align_timing.py).  int16 packs 16x128 elements per vreg
instead of 8x128 — IF Mosaic issues int16 lanes natively, the same op
stream costs half the vregs.  This probe times an equivalent op mix at
both dtypes; a ratio near 2 justifies an int16 kernel port.
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

    ROWS, P, ITERS = 14, 1024, 2000

    def make(dtype):
        def kernel(x_ref, y_ref, o_ref):
            x = x_ref[:]
            y = y_ref[:]
            one = jnp.ones((), dtype)

            def body(i, carry):
                x, y = carry
                z = jnp.zeros((1, P), dtype)
                xs = jnp.concatenate([z, x[:-1]], axis=0)
                m = jnp.maximum(x + one, jnp.maximum(xs, y))
                br = (m == x).astype(dtype)
                y2 = jnp.where(br == 1, y + one, m)
                x2 = jnp.maximum(m - one, y2)
                return x2, y2

            x, y = jax.lax.fori_loop(0, ITERS, body, (x, y))
            o_ref[:] = x + y

        @jax.jit
        def run(x, y):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((ROWS, P), dtype),
            )(x, y)

        return run

    rng = np.random.RandomState(0)
    base = rng.randint(-100, 100, (ROWS, P))

    def sync(o):
        return int(np.asarray(o)[0, 0])

    results = {}
    for name, dtype in (("int32", jnp.int32), ("int16", jnp.int16),
                        ("int8", jnp.int8)):
        try:
            run = make(dtype)
            x = jnp.asarray(base.astype(np.dtype(name)))
            y = jnp.asarray((base // 2).astype(np.dtype(name)))
            sync(run(x, y))
            t0 = time.time()
            for _ in range(5):
                sync(run(x, y))
            dt = (time.time() - t0) / 5
            results[name] = dt
            print(f"{name}: {dt * 1e3:8.2f} ms for {ITERS} iters "
                  f"on [{ROWS}, {P}]", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
    if "int32" in results and "int16" in results:
        print(f"int32/int16 speed ratio: "
              f"{results['int32'] / results['int16']:.2f}x")


if __name__ == "__main__":
    main()
