#!/usr/bin/env python
"""Compile-cost probe: times TPU AOT compiles of single-construct
programs at a given size, to identify which primitive blows up the
remote compile helper (evidence base for pairgen's program structure).

Usage: python tools/compile_probe.py [size_log2] [constructs...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22
WHICH = sys.argv[2:] or None


def main():
    # NOT the persistent cache: we want true compile timings
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}  size={SIZE}", flush=True)
    n = SIZE

    def cummax(x, idx, vals):
        return jax.lax.cummax(x)

    def cumsum(x, idx, vals):
        return jnp.cumsum(x)

    def assoc_last_nonzero(x, idx, vals):
        return jax.lax.associative_scan(
            lambda a, b: jnp.where(b == 0, a, b), x
        )

    def scatter_set(x, idx, vals):
        return jnp.zeros((n + 1,), jnp.int32).at[idx].set(vals)[:n]

    def scatter_max(x, idx, vals):
        return jnp.zeros((n + 1,), jnp.int32).at[idx].max(vals)[:n]

    def gather(x, idx, vals):
        return x[jnp.clip(idx, 0, n - 1)]

    def sort1(x, idx, vals):
        return jax.lax.sort((x,), num_keys=1, is_stable=False)[0]

    def sort2(x, idx, vals):
        return jax.lax.sort((x, vals), num_keys=1, is_stable=True)

    cons = dict(
        cummax=cummax, cumsum=cumsum, assoc=assoc_last_nonzero,
        scatter_set=scatter_set, scatter_max=scatter_max,
        gather=gather, sort1=sort1, sort2=sort2,
    )
    shapes = (
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.ShapeDtypeStruct((n // 16,), jnp.int32),  # idx (table-sized)
        jax.ShapeDtypeStruct((n // 16,), jnp.int32),  # vals
    )
    for name, fn in cons.items():
        if WHICH and name not in WHICH:
            continue
        t0 = time.time()
        try:
            jax.jit(fn).lower(*shapes).compile()
            print(f"{name:12s}: {time.time() - t0:8.1f}s", flush=True)
        except Exception as e:
            print(
                f"{name:12s}: FAILED after {time.time() - t0:.1f}s: "
                f"{type(e).__name__}: {str(e)[:200]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
