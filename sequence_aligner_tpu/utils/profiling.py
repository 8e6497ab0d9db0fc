"""Profiling and device-memory observability.

TPU-era replacement of the reference's JVM telemetry
(Runtime.freeMemory/totalMemory prints + forced System.gc(),
src/KmerTable.scala:137-147): jax.profiler traces and device memory stats.
Also hosts the persistent-compilation-cache switch — essential on the axon
remote-compile tunnel where cold compiles cost tens of seconds.
"""

from __future__ import annotations

import contextlib
import os


def ensure_compile_cache(path: str = "/root/repo/.jax_cache") -> None:
    import jax

    if jax.default_backend() == "cpu":
        # CPU executables are AOT-compiled for the BUILD host's ISA; the
        # committed cache may come from a different machine and loading
        # its entries can SIGILL (observed killing a CPU-mesh run
        # silently).  Use a host-local, uncommitted cache instead.
        path = "/tmp/jax_cache_cpu"
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax without these flags


def device_memory_stats() -> dict:
    """Per-device memory stats (bytes in use / limit) where the backend
    exposes them; empty dict otherwise."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            ms = d.memory_stats()
        except Exception:
            ms = None
        if ms:
            out[str(d)] = {
                "bytes_in_use": ms.get("bytes_in_use"),
                "peak_bytes_in_use": ms.get("peak_bytes_in_use"),
                "bytes_limit": ms.get("bytes_limit"),
            }
    return out


@contextlib.contextmanager
def trace_profile(logdir: str | None):
    """jax.profiler trace context; no-op when logdir is None."""
    import jax

    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
