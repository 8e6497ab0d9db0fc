"""ctypes bindings for the native IO layer (fastio.cpp).

Builds the shared object with g++ on first use (cached beside the source);
every entry point has a pure-Python fallback, so the package works without
a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastio.cpp")
_SO = os.path.join(_DIR, "fastio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            capture_output=True, text=True, timeout=120,
        )
        return r.returncode == 0
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.fasta_scan.restype = ctypes.c_int
        lib.fasta_scan.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.fasta_encode.restype = ctypes.c_int64
        lib.fasta_encode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.fasta_encode_chunk.restype = ctypes.c_int64
        lib.fasta_encode_chunk.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.ovl_write.restype = ctypes.c_int64
        lib.ovl_write.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def fasta_encode_native(path: str):
    """-> (bases int8 [N, Lmax], lengths int32 [N]) or None if the native
    library is unavailable / the file is invalid."""
    lib = get_lib()
    if lib is None:
        return None
    n = ctypes.c_int64()
    mx = ctypes.c_int64()
    rc = lib.fasta_scan(path.encode(), ctypes.byref(n), ctypes.byref(mx))
    if rc == -2:
        raise ValueError(f"Invalid Sequence File: {path}")
    if rc != 0:
        return None
    bases = np.zeros((n.value, mx.value), dtype=np.int8)
    lengths = np.zeros(n.value, dtype=np.int32)
    got = lib.fasta_encode(
        path.encode(),
        bases.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n.value, mx.value,
    )
    if got != n.value:
        return None
    return bases, lengths


def fasta_scan_native(path: str):
    """-> (n_reads, max_len) or None if the native library is unavailable.
    Raises ValueError on an invalid sequence file (missing leading '>')."""
    lib = get_lib()
    if lib is None:
        return None
    n = ctypes.c_int64()
    mx = ctypes.c_int64()
    rc = lib.fasta_scan(path.encode(), ctypes.byref(n), ctypes.byref(mx))
    if rc == -2:
        raise ValueError(f"Invalid Sequence File: {path}")
    if rc != 0:
        return None
    return int(n.value), int(mx.value)


def fasta_encode_chunks_native(path: str, chunk_reads: int, l_max: int):
    """Generator of (bases int8 [m, l_max], lengths int32 [m]) chunks in
    file order; host memory O(chunk_reads * l_max).  Yields nothing if
    the native library is unavailable (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return
    off = ctypes.c_int64(0)
    while True:
        bases = np.zeros((chunk_reads, l_max), dtype=np.int8)
        lengths = np.zeros(chunk_reads, dtype=np.int32)
        got = lib.fasta_encode_chunk(
            path.encode(), ctypes.byref(off),
            bases.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            chunk_reads, l_max,
        )
        if got < 0:
            raise ValueError(f"Invalid Sequence File: {path}")
        if got == 0:
            return
        yield bases[:got], lengths[:got]
        if got < chunk_reads:
            return


def ovl_write_native(path: str, ida, idb, ahg, bhg) -> int | None:
    """Write OVL records natively; returns bytes written or None."""
    lib = get_lib()
    if lib is None:
        return None
    arrs = [np.ascontiguousarray(a, dtype=np.int32) for a in (ida, idb, ahg, bhg)]
    ptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    n = len(arrs[0])
    rc = lib.ovl_write(path.encode(), *[ptr(a) for a in arrs], n)
    return None if rc < 0 else int(rc)
