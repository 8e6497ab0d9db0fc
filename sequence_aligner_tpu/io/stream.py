"""Streamed FASTA input: chunked scan/encode with O(chunk) host memory.

The round-2 engine did one synchronous host encode + one upload of the
full [N, L] matrix (fine at 32k reads, a wall at the 1M/20M-read scale
targets).  This module provides the host half of the streamed input
pipeline (SURVEY.md §2.5 pipeline row; the reference's analog is the
line-by-line callback reader, src/BioLibs.scala:26-50):

  * ``fasta_scan``    — one cheap pass -> (n_reads, max_len), native
                        (mmap, native/fastio.cpp) with a Python fallback;
  * ``iter_encoded_chunks`` — generator of ([m, l_max] int8 code matrix,
                        [m] int32 lengths) chunks in file order.

``models.overlapper.Overlapper.run_stream`` consumes these, assembling
the device-resident read matrix chunk by chunk (async uploads overlap
with host parsing of the next chunk), so peak host memory is
O(chunk_reads * l_max) regardless of input size.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from sequence_aligner_tpu.ops.encode import _LUT


def _py_scan(path: str) -> tuple[int, int]:
    n = 0
    cur = 0
    mx = 0
    with open(path, "rb") as f:
        first = True
        for line in f:
            if line.startswith(b">"):
                if first and n == 0:
                    pass
                n += 1
                mx = max(mx, cur)
                cur = 0
            else:
                if n == 0:
                    raise ValueError(f"Invalid Sequence File: {path}")
                cur += len(line.strip())
            first = False
    return n, max(mx, cur)


def fasta_scan(path: str) -> tuple[int, int]:
    """(n_reads, max_body_len) in one pass; native mmap when available."""
    from sequence_aligner_tpu.native import fasta_scan_native

    res = fasta_scan_native(path)
    return res if res is not None else _py_scan(path)


def _py_chunks(
    path: str, chunk_reads: int, l_max: int
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    bases = np.zeros((chunk_reads, l_max), dtype=np.int8)
    lengths = np.zeros(chunk_reads, dtype=np.int32)
    m = -1  # current record index within the chunk
    cur = 0
    with open(path, "rb") as f:
        for line in f:
            if line.startswith(b">"):
                if m >= 0:
                    lengths[m] = cur
                if m + 1 == chunk_reads:
                    yield bases, lengths
                    bases = np.zeros((chunk_reads, l_max), dtype=np.int8)
                    lengths = np.zeros(chunk_reads, dtype=np.int32)
                    m = -1
                m += 1
                cur = 0
            else:
                if m < 0:
                    raise ValueError(f"Invalid Sequence File: {path}")
                body = np.frombuffer(line.strip(), dtype=np.uint8)
                take = body[: max(l_max - cur, 0)]
                bases[m, cur : cur + len(take)] = _LUT[take]
                cur += len(body)
    if m >= 0:
        lengths[m] = cur
        yield bases[: m + 1], lengths[: m + 1]


def iter_encoded_chunks(
    path: str, chunk_reads: int, l_max: int, *, native_ok: bool = True
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yield (bases [m, l_max] int8, lengths [m] int32) chunks in file
    order, m == chunk_reads except possibly the last.  Native mmap path
    when available; pure-Python fallback otherwise (or native_ok=False)."""
    if native_ok:
        from sequence_aligner_tpu.native import fasta_encode_chunks_native

        produced = False
        for chunk in fasta_encode_chunks_native(path, chunk_reads, l_max):
            produced = True
            yield chunk
        if produced:
            return
        # the native generator yields nothing both for an unavailable
        # toolchain and a legitimately empty file; re-scan cheaply
        if fasta_scan(path)[0] == 0:
            return
    yield from _py_chunks(path, chunk_reads, l_max)
