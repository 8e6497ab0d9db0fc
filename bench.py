#!/usr/bin/env python
"""End-to-end overlap benchmark on the c_ruddii-scale dataset.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: reads/second through the full overlap engine (encode -> k-mer
extraction -> candidate generation -> batched banded dovetail DP -> OVL
records) on 32,000 x 100 bp reads (the golden bank's object count),
timed after a warmup pass so compile time (remote-compile tunnel, cached
persistently) is excluded — matching how a production service would run.

Baseline: the reference Scala overlapper's large run — ~20 min wall clock
for the c_ruddii pipeline (reference README:513-515), overlap-stage
dominated => 32,000 reads / 1200 s = 26.7 reads/s.
"""

import json
import os
import sys
import time

BASELINE_READS_PER_S = 32000.0 / 1200.0

N_READS = int(os.environ.get("BENCH_READS", "32000"))
READ_LEN = int(os.environ.get("BENCH_READ_LEN", "100"))


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    from sequence_aligner_tpu.utils.profiling import ensure_compile_cache

    ensure_compile_cache()
    log(f"devices: {jax.devices()}")

    from sequence_aligner_tpu.core.settings import AlignSettings
    from sequence_aligner_tpu.models.overlapper import Overlapper
    from sequence_aligner_tpu.pipeline.datasets import c_ruddii_reads

    seqs = c_ruddii_reads(n_reads=N_READS, read_len=READ_LEN)
    log(f"dataset: {len(seqs)} reads x {READ_LEN} bp")
    s = AlignSettings.amos_parity()

    # warmup pass: triggers all compiles at the exact production shapes
    t0 = time.time()
    ov = Overlapper(s, batch_size=16384)
    recs = ov.run(seqs)
    log(f"warmup: {len(recs)} records in {time.time() - t0:.1f}s "
        f"(includes compiles) stats={ov.stats}")

    # timed pass
    ov = Overlapper(s, batch_size=16384)
    t0 = time.time()
    recs = ov.run(seqs)
    elapsed = time.time() - t0
    rps = len(seqs) / elapsed
    log(f"timed: {len(recs)} records in {elapsed:.2f}s -> {rps:.1f} reads/s")

    print(json.dumps({
        "metric": "overlap_reads_per_sec_c_ruddii_32k",
        "value": round(rps, 2),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
