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
ERROR_RATE = float(os.environ.get("BENCH_ERROR_RATE", "0"))
# BENCH_SIM=<coverage>: random-genome simulated dataset at that coverage
# instead of the c_ruddii shred (for assignment-scale runs, e.g.
# BENCH_READS=100000 BENCH_SIM=8)
SIM_COVERAGE = float(os.environ.get("BENCH_SIM", "0"))


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

    if SIM_COVERAGE:
        from sequence_aligner_tpu.pipeline.datasets import simulated_reads

        seqs = simulated_reads(
            N_READS, READ_LEN, coverage=SIM_COVERAGE, error_rate=ERROR_RATE
        )
    else:
        seqs = c_ruddii_reads(
            n_reads=N_READS, read_len=READ_LEN, error_rate=ERROR_RATE
        )
    log(f"dataset: {len(seqs)} reads x {READ_LEN} bp (error {ERROR_RATE}"
        f"{f', sim coverage {SIM_COVERAGE}' if SIM_COVERAGE else ''})")
    s = AlignSettings.amos_parity()

    # warmup pass: triggers all compiles at the exact production shapes
    t0 = time.time()
    ov = Overlapper(s)
    recs = ov.run(seqs)
    log(f"warmup: {len(recs)} records in {time.time() - t0:.1f}s "
        f"(includes compiles) stats={ov.stats}")

    # timed pass
    ov = Overlapper(s)
    t0 = time.time()
    recs = ov.run(seqs)
    elapsed = time.time() - t0
    rps = len(seqs) / elapsed
    log(f"timed: {len(recs)} records in {elapsed:.2f}s -> {rps:.1f} reads/s")
    stages = {k: round(v, 3) for k, v in ov.timer.stages.items()}
    log(f"stage split (s): {stages}")

    # DP-cell throughput vs chip peak: each candidate pair fills two
    # (la+1) x (width+1) bands of 3 int32 DP states (~12 VPU ops/cell);
    # v5e VPU peak ~ 3.96e12 int32 op/s (8x128x4 ALUs @ 940 MHz)
    width = s.band_width(READ_LEN)
    cells = 2 * ov.stats.n_alignments * (READ_LEN + 1) * (width + 1)
    align_t = max(ov.timer.stages.get("align", elapsed), 1e-9)
    cells_s = cells / align_t
    vpu_util = cells_s * 12 / 3.96e12
    log(f"DP fill: {cells / 1e9:.2f}G cells in {align_t:.2f}s = "
        f"{cells_s / 1e9:.2f}G cells/s (~{vpu_util * 100:.1f}% of v5e VPU peak "
        f"at ~12 int32 ops/cell)")

    print(json.dumps({
        "metric": "overlap_reads_per_sec_c_ruddii_32k",
        "value": round(rps, 2),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_S, 2),
        "stages_s": stages,
        "dp_cells_per_sec": round(cells_s),
        "n_candidate_pairs": ov.stats.n_alignments,
        "n_records": len(recs),
    }))


if __name__ == "__main__":
    main()
