#!/usr/bin/env python
"""End-to-end overlap benchmark on the c_ruddii-scale dataset.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: reads/second through the full overlap engine (encode -> k-mer
extraction -> candidate generation -> batched banded dovetail DP -> OVL
records) on 32,000 x 100 bp reads (the golden bank's object count),
timed after a warmup pass so compile time (remote-compile tunnel, cached
persistently) is excluded — matching how a production service would run.

Robustness (the round-2 artifact was an rc=124 timeout with no JSON):
the bench ALWAYS emits its JSON line — SIGTERM/SIGINT (what ``timeout``
sends) and an internal SIGALRM deadline flush the best measurement
completed so far and exit 0.  If only the warmup pass finished, its
(compile-inclusive, conservative) reads/s is reported with
"partial": "warmup_only".

Baseline: the reference Scala overlapper's large run — ~20 min wall clock
for the c_ruddii pipeline (reference README:513-515), overlap-stage
dominated => 32,000 reads / 1200 s = 26.7 reads/s.
"""

import json
import os
import signal
import sys
import threading
import time

BASELINE_READS_PER_S = 32000.0 / 1200.0
# the bundled AMOS hash-overlap C++ binary, single x86 core, same 32k
# dataset: ~71 s end-to-end (tests/test_differential.py's timed run)
HASH_OVERLAP_READS_PER_S = 450.0

N_READS = int(os.environ.get("BENCH_READS", "32000"))
READ_LEN = int(os.environ.get("BENCH_READ_LEN", "100"))
ERROR_RATE = float(os.environ.get("BENCH_ERROR_RATE", "0"))
# BENCH_K: k-mer size (12 = reference default; 16 = BASELINE config-1's
# choice, needed at multi-Mbp sim-genome scale where k=12 saturates the
# 24-bit hash space and the raw cross-product stream outgrows one chip)
KMER_K = int(os.environ.get("BENCH_K", "12"))
# BENCH_SIM=<coverage>: random-genome simulated dataset at that coverage
# instead of the c_ruddii shred (for assignment-scale runs, e.g.
# BENCH_READS=100000 BENCH_SIM=8)
SIM_COVERAGE = float(os.environ.get("BENCH_SIM", "0"))
# self-imposed wall-clock deadline (s): flush whatever has been measured
# and exit 0 well before any external `timeout` turns the run into rc=124
DEADLINE_S = int(os.environ.get("BENCH_DEADLINE", "1380"))

# progressively-updated best-known result; the signal handlers print it
RESULT = {
    "metric": "overlap_reads_per_sec_c_ruddii_32k",
    "value": 0.0,
    "unit": "reads/s",
    "vs_baseline": 0.0,
    "partial": "startup",
}
_FLUSHED = False


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def flush_result():
    global _FLUSHED
    if _FLUSHED:
        return
    _FLUSHED = True
    print(json.dumps(RESULT), flush=True)


def _on_signal(signum, frame):
    log(f"signal {signum}: flushing best-known result and exiting")
    flush_result()
    os._exit(0)


def _update(rps, stages, extra):
    RESULT.update(
        value=round(rps, 2),
        vs_baseline=round(rps / BASELINE_READS_PER_S, 2),
        stages_s=stages,
        **extra,
    )


def _watchdog():
    """Deadline enforcement that works even when the main thread is
    blocked inside a native call (remote-compile RPC): signal handlers
    only run between Python bytecodes, but a daemon thread keeps running
    because blocking I/O releases the GIL.  At the deadline it flushes
    the best-known result and hard-exits 0."""
    time.sleep(DEADLINE_S)
    log(f"watchdog: {DEADLINE_S}s deadline hit — flushing best-known "
        f"result and exiting")
    flush_result()
    sys.stdout.flush()
    os._exit(0)


def main():
    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGALRM):
        signal.signal(sig, _on_signal)
    signal.alarm(DEADLINE_S)
    threading.Thread(target=_watchdog, daemon=True).start()

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
    s = AlignSettings.amos_parity(kmer_size=KMER_K)

    # warmup pass: triggers all compiles at the exact production shapes
    # (run_arrays is the production emission surface: canonical arrays
    # straight to the native {OVL} writer, no per-record objects)
    t0 = time.time()
    ov = Overlapper(s)
    arrs = ov.run_arrays(seqs)
    warm_t = time.time() - t0
    log(f"warmup: {len(arrs[0])} records in {warm_t:.1f}s "
        f"(includes compiles) stats={ov.stats}")
    stages_w = {k: round(v, 3) for k, v in ov.timer.stages.items()}
    _update(
        len(seqs) / warm_t, stages_w,
        dict(partial="warmup_only", n_records=len(arrs[0]),
             n_candidate_pairs=ov.stats.n_alignments),
    )

    # timed pass
    ov = Overlapper(s)
    t0 = time.time()
    arrs = ov.run_arrays(seqs)
    elapsed = time.time() - t0
    recs = arrs[0]
    rps = len(seqs) / elapsed
    log(f"timed: {len(recs)} records in {elapsed:.2f}s -> {rps:.1f} reads/s")
    stages = {k: round(v, 3) for k, v in ov.timer.stages.items()}
    log(f"stage split (s): {stages}")

    # DP-cell throughput vs chip peak: each candidate pair fills two
    # (la+1) x (width+1) bands of 3 int32 DP states (~12 VPU ops/cell);
    # v5e VPU peak ~ 3.96e12 int32 op/s (8x128x4 ALUs @ 940 MHz)
    width = s.band_width(READ_LEN)
    # two cell accountings (README "DP cell metrics"): dp_cells = what
    # the tiered kernels actually loop over; dp_cells_raw = the
    # 2-full-band volume a non-split engine would fill (stable across
    # rounds/configurations, the r1-r3 definition)
    raw = ov.stats.dp_cells_raw or (
        2 * ov.stats.n_alignments * (READ_LEN + 1) * (width + 1)
    )
    cells = ov.stats.dp_cells or raw
    align_t = max(ov.timer.stages.get("align", elapsed), 1e-9)
    cells_s = cells / align_t
    raw_s = raw / align_t
    vpu_util = cells_s * 12 / 3.96e12
    log(f"DP fill: {cells / 1e9:.2f}G effective cells "
        f"({raw / 1e9:.2f}G raw-band) in {align_t:.2f}s = "
        f"{cells_s / 1e9:.2f}G eff ({raw_s / 1e9:.2f}G raw) cells/s "
        f"(~{vpu_util * 100:.1f}% of v5e VPU peak at ~12 int32 ops/cell)")

    # honest second baseline: the bundled AMOS hash-overlap C++ binary
    # does the same 32k dataset in ~71 s on one x86 core (~450 reads/s,
    # measured in tests/test_differential.py).  That number was measured
    # ONLY at the default config (32k c_ruddii shred, k=12, 100 bp) — on
    # any other BENCH_* configuration the C++ baseline's own reads/s
    # would differ, so the ratio is suppressed there instead of being
    # silently extrapolated.
    default_cfg = (
        N_READS == 32000 and READ_LEN == 100 and KMER_K == 12
        and not SIM_COVERAGE and ERROR_RATE == 0
    )
    vs_cpp = rps / HASH_OVERLAP_READS_PER_S if default_cfg else None
    log(f"vs baselines: {rps / BASELINE_READS_PER_S:.1f}x the reference "
        f"Scala/JVM overlapper (26.7 reads/s)"
        + (f", {vs_cpp:.1f}x single-core AMOS hash-overlap C++ "
           f"(~450 reads/s)" if default_cfg else
           " (C++ hash-overlap ratio suppressed: only measured at the "
           "default 32k/k=12 config)"))

    RESULT.pop("partial", None)
    extra = dict(
        dp_cells_per_sec=round(cells_s),
        dp_cells_raw_per_sec=round(raw_s),
        n_candidate_pairs=ov.stats.n_alignments,
        n_records=len(recs),
    )
    if vs_cpp is not None:
        extra["vs_hash_overlap_cpp"] = round(vs_cpp, 2)
    _update(rps, stages, extra)
    signal.alarm(0)
    flush_result()


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # emit whatever was measured even on a crash
        log(f"FATAL: {type(e).__name__}: {e}")
        RESULT.setdefault("partial", "error")
        RESULT["error"] = f"{type(e).__name__}: {e}"[:300]
        flush_result()
        raise
