#!/usr/bin/env python
"""Prescreen A/B on the bench dataset: candidate-pair cut and output
byte-identity at a given diagonal window (SEQALIGN_PRESCREEN_W).

Round-5 study backing the validity-implied prescreen (VERDICT r4 #6):
see models/overlapper.py's window derivation and README's prescreen
section for why the threshold stays at 2-in-window.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from sequence_aligner_tpu.utils.profiling import ensure_compile_cache

    ensure_compile_cache()
    import numpy as np

    from sequence_aligner_tpu.core.settings import AlignSettings
    from sequence_aligner_tpu.models.overlapper import Overlapper
    from sequence_aligner_tpu.pipeline.datasets import c_ruddii_reads

    n = int(os.environ.get("BENCH_READS", "32000"))
    err = float(os.environ.get("BENCH_ERROR_RATE", "0"))
    seqs = c_ruddii_reads(n_reads=n, read_len=100, error_rate=err)
    s = AlignSettings.amos_parity()

    def run(prescreen):
        ov = Overlapper(s, prescreen=prescreen)
        t0 = time.time()
        arrs = ov.run_arrays(seqs)
        dt = time.time() - t0
        return arrs, ov.stats, dt, dict(ov.timer.stages)

    base, st0, t_off, stg0 = run(False)
    scr, st1, t_on, stg1 = run(True)
    same = all(np.array_equal(a, b) for a, b in zip(base, scr))
    w = os.environ.get("SEQALIGN_PRESCREEN_W", "(tight default)")
    print(f"window={w} error_rate={err} n={n}")
    print(f"off: pairs={st0.n_candidate_pairs} valid={st0.n_valid} "
          f"t={t_off:.2f}s align={stg0.get('align', 0):.2f}s")
    print(f"on : pairs={st1.n_candidate_pairs} valid={st1.n_valid} "
          f"t={t_on:.2f}s align={stg1.get('align', 0):.2f}s "
          f"pairgen={stg1.get('pairgen', 0):.2f}s")
    cut = st0.n_candidate_pairs / max(st1.n_candidate_pairs, 1)
    print(f"cut={cut:.2f}x aligns/record="
          f"{st1.n_candidate_pairs / max(st1.n_valid, 1):.1f} "
          f"(was {st0.n_candidate_pairs / max(st0.n_valid, 1):.1f})")
    print(f"BYTE-IDENTICAL: {same}")
    if not same:
        lost = set(zip(*[c.tolist() for c in base[:2]])) - set(
            zip(*[c.tolist() for c in scr[:2]])
        )
        print(f"lost records: {len(lost)} e.g. {sorted(lost)[:5]}")


if __name__ == "__main__":
    main()
