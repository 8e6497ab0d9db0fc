import os, sys, time
import numpy as np
from sequence_aligner_tpu.utils.profiling import ensure_compile_cache
ensure_compile_cache()
from sequence_aligner_tpu.utils.debug import set_debug
set_debug(True)
from sequence_aligner_tpu.core.settings import AlignSettings
from sequence_aligner_tpu.models.overlapper import Overlapper
from sequence_aligner_tpu.pipeline.datasets import c_ruddii_reads

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
seqs = c_ruddii_reads(n_reads=N, read_len=100)
s = AlignSettings.amos_parity()
ov = Overlapper(s)
t0 = time.time()
recs = ov.run(seqs)
print(f"warmup: {len(recs)} records in {time.time()-t0:.1f}s stats={ov.stats}")
ov = Overlapper(s)
t0 = time.time()
recs = ov.run(seqs)
dt = time.time()-t0
print(f"timed: {len(recs)} records in {dt:.2f}s -> {N/dt:.1f} reads/s")
