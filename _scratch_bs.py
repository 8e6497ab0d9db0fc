import sys, time
from sequence_aligner_tpu.utils.profiling import ensure_compile_cache
ensure_compile_cache()
from sequence_aligner_tpu.utils.debug import set_debug
set_debug(True)
from sequence_aligner_tpu.core.settings import AlignSettings
from sequence_aligner_tpu.models.overlapper import Overlapper
from sequence_aligner_tpu.pipeline.datasets import c_ruddii_reads

bs = int(sys.argv[1])
seqs = c_ruddii_reads(n_reads=32000, read_len=100)
s = AlignSettings.amos_parity()
ov = Overlapper(s, batch_size=bs)
recs = ov.run(seqs)  # warmup
ov = Overlapper(s, batch_size=bs)
t0 = time.time()
recs = ov.run(seqs)
dt = time.time()-t0
print(f"bs={bs}: {len(recs)} records in {dt:.2f}s -> {32000/dt:.0f} reads/s; align={ov.timer.stages['align']:.2f}s")
