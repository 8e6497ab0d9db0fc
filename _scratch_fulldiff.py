import os, shutil, subprocess, time
from sequence_aligner_tpu.utils.profiling import ensure_compile_cache
ensure_compile_cache()
from sequence_aligner_tpu.core.settings import AlignSettings
from sequence_aligner_tpu.io.ovl import parse_ovl
from sequence_aligner_tpu.models.overlapper import Overlapper
from sequence_aligner_tpu.pipeline.datasets import AMOS_BIN, load_genome, shred_genome, write_seq
from sequence_aligner_tpu.pipeline.driver import _run

seqs = shred_genome(load_genome(), 32000, 100, seed=0)
wd = "/tmp/fulldiff"
os.makedirs(wd, exist_ok=True)
seqp = f"{wd}/input.seq"; bnk = f"{wd}/input.bnk"; ovl = f"{wd}/amos.ovl"
if not os.path.exists(ovl):
    write_seq(seqs, seqp)
    if os.path.exists(bnk): shutil.rmtree(bnk)
    _run([f"{AMOS_BIN}/toAmos_new", "-s", seqp, "-b", bnk])
    t0 = time.time()
    with open(ovl, "w") as f:
        r = subprocess.run([f"{AMOS_BIN}/hash-overlap", bnk, "-A", "-x", "0.04", "-o", "40"],
                           stdout=f, stderr=subprocess.PIPE, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    print(f"hash-overlap: {time.time()-t0:.0f}s")
amos_recs = parse_ovl(ovl)
s = AlignSettings.amos_parity()
t0 = time.time()
ours = Overlapper(s).run(seqs)
print(f"engine: {time.time()-t0:.0f}s")
a = {(r.id_a, r.id_b, r.ahg, r.bhg) for r in amos_recs}
o = {(r.id_a, r.id_b, r.ahg, r.bhg) for r in ours}
print(f"amos={len(a)} ours={len(o)} exact_common={len(a&o)} ours_only={len(o-a)} amos_only={len(a-o)}")
op = {(x, y) for x, y, *_ in o}
ap = {(x, y) for x, y, *_ in a}
print(f"pairs: common={len(op&ap)} ours_only={len(op-ap)} amos_only={len(ap-op)}")
print("sample ours_only:", sorted(o - a)[:6])
print("sample amos_only:", sorted(a - o)[:6])
