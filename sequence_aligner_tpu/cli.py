"""Command-line interface.

Mirrors the reference CLI (src/Project4.scala:101-259; flag list
README:345-500): same flags, same sign-forcing conventions, same 13 run
modes (1 production + 6 test + 5 bench + help).  The reference's threading
toggles map onto engine choices:

  --st-hash / --st-align     -> CPU oracle engine (single-threaded analog)
  --mt-hash / --mt-align     -> JAX device engine (parallel analog, default)
  --block-align              -> batched kernel launches (default)
  --single-align             -> batch size 1 (one pair per launch)
  --quadratic-align          -> full Smith-Waterman path
  --linear-align             -> two-phase banded dovetail path (default)

Extensions beyond the reference: --engine sharded (multi-chip), --pipeline
(full AMOS assembly like rake pipeline:project), --amos-parity (collision
band reproducing AMOS hash-overlap output exactly).
"""

from __future__ import annotations

import sys
import time

import numpy as np

from sequence_aligner_tpu.core.settings import AlignSettings, simple_match_matrix
from sequence_aligner_tpu.io.hoxd import read_hoxd

HELP = """sequence_aligner_tpu — TPU-native sequence overlapper

Usage: seqalign-tpu -i <input.seq> [options]

Modes (default --calc-overlaps):
  --calc-overlaps --test-overlaps --test-alignment
  --test-dispatch-collisions --test-block-dispatch --test-kmer-cover
  --test-fasta-read --bench-fasta-read --bench-kmer-gen
  --bench-kmer-analysis --bench-align-quick --bench-align
  --pipeline (full AMOS assembly: bank->overlap->transact->tigger->
              consensus->fasta, like rake pipeline:project)

Alignment options:
  -m|--matrix|-H|--HOXD-matrix FILE   HOXD matrix file
  -k|--kmer-size N     (12)    --match N / --mismatch N   (95/-70)
  --min-overlap N      (40)    --min-identity F           (0.98)
  --min-collisions N   (7)     --max-collisions N         (222)
  --kmer-center F      (0.4)   --kmer-edge F              (0.4)
  -gO|--gap-open N     (-200)  -gE|--gap-extend N         (-20)
  --max-ignore N       (90)
  --amos-parity               collision band matching AMOS hash-overlap

Engine options:
  --st-hash/--mt-hash --st-align/--mt-align --block-align/--single-align
  --quadratic-align/--linear-align
  --engine device|oracle|sharded    --batch-size N    --workdir DIR
  --prescreen          diagonal-coherence candidate prescreen (device
                       engine; empirically lossless, off by default)
  -i|--input FILE   -o|--output FILE   --debug   --profile DIR
"""


class Options:
    def __init__(self):
        self.action = "calc-overlaps"
        self.input = ""
        self.output = ""
        self.hoxd = ""
        self.k = 12
        self.match = 95
        self.mismatch = -70
        self.use_simple = False
        self.min_overlap = 40
        self.min_identity = 0.98
        self.max_ignore = 90
        self.gap_open = -200
        self.gap_extend = -20
        self.min_collisions = 7
        self.max_collisions = 222
        self.kmer_center = 0.4
        self.kmer_edge = 0.4
        self.engine = "device"
        self.fast_dovetail = True
        self.batch_size = 4096
        self.debug = False
        self.profile_dir = ""
        self.workdir = "/tmp/seqalign_pipe"
        self.amos_parity = False
        self.prescreen = False

    def settings(self) -> AlignSettings:
        if self.hoxd:
            cm = read_hoxd(self.hoxd)
        elif self.use_simple:
            cm = simple_match_matrix(self.match, self.mismatch)
        else:
            cm = AlignSettings().cost_matrix
        mi = self.min_identity
        if mi >= 1:  # percent-style auto-scaling (src/Project4.scala:144-146)
            mi *= 0.01
        return AlignSettings(
            cost_matrix=cm, gap_open=self.gap_open, gap_extend=self.gap_extend,
            min_overlap=self.min_overlap, min_identity=mi,
            max_ignore=self.max_ignore, kmer_size=self.k,
            min_collisions=2 if self.amos_parity else self.min_collisions,
            max_collisions=self.max_collisions,
            kmer_edge=self.kmer_edge, kmer_center=self.kmer_center,
        )


def parse_args(argv: list[str]) -> Options:
    o = Options()
    i = 0
    modes = {
        "--calc-overlaps", "--test-overlaps", "--test-alignment",
        "--test-dispatch-collisions", "--test-block-dispatch",
        "--test-kmer-cover", "--test-fasta-read", "--bench-fasta-read",
        "--bench-kmer-gen", "--bench-kmer-analysis", "--bench-align-quick",
        "--bench-align", "--pipeline",
    }
    while i < len(argv):
        a = argv[i]
        if a in ("-h", "--help"):
            print(HELP)
            sys.exit(0)
        elif a in ("-m", "--matrix", "-H", "--HOXD-matrix"):
            o.hoxd = argv[i + 1]; i += 2
        elif a in ("-k", "--kmer-size"):
            o.k = int(argv[i + 1]); i += 2
        elif a in ("-i", "--input"):
            o.input = argv[i + 1]; i += 2
        elif a in ("-o", "--output"):
            o.output = argv[i + 1]; i += 2
        elif a == "--match":
            o.match = abs(int(argv[i + 1])); o.use_simple = True; i += 2
        elif a == "--mismatch":
            o.mismatch = -abs(int(argv[i + 1])); o.use_simple = True; i += 2
        elif a == "--min-overlap":
            o.min_overlap = abs(int(argv[i + 1])); i += 2
        elif a == "--min-identity":
            o.min_identity = float(argv[i + 1]); i += 2
        elif a == "--min-collisions":
            o.min_collisions = abs(int(argv[i + 1])); i += 2
        elif a == "--max-collisions":
            o.max_collisions = abs(int(argv[i + 1])); i += 2
        elif a == "--kmer-center":
            o.kmer_center = abs(float(argv[i + 1])); i += 2
        elif a == "--kmer-edge":
            o.kmer_edge = abs(float(argv[i + 1])); i += 2
        elif a in ("-gO", "--gap-open"):
            o.gap_open = -abs(int(argv[i + 1])); i += 2
        elif a in ("-gE", "--gap-extend"):
            o.gap_extend = -abs(int(argv[i + 1])); i += 2
        elif a == "--max-ignore":
            o.max_ignore = abs(int(argv[i + 1])); i += 2
        elif a == "--st-hash":
            i += 1  # hashing is always the device op; accepted for parity
        elif a == "--mt-hash":
            i += 1
        elif a == "--st-align":
            o.engine = "oracle"; i += 1
        elif a == "--mt-align":
            o.engine = "device"; i += 1
        elif a == "--block-align":
            o.batch_size = max(o.batch_size, 4096); i += 1
        elif a == "--single-align":
            o.batch_size = 1; i += 1
        elif a == "--quadratic-align":
            o.fast_dovetail = False; i += 1
        elif a == "--linear-align":
            o.fast_dovetail = True; i += 1
        elif a == "--engine":
            o.engine = argv[i + 1]; i += 2
        elif a == "--batch-size":
            o.batch_size = int(argv[i + 1]); i += 2
        elif a == "--workdir":
            o.workdir = argv[i + 1]; i += 2
        elif a == "--amos-parity":
            o.amos_parity = True; i += 1
        elif a == "--prescreen":
            o.prescreen = True; i += 1
        elif a == "--no-prescreen":
            o.prescreen = False; i += 1
        elif a == "--debug":
            o.debug = True; i += 1
        elif a == "--profile":
            o.profile_dir = argv[i + 1]; i += 2
        elif a == "--sleep-for-debug":
            print("Sleeping so debugger can connect.")
            time.sleep(30); i += 1
        elif a in modes:
            o.action = a[2:]; i += 1
        else:
            print(f"Invalid Argument : {a}")
            print("Exiting Program.")
            sys.exit(1)
    if o.input == "" and o.action != "help":
        print("No input file specified")
        sys.exit(-1)
    return o


def _read(o: Options):
    from sequence_aligner_tpu.io.fasta import read_fasta

    return read_fasta(o.input)


def _overlap_records(o: Options, s: AlignSettings):
    if o.engine == "oracle":
        from sequence_aligner_tpu.oracle.overlap import oracle_overlaps

        return oracle_overlaps(o.input, s, fast_dovetail=o.fast_dovetail)
    if o.engine == "sharded":
        from sequence_aligner_tpu.parallel.shard import sharded_overlap

        return sharded_overlap(_read(o), s)
    from sequence_aligner_tpu.models.overlapper import Overlapper

    return Overlapper(
        s, fast_dovetail=o.fast_dovetail, batch_size=o.batch_size
    ).run(_read(o))


def _alignments(o: Options, s: AlignSettings, filter_valid: bool):
    from sequence_aligner_tpu.oracle.overlap import oracle_alignments

    return oracle_alignments(
        _read(o), s, fast_dovetail=o.fast_dovetail, filter_valid=filter_valid
    )


def main(argv: list[str] | None = None) -> int:
    o = parse_args(sys.argv[1:] if argv is None else argv)
    s = o.settings()
    act = o.action
    if o.debug:
        from sequence_aligner_tpu.utils.debug import set_debug

        set_debug(True)

    if act == "calc-overlaps":
        from sequence_aligner_tpu.io.ovl import write_ovl, write_ovl_arrays
        from sequence_aligner_tpu.utils.profiling import trace_profile

        with trace_profile(o.profile_dir or None):
            if o.engine == "device":
                # array-native production path: engine arrays feed the
                # native {OVL} writer, no per-record objects
                from sequence_aligner_tpu.models.overlapper import Overlapper

                arrs = Overlapper(
                    s, fast_dovetail=o.fast_dovetail,
                    batch_size=o.batch_size, prescreen=o.prescreen,
                ).run_arrays(_read(o))
                n = write_ovl_arrays(arrs, o.output or None)
            else:
                recs = _overlap_records(o, s)
                n = write_ovl(recs, o.output or None)
        if o.debug:
            print(f"# wrote {n} overlaps", file=sys.stderr)

    elif act == "pipeline":
        from sequence_aligner_tpu.pipeline.driver import run_amos_pipeline

        res = run_amos_pipeline(
            o.input, s, o.workdir, overlapper=o.engine
        )
        print("============ Time Taken =============")
        for k, v in res.timings.items():
            print(f"  {k:<10}: {v:8.3f}s")
        print(f"contigs: {res.n_contigs} "
              f"lengths: {[len(c.seq) for c in res.contigs]}")

    elif act == "test-fasta-read":
        # print the first 10 reads (src/Project4.scala:272-285)
        print()
        for q in _read(o)[:10]:
            print(f"id : {q.id}")
            print(f"seq: {q.seq}")
            print()

    elif act == "bench-fasta-read":
        t0 = time.time()
        n = len(_read(o))
        ms = int((time.time() - t0) * 1000)
        print(f" Read {n} sequences from {o.input} in {ms} milliseconds.")

    elif act == "test-kmer-cover":
        # k in 0..25 uniqueness/collision sweep (src/Project4.scala:299-320)
        from sequence_aligner_tpu.oracle.kmers import KmerTableOracle

        seqs = _read(o)
        for k in range(0, 26):
            tab = KmerTableOracle()
            for q in seqs:
                tab.add_sequence(q, k)
            uniques = tab.unique_kmers()
            ratio = uniques / float(4**k)
            print(f"Kmer Size : {k}")
            print(f"  uniques : {uniques}")
            print(f"  ratio   : {ratio}")
            hist = tab.collision_histogram()
            body = "".join(
                f"          [{kk} -> {hist[kk]}]\n" for kk in sorted(hist)
            )
            print("  [ number of collisions -> count of "
                  f"seqs with that many collisions ] :\n{body}")

    elif act in ("test-dispatch-collisions", "test-block-dispatch"):
        from sequence_aligner_tpu.oracle.kmers import KmerTableOracle

        seqs = _read(o)
        tab = KmerTableOracle()
        for q in seqs:
            tab.add_sequence(q, s.kmer_size)
        dispatch = tab.calc_dispatch(s)
        seen = set()
        i = 0
        hist: dict[int, int] = {}
        for lead in dispatch:
            trails = dispatch[lead]
            for b in trails:
                i += 1
                if (lead, b) in seen:
                    print(f"!!!! Collission {lead}<->{b} "
                          "Dispatched more than once. ")
                seen.add((lead, b))
                print(f" Dispatched Coll : {i} - {lead} <-> {b}")
            if act == "test-block-dispatch":
                hist[len(trails)] = hist.get(len(trails), 0) + 1
        if act == "test-block-dispatch":
            print("\n Histogram Of Relations : [Number of Aligns -> "
                  "Number of Seqs w/ that many Aligns]")
            print("".join(
                f"          [{k} -> {hist[k]}]\n" for k in sorted(hist)
            ))

    elif act == "test-alignment":
        # human-readable alignment dump (src/Project4.scala:425-440)
        for i, a in enumerate(_alignments(o, s, filter_valid=False), 1):
            print(f" Alignment {i} : {a.id_a} <-> {a.id_b}")
            print(f"   Overlap A : {a.align_a}")
            print(f"   Overlap B : {a.align_b}")
            print(f"   Start     : {a.start}")
            print(f"   End       : {a.end}")
            print(f"   Error Rat : {a.err_ratio}")
            print(f"   is Valid? : {a.valid(s)}")
            print()

    elif act == "test-overlaps":
        # ASCII overlap layout visualization (src/Project4.scala:484-504)
        from sequence_aligner_tpu.core.records import OverlapRecord

        seqs = {q.id: q for q in _read(o)}
        for i, a in enumerate(_alignments(o, s, filter_valid=False), 1):
            ovl = OverlapRecord.from_alignment(a)
            sa = seqs[a.id_a].seq if a.id_a in seqs else ""
            sb = seqs[a.id_b].seq if a.id_b in seqs else ""
            print(f" Overlap {i} : {a.id_a} <-> {a.id_b}")
            if ovl.ahg >= 0:
                print(f"   Seq A   : {sa}{'-' * max(ovl.bhg, 0)}")
                print(f"   Seq B   : {'-' * ovl.ahg}{sb}")
            else:
                print(f"   Seq A   : {'-' * -ovl.ahg}{sa}")
                print(f"   Seq B   : {sb}{'-' * max(-ovl.bhg, 0)}")
            print(f"   Ahg     : {ovl.ahg}")
            print(f"   Bhg     : {ovl.bhg}")
            print(f"   Start   : {a.start}")
            print(f"   End     : {a.end}")
            print(f"   Error   : {a.err_ratio}")
            print(f"   Valid?  : {a.valid(s) and ovl.hang_valid(s)}")

    elif act == "bench-kmer-gen":
        # host-oracle vs device kmer generation (src/Project4.scala:324-349)
        from sequence_aligner_tpu.ops.encode import encode_reads
        from sequence_aligner_tpu.ops.kmer import kmer_scan
        from sequence_aligner_tpu.oracle.kmers import KmerTableOracle
        import jax.numpy as jnp

        seqs = _read(o)
        t0 = time.time()
        tab = KmerTableOracle()
        for q in seqs:
            tab.add_sequence(q, s.kmer_size)
        ms = int((time.time() - t0) * 1000)
        print(f"\nGenerated {tab.unique_kmers()} unique kmers from "
              f"{tab.unique_seqs()} sequences from {o.input} on host in "
              f"{ms} milliseconds.\n")
        bases, lengths = encode_reads(seqs)
        ids = np.arange(1, len(seqs) + 1, dtype=np.int32)
        args = (jnp.asarray(bases), jnp.asarray(lengths), jnp.asarray(ids))
        kmer_scan(*args, s.kmer_size)["hash"].block_until_ready()  # compile
        t0 = time.time()
        occ = kmer_scan(*args, s.kmer_size)
        occ["hash"].block_until_ready()
        ms = int((time.time() - t0) * 1000)
        nk = int(np.asarray(occ["valid"]).sum())
        print(f"Generated {nk} kmer occurrences from {len(seqs)} sequences "
              f"from {o.input} on device in {ms} milliseconds.\n")

    elif act == "bench-kmer-analysis":
        # pair/dispatch timing (src/Project4.scala:353-373)
        from sequence_aligner_tpu.models.overlapper import Overlapper
        from sequence_aligner_tpu.ops.encode import encode_reads

        seqs = _read(o)
        ov = Overlapper(s)
        bases, lengths = encode_reads(seqs)
        occ = ov._occurrences(bases, lengths)
        t0 = time.time()
        lead, trail = ov._candidates(occ, bases, lengths)
        ms = int((time.time() - t0) * 1000)
        print(f"\nCalculated pair + dispatch data ({len(lead)} candidate "
              f"pairs) in {ms} milliseconds.\n")

    elif act in ("bench-align", "bench-align-quick"):
        # full 8-configuration strategy matrix, mirroring the reference's
        # {quad, linear} x {ST, MT} x {single, block} sweep
        # (src/Project4.scala:469-481).  Mapping: ST -> host oracle engine,
        # MT -> device engine; single -> one small batch per launch
        # (batch_size 256), block -> full batched launches (the JVM's
        # shared-DP-buffer block strategy maps to batching on TPU; the
        # oracle aligns per pair either way, so its single/block rows
        # differ only in dispatch accounting).
        from sequence_aligner_tpu.models.overlapper import Overlapper

        seqs = _read(o)
        # quick mode samples ~500 alignments off the full candidate stream
        # — the intent of the reference's debugStop=500
        # (src/Project4.scala:462-465; its aligns.size > debugStop gate is
        # inverted and never aligns, so we implement the sampling intent)
        sample = 500 if act == "bench-align-quick" else None
        configs = []
        for fd, algo in ((False, "quadratic"), (True, "linear")):
            for engine in ("oracle", "device"):
                thr = "ST" if engine == "oracle" else "MT"
                for block in (False, True):
                    style = "block" if block else "single"
                    configs.append((f"{algo} {thr} {style}", fd, engine, block))
        for name, fd, engine, block in configs:
            try:
                t0 = time.time()
                if engine == "device":
                    ov = Overlapper(
                        s, fast_dovetail=fd,
                        batch_size=(o.batch_size if block else 256),
                    )
                    if sample is None:
                        n = len(ov.run(seqs))
                    else:
                        from sequence_aligner_tpu.ops.encode import (
                            encode_reads,
                        )

                        bases, lengths = encode_reads(seqs)
                        occ = ov._occurrences(bases, lengths)
                        lead, trail = ov._candidates(occ, bases, lengths)
                        lead, trail = lead[:sample], trail[:sample]
                        res = ov._align(bases, lengths, lead, trail)
                        n = int(res["valid"].sum())
                else:
                    from sequence_aligner_tpu.oracle.overlap import (
                        oracle_alignments, oracle_overlaps,
                    )

                    if sample is None:
                        n = len(oracle_overlaps(seqs, s, fast_dovetail=fd))
                    else:
                        n = sum(
                            r.valid(s) for r in oracle_alignments(
                                seqs, s, fast_dovetail=fd,
                                filter_valid=False, max_pairs=sample,
                            )
                        )
                ms = int((time.time() - t0) * 1000)
                print(f"\nCalculated {n} {name} alignments in "
                      f"{ms} milliseconds.\n")
            except Exception as e:  # bench modes trap and continue
                print(f"\n{name.capitalize()} Alignment Benchmark Failed:\n")
                print(e)

    return 0


if __name__ == "__main__":
    sys.exit(main())
