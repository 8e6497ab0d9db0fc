"""Multi-process overlap worker.

One process per host (or per simulated host).  Every process:

  1. joins the jax.distributed cluster (DCN coordination);
  2. builds the process-spanning mesh (devices of all processes);
  3. reads the input FASTA (metadata is cheap; each process keeps only
     its device rows on device);
  4. runs the sharded overlap step (parallel.shard) over the global mesh —
     hash-prefix and pair-key all-to-alls cross process boundaries over
     DCN exactly as they cross chips over ICI;
  5. process 0 gathers the valid records and writes the `.ovl` file.

Usage (one line per process):

  python -m sequence_aligner_tpu.dist.worker \
      --coordinator HOST:PORT --nprocs N --pid I \
      -i reads.seq -o out.ovl [--cpu-devices M] [--kmer-size K] ...

The reference has no multi-node capability (SURVEY.md section 2.6);
this is the net-new DCN layer of the TPU-native framework.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--nprocs", type=int, default=None)
    ap.add_argument("--pid", type=int, default=None)
    ap.add_argument("--cpu-devices", type=int, default=None,
                    help="force N virtual CPU devices per process (simulation)")
    ap.add_argument("-i", "--input", required=True)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--amos-parity", action="store_true")
    ap.add_argument("--kmer-size", type=int, default=12)
    ap.add_argument("--min-collisions", type=int, default=None)
    ap.add_argument(
        "--cap", action="append", default=[], metavar="NAME=N",
        help="static capacity override (cap_route, cap_head, cap_tail, "
             "cap_agg, cap_pair_route, cap_out); repeatable",
    )
    args = ap.parse_args(argv)
    caps = {}
    for spec in args.cap:
        name, _, val = spec.partition("=")
        caps[name] = int(val)

    import os

    if args.cpu_devices:
        os.environ["JAX_PLATFORMS"] = "cpu"

    from sequence_aligner_tpu.dist.init import (
        distributed_mesh, initialize_distributed,
    )

    initialize_distributed(
        args.coordinator, args.nprocs, args.pid,
        local_device_count=args.cpu_devices,
    )
    import jax

    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
    mesh = distributed_mesh()

    from sequence_aligner_tpu.core.settings import AlignSettings
    from sequence_aligner_tpu.io.fasta import read_fasta
    from sequence_aligner_tpu.io.ovl import write_ovl
    from sequence_aligner_tpu.parallel.shard import sharded_overlap

    kw = {"kmer_size": args.kmer_size}
    if args.min_collisions is not None:
        kw["min_collisions"] = args.min_collisions
    s = AlignSettings.amos_parity(**kw) if args.amos_parity else AlignSettings(**kw)

    seqs = read_fasta(args.input)
    recs = sharded_overlap(seqs, s, mesh, caps=caps or None)
    if jax.process_index() == 0:
        write_ovl(recs, args.output)
        print(f"# wrote {len(recs)} overlaps across "
              f"{jax.process_count()} processes / "
              f"{len(jax.devices())} devices", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
