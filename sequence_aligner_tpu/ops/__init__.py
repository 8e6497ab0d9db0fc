from sequence_aligner_tpu.ops.encode import encode_reads, pack_2bit
from sequence_aligner_tpu.ops.kmer import kmer_scan
from sequence_aligner_tpu.ops.pairgen import (
    candidate_pairs_stream, plan_totals, plan_totals_device,
)

__all__ = [
    "encode_reads", "pack_2bit", "kmer_scan",
    "candidate_pairs_stream", "plan_totals", "plan_totals_device",
]
