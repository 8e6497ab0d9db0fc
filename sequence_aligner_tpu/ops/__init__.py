from sequence_aligner_tpu.ops.encode import encode_reads, pack_2bit
from sequence_aligner_tpu.ops.kmer import kmer_scan
from sequence_aligner_tpu.ops.pairgen import candidate_pairs_device
from sequence_aligner_tpu.ops.align_lax import fast_dovetail_batch, local_align_batch

__all__ = [
    "encode_reads", "pack_2bit", "kmer_scan", "candidate_pairs_device",
    "fast_dovetail_batch", "local_align_batch",
]
