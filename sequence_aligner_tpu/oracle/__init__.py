from sequence_aligner_tpu.oracle.align import (
    local_alignment, fast_dovetail_alignment, DUD,
)
from sequence_aligner_tpu.oracle.kmers import (
    seq_hash, generate_kmers, KmerTableOracle,
)
from sequence_aligner_tpu.oracle.overlap import oracle_overlaps

__all__ = [
    "local_alignment", "fast_dovetail_alignment", "DUD",
    "seq_hash", "generate_kmers", "KmerTableOracle", "oracle_overlaps",
]
