"""sequence_aligner_tpu — a TPU-native genome-assembly overlap engine.

A from-scratch JAX/XLA/Pallas re-expression of the capabilities of the
rohit507/Sequence-Aligner reference (an AMOS/Minimus ``hash-overlap``
replacement): FASTA ingestion, 2-bit-packed k-mer extraction (k <= 16),
positional (edge/middle) k-mer collision candidate generation, batched
affine-gap banded dovetail alignment, and AMOS ``{OVL}`` record emission.

Layer map (mirrors SURVEY.md section 1, rebuilt TPU-first):

  core/      immutable config, result records, scoring matrices
  io/        FASTA/.seq reader, HOXD readers, OVL writer, AMOS message reader
  oracle/    NumPy reference-semantics implementations (golden parity anchors)
  ops/       jitted device ops: encode, kmer, pairgen, DP aligners (lax+Pallas)
  models/    aligner families + the end-to-end Overlapper engine
  parallel/  mesh/sharding: data-parallel reads, hash-prefix all-to-all
  pipeline/  AMOS toolchain driver (toAmos_new -> ... -> bank2fasta), datasets
  utils/     timers, debug logging, profiling hooks
"""

__version__ = "0.1.0"

from sequence_aligner_tpu.core.settings import AlignSettings  # noqa: F401
