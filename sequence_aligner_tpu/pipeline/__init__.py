from sequence_aligner_tpu.pipeline.datasets import shred_genome, c_ruddii_reads
from sequence_aligner_tpu.pipeline.driver import run_amos_pipeline, PipelineResult

__all__ = [
    "shred_genome", "c_ruddii_reads", "run_amos_pipeline", "PipelineResult",
]
