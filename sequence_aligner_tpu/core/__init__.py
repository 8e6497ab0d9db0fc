from sequence_aligner_tpu.core.settings import AlignSettings
from sequence_aligner_tpu.core.records import Sequence, AlignmentResult, OverlapRecord

__all__ = ["AlignSettings", "Sequence", "AlignmentResult", "OverlapRecord"]
