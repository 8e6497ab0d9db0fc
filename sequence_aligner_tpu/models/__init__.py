from sequence_aligner_tpu.models.overlapper import Overlapper

__all__ = ["Overlapper"]
