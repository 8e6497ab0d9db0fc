from sequence_aligner_tpu.dist.init import (
    distributed_mesh, initialize_distributed,
)

__all__ = ["initialize_distributed", "distributed_mesh"]
