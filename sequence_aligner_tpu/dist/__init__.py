from sequence_aligner_tpu.dist.init import (
    distributed_mesh, initialize_distributed, process_local_block,
)

__all__ = [
    "initialize_distributed", "distributed_mesh", "process_local_block",
]
