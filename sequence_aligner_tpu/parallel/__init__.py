from sequence_aligner_tpu.parallel.mesh import make_mesh
from sequence_aligner_tpu.parallel.shard import (
    make_sharded_align_step, make_sharded_pairs_step, sharded_overlap,
)

__all__ = [
    "make_mesh", "make_sharded_pairs_step", "make_sharded_align_step",
    "sharded_overlap",
]
