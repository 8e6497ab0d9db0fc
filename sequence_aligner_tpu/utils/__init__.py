from sequence_aligner_tpu.utils.timing import StageTimer, format_duration
from sequence_aligner_tpu.utils.debug import set_debug, printdb
from sequence_aligner_tpu.utils.profiling import (
    device_memory_stats, trace_profile, ensure_compile_cache,
)

__all__ = [
    "StageTimer", "format_duration", "set_debug", "printdb",
    "device_memory_stats", "trace_profile", "ensure_compile_cache",
]
