"""Cross-cutting utilities: profiling/tracing, caching, logging."""

from mies_tpu.utils.profiling import (
    device_sync,
    time_fn,
    trace,
    stage_costs,
    strict_numerics,
    enable_compilation_cache,
)

__all__ = [
    "device_sync",
    "time_fn",
    "trace",
    "stage_costs",
    "strict_numerics",
    "enable_compilation_cache",
]
