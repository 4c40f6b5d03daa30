"""Utilities: chunked maps, profiling, checkpointing, metrics, debug flags."""

from trex_tpu.utils.chunking import chunked_map
from trex_tpu.utils.profiling import Timer, profile_trace, timed
from trex_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint
from trex_tpu.utils.metrics import MetricsLogger
from trex_tpu.utils.debug import enable_nan_checks

__all__ = [
    "chunked_map",
    "Timer",
    "profile_trace",
    "timed",
    "save_checkpoint",
    "restore_checkpoint",
    "MetricsLogger",
    "enable_nan_checks",
]
