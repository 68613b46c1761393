from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .profiler import time_jitted, trace

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
    "time_jitted",
    "trace",
]
