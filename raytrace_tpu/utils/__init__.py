"""Utilities: profiling, run records, debug gates."""

from . import cache, profiling, runrecord
from .cache import enable_compilation_cache
from .profiling import ray_steps_per_sec
from .runrecord import write_run_record

__all__ = ["cache", "enable_compilation_cache", "profiling",
           "ray_steps_per_sec", "runrecord", "write_run_record"]
