"""Utilities: benchmarking, profiling, and test-data helpers."""

from .bench import timeit_op, device_memory_stats, reference_workload
from .profile import trace, annotate
from .export import (
    export_fn,
    load_exported,
    load_exported_file,
    save_exported,
)

__all__ = [
    "timeit_op",
    "device_memory_stats",
    "reference_workload",
    "trace",
    "annotate",
    "export_fn",
    "load_exported",
    "load_exported_file",
    "save_exported",
]
