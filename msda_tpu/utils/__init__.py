"""Utilities: benchmarking, profiling, and test-data helpers."""

from .bench import timeit_op, device_memory_stats
from .profile import trace, annotate

__all__ = ["timeit_op", "device_memory_stats", "trace", "annotate"]
