"""Utilities: benchmarking and test-data helpers."""

from .bench import timeit_op, device_memory_stats

__all__ = ["timeit_op", "device_memory_stats"]
