from .timing import Timer, benchmark_op
from .logging import get_logger, iteration_log
from .io import read_matrix, write_matrix, read_rhs, write_rhs
from .meminfo import tree_device_bytes, device_memory_stats

__all__ = ["Timer", "benchmark_op", "get_logger", "iteration_log",
           "read_matrix", "write_matrix", "read_rhs", "write_rhs",
           "tree_device_bytes", "device_memory_stats"]
