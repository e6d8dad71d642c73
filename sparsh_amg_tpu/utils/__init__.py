from .timing import Timer, benchmark_op
from .logging import get_logger, iteration_log

__all__ = ["Timer", "benchmark_op", "get_logger", "iteration_log"]
