"""Phase timers and kernel benchmarking (SURVEY.md §2 C25: the reference
reports wall-clock per phase and per-kernel CUDA-event timings; here
perf_counter + block_until_ready, reporting nnz/s and GFLOP/s against the
speed-of-light bound)."""
from __future__ import annotations

import time
from contextlib import contextmanager

import jax


class Timer:
    """Accumulating named phase timer."""

    def __init__(self):
        self.times: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        return "\n".join(
            f"{k:>24s}: {v:9.4f}s  (x{self.counts[k]})"
            for k, v in sorted(self.times.items()))


def benchmark_op(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    """Median wall-clock seconds of fn(*args) with block_until_ready."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples[len(samples) // 2]


def speed_of_light_spmv_nnz_per_s(hbm_bw_bytes: float,
                                  bytes_per_nnz: float = 12.0) -> float:
    """Upper bound on SpMV nnz/s: HBM bandwidth / bytes moved per nonzero
    (fp32 value + int32 column + amortized x/y traffic; DIA layouts drop the
    column index and approach 6-8 B/nnz)."""
    return hbm_bw_bytes / bytes_per_nnz
