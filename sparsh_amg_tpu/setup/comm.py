"""Host-side collective primitives for the blocked (per-host) setup.

The reference's setup phase coarsens under MPI with point-to-point
boundary exchanges (SURVEY.md §3.2 "MPI boundary negotiation in parallel
runs").  The blocked setup in :mod:`setup.blocked` is written SPMD
against this small interface; two implementations exist:

* :class:`ThreadComm` — N ranks as threads of one process with barrier-
  synchronised slot exchange.  The TEST harness: runs the identical SPMD
  code with real concurrency (numpy and the native OpenMP kernels drop
  the GIL) and no process-spawn cost, so bit-identity against the global
  setup is assertable in pytest.
* :class:`GlooComm` — real process boundaries through the
  ``jax.distributed`` runtime (``multihost_utils.process_allgather`` over
  the gloo CPU collectives / ICI on pods).  Used by the multi-process
  workers (`parallel.multihost`).

The blocked algorithms only ever exchange BOUNDARY data (ghost rows,
halo C/F states, prefix counts), so allgather-based transport is cheap at
the host counts this targets; on a pod the same interface can be backed
by point-to-point DCN sends without touching the algorithms.
"""
from __future__ import annotations

import pickle
import threading

import numpy as np


class BlockComm:
    """SPMD collective interface: ``rank``, ``size``, and two collectives.

    ``allgather(obj)`` -> list of every rank's object (indexed by rank).
    ``alltoall(parts)`` -> list where out[j] is rank j's ``parts[self.rank]``
    — i.e. parts[d] is addressed to rank d.
    """
    rank: int
    size: int

    def allgather(self, obj):
        raise NotImplementedError

    def alltoall(self, parts: list) -> list:
        assert len(parts) == self.size
        gathered = self.allgather(parts)
        return [gathered[src][self.rank] for src in range(self.size)]

    # -- common reductions (small scalars / arrays) -----------------------
    def allreduce_sum(self, value):
        vals = self.allgather(value)
        out = vals[0]
        for v in vals[1:]:
            out = out + v
        return out

    def allreduce_max(self, value):
        return max(self.allgather(value))


class _ThreadGroup:
    def __init__(self, size: int):
        self.size = size
        self.slots = [None] * size
        self.barrier = threading.Barrier(size)


class ThreadComm(BlockComm):
    """N simulated hosts as threads with barrier-synchronised exchange."""

    def __init__(self, group: _ThreadGroup, rank: int):
        self._g = group
        self.rank = rank
        self.size = group.size

    def allgather(self, obj):
        g = self._g
        if g.size == 1:
            return [obj]
        g.slots[self.rank] = obj
        g.barrier.wait()            # all writes visible
        out = list(g.slots)
        g.barrier.wait()            # all reads done before slot reuse
        return out


def run_blocked(fn, n_blocks: int):
    """Run ``fn(rank, comm)`` on ``n_blocks`` simulated hosts (threads);
    returns the per-rank results.  An exception on any rank aborts the
    barrier so the others unblock, and is re-raised."""
    if n_blocks == 1:
        return [fn(0, ThreadComm(_ThreadGroup(1), 0))]
    group = _ThreadGroup(n_blocks)
    results = [None] * n_blocks
    errors = []

    def worker(r):
        try:
            results[r] = fn(r, ThreadComm(group, r))
        except BaseException as e:          # noqa: BLE001 — re-raised below
            errors.append((r, e))
            group.barrier.abort()

    threads = [threading.Thread(target=worker, args=(r,), daemon=True)
               for r in range(n_blocks)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for r, e in errors:
        if not isinstance(e, threading.BrokenBarrierError):
            raise RuntimeError(f"blocked-setup rank {r} failed") from e
    if errors:
        raise RuntimeError("blocked setup aborted") from errors[0][1]
    return results


class GlooComm(BlockComm):
    """Cross-process collectives through the jax.distributed runtime.

    Objects are pickled to uint8 payloads, padded to a shared power-of-two
    length (bounds the number of compiled all_gather shapes), gathered
    with ``multihost_utils.process_allgather``, and unpickled.
    """

    def __init__(self):
        import jax
        self.rank = jax.process_index()
        self.size = jax.process_count()

    @staticmethod
    def _pad_len(n: int) -> int:
        m = 1024
        while m < n:
            m <<= 1
        return m

    def allgather(self, obj):
        if self.size == 1:
            return [obj]
        from jax.experimental import multihost_utils as mhu
        payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
        sizes = np.asarray(
            mhu.process_allgather(np.asarray([payload.size], np.int64)))
        sizes = sizes.reshape(-1)
        cap = self._pad_len(int(sizes.max()))
        buf = np.zeros(cap, dtype=np.uint8)
        buf[: payload.size] = payload
        stacked = np.asarray(mhu.process_allgather(buf))
        return [pickle.loads(stacked[r, : sizes[r]].tobytes())
                for r in range(self.size)]
