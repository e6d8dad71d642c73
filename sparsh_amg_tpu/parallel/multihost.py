"""Multi-host initialization (SURVEY.md §5.8: the reference launches one
MPI rank per GPU across nodes; the TPU-native equivalent is
`jax.distributed.initialize()` + a mesh spanning every host's chips).

On a pod slice each host runs the same program; after `init_multihost()`
`jax.devices()` returns the global device list and the solvers in this
package work unchanged — `DistAMGSolver(A, mesh=global_mesh(...))` row-
shards across the whole slice, halo `ppermute`s ride ICI within a host and
DCN between hosts through the same collectives.

Untestable in this single-host container; exercised logically by the
8-virtual-device CPU mesh tests (SURVEY.md §4.4).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Initialize the JAX distributed runtime (no-op if single-process).

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters (the reference's mpirun
    analog: one process per host).
    """
    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "rows") -> Mesh:
    """1-D mesh over every device of every participating host."""
    return Mesh(np.array(jax.devices()), (axis,))
