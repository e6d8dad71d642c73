"""Device solve phase (SURVEY.md §1 L4-L5).

Smoothers, V/W/F cycle drivers, coarsest-level solver, and Krylov wrappers
(PCG/BiCGStab), all jit-compiled over a statically-shaped device hierarchy.
"""
from .device import DeviceLevel, DeviceHierarchy, to_device
from .smoothers import jacobi, l1_jacobi, chebyshev, two_stage_gs
from .cycles import make_cycle
from .krylov import pcg, bicgstab, pcg_chunk, bicgstab_chunk
from .solver import AMGSolver, solve

__all__ = [
    "DeviceLevel", "DeviceHierarchy", "to_device",
    "jacobi", "l1_jacobi", "chebyshev", "two_stage_gs",
    "make_cycle", "pcg", "bicgstab", "pcg_chunk", "bicgstab_chunk",
    "AMGSolver", "solve",
]
