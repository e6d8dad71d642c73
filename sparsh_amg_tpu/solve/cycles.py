"""Multigrid cycle drivers (SURVEY.md §2 C18, §3.3).

V/W/F cycles are unrolled over the (static) hierarchy at trace time: the
whole cycle becomes one XLA computation with no data-dependent control flow.
The recursion mirrors the reference's `vcycle(l, b, x)` exactly; W recurses
twice, F recurses F-then-V (the classical definitions).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.formats import spmv, residual
from .smoothers import smooth


def _cycle(levels, l, b, x, params, shape):
    lev = levels[l]
    if lev.P is None or l == len(levels) - 1:
        # dense-inverse coarsest solve; DeviceLevel applies it locally,
        # DistLevel agglomerates via all_gather first (C17/C24)
        return lev.coarse_solve(b)
    # pre-smooth (x may be a known-zero start)
    zero0 = x is None
    coarse = l >= params.cheby_coarse_from
    x = smooth(lev, b, jnp.zeros_like(b) if zero0 else x, params,
               zero_start=zero0, sweeps=params.nu1, coarse=coarse)
    # coarse-grid correction
    r = residual(lev.A, x, b)
    rc = spmv(lev.R, r)
    if shape == "V":
        ec = _cycle(levels, l + 1, rc, None, params, "V")
    elif shape == "W":
        ec = _cycle(levels, l + 1, rc, None, params, "W")
        ec = _cycle(levels, l + 1, rc, ec, params, "W")
    elif shape == "F":
        ec = _cycle(levels, l + 1, rc, None, params, "F")
        ec = _cycle(levels, l + 1, rc, ec, params, "V")
    else:
        raise ValueError(f"unknown cycle {shape!r}")
    x = x + spmv(lev.P, ec)
    # post-smooth (backward direction for direction-dependent smoothers,
    # keeping the cycle symmetric as a PCG preconditioner)
    x = smooth(lev, b, x, params, zero_start=False, sweeps=params.nu2,
               backward=True, coarse=coarse)
    return x


def make_cycle(params):
    """Return cycle(levels, b [, x0]) applying one AMG cycle as M^-1 b.

    `levels` is the DeviceHierarchy.levels tuple (a pytree argument, so the
    jitted cycle is reusable across hierarchies of identical structure).
    """
    shape = params.cycle

    def cycle(levels, b, x0=None):
        return _cycle(levels, 0, b, x0, params, shape)

    return cycle
