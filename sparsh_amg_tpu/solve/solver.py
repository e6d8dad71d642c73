"""Top-level solver (SURVEY.md §3.1 `solve()` — the reference's flagship
entry: AMG-preconditioned Krylov with convergence control).

Architecture (the TPU analogue of the reference's "setup on CPU / solve on
GPU" hybrid strategy, SURVEY.md §3.5): the hierarchy is built on the host in
float64, frozen into padded fp32 device layouts, and the whole Krylov loop
runs as one jitted XLA computation.  Because 1e-8 relative residual sits
below fp32 roundoff, the outer driver wraps the fp32 AMG-Krylov solve in
mixed-precision iterative refinement with df64 residuals (device-side, no
host round-trips of the vectors).
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..params import AMGParams, KrylovParams
from ..setup.hierarchy import amg_setup, Hierarchy
from ..ops import df64
from ..ops.formats import spmv
from ..ops.df64_ops import csr_to_df64, residual_df64
from .device import to_device, DeviceHierarchy
from .cycles import make_cycle
from .krylov import pcg, bicgstab


@dataclasses.dataclass
class SolveResult:
    x: np.ndarray              # solution, float64
    converged: bool
    relres: float              # final TRUE relative residual (df64/f64)
    iterations: int            # total inner Krylov iterations
    refine_passes: int
    setup_time: float
    solve_time: float
    history: list              # per-pass (inner_iters, relres after pass)

    def __repr__(self):
        return (f"SolveResult(converged={self.converged}, "
                f"relres={self.relres:.3e}, iters={self.iterations}, "
                f"passes={self.refine_passes}, setup={self.setup_time:.3f}s, "
                f"solve={self.solve_time:.3f}s)")


class AMGSolver:
    """Reusable AMG-preconditioned Krylov solver for a fixed matrix.

    >>> solver = AMGSolver(A)           # host CSR, float64
    >>> res = solver.solve(b)           # b float64, returns SolveResult
    """

    def __init__(self, A: sp.csr_matrix, params: AMGParams | None = None,
                 krylov: KrylovParams | None = None):
        self.params = params or AMGParams()
        self.krylov = krylov or KrylovParams()
        t0 = time.perf_counter()
        A = A.tocsr()
        self.A_host = A
        self.n = A.shape[0]
        self.hierarchy: Hierarchy = amg_setup(A, self.params)
        self.device: DeviceHierarchy = to_device(self.hierarchy, self.params)
        self.n_pad = self.device.levels[0].n_pad
        # df64 fine-level operator for refinement residuals
        self.A_df = csr_to_df64(A, prefer_dia=self.params.prefer_dia,
                                dia_max_bands=self.params.dia_max_bands)
        self._build_jitted()
        self.setup_time = time.perf_counter() - t0

    # -- jitted kernels ----------------------------------------------------
    def _build_jitted(self):
        cycle = make_cycle(self.params)
        kr = self.krylov
        inner = pcg if kr.method == "cg" else bicgstab

        def inner_solve(levels, b, tol, maxiter):
            A0 = levels[0].A
            mv = lambda v: spmv(A0, v)
            pc = lambda r: cycle(levels, r)
            return inner(mv, pc, b, tol=tol, maxiter=maxiter,
                         compensated=kr.compensated_dots)

        self._inner_solve = jax.jit(inner_solve, static_argnames=("maxiter",),
                                    donate_argnums=())

        def refine_step(levels, Adf, b_hi, b_lo, x_hi, x_lo, tol, maxiter):
            """One IR pass: df64 residual, fp32 inner solve, df64 update."""
            r_hi, r_lo = residual_df64(Adf, b_hi, b_lo, x_hi, x_lo)
            rn_hi, rn_lo = df64.norm2_sq(r_hi)
            d, iters, inner_rel = inner_solve(levels, r_hi, tol, maxiter)
            x_hi, x_lo = df64.add(x_hi, x_lo, d, jnp.zeros_like(d))
            return x_hi, x_lo, rn_hi + rn_lo, iters

        self._refine_step = jax.jit(refine_step,
                                    static_argnames=("maxiter",))

        def true_resnorm(Adf, b_hi, b_lo, x_hi, x_lo):
            r_hi, r_lo = residual_df64(Adf, b_hi, b_lo, x_hi, x_lo)
            rn_hi, rn_lo = df64.norm2_sq(r_hi)
            return rn_hi + rn_lo

        self._true_resnorm = jax.jit(true_resnorm)

    def _pad(self, v: np.ndarray) -> np.ndarray:
        out = np.zeros(self.n_pad, dtype=np.float64)
        out[: self.n] = v
        return out

    # -- public API ----------------------------------------------------------
    def solve(self, b: np.ndarray, tol: float | None = None,
              maxiter: int | None = None) -> SolveResult:
        kr = self.krylov
        tol = kr.tol if tol is None else tol
        maxiter = kr.maxiter if maxiter is None else maxiter
        t0 = time.perf_counter()
        b = np.asarray(b, dtype=np.float64)
        bpad = self._pad(b)
        bnorm = float(np.linalg.norm(bpad))
        if bnorm == 0.0:
            return SolveResult(np.zeros(self.n), True, 0.0, 0, 0,
                               self.setup_time, 0.0, [])
        b_hi_np, b_lo_np = df64.from_f64_np(bpad)
        b_hi = jnp.asarray(b_hi_np)
        b_lo = jnp.asarray(b_lo_np)
        levels = self.device.levels
        history = []
        total_iters = 0

        if not kr.refine:
            x, iters, relres = self._inner_solve(levels, b_hi, tol, maxiter)
            x = np.asarray(jax.device_get(x), dtype=np.float64)[: self.n]
            relres = float(relres)
            return SolveResult(x, relres <= tol, relres, int(iters), 1,
                               self.setup_time, time.perf_counter() - t0,
                               [(int(iters), relres)])

        x_hi = jnp.zeros(self.n_pad, dtype=jnp.float32)
        x_lo = jnp.zeros(self.n_pad, dtype=jnp.float32)
        converged = False
        passes = 0
        relres = 1.0
        for _ in range(kr.max_refine):
            budget = maxiter - total_iters
            if budget <= 0:
                break
            x_hi, x_lo, rnsq, iters = self._refine_step(
                levels, self.A_df, b_hi, b_lo, x_hi, x_lo,
                max(kr.inner_tol, tol / max(relres, 1e-30) * 0.1),
                maxiter)
            passes += 1
            total_iters += int(iters)
            # true residual after the update
            rnsq_after = float(self._true_resnorm(
                self.A_df, b_hi, b_lo, x_hi, x_lo))
            relres = float(np.sqrt(max(rnsq_after, 0.0))) / bnorm
            history.append((int(iters), relres))
            if relres <= tol:
                converged = True
                break
        x = df64.to_f64_np(jax.device_get(x_hi),
                           jax.device_get(x_lo))[: self.n]
        return SolveResult(x, converged, relres, total_iters, passes,
                           self.setup_time, time.perf_counter() - t0, history)


def solve(A: sp.csr_matrix, b: np.ndarray,
          params: AMGParams | None = None,
          krylov: KrylovParams | None = None, **kw) -> SolveResult:
    """One-shot convenience wrapper: setup + solve (reference `solve()`)."""
    return AMGSolver(A, params, krylov).solve(b, **kw)
