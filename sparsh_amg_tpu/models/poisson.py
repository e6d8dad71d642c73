"""Poisson model problems (reference: 2D 5-point / 3D 7-point FD stencils,
SURVEY.md §2 C3; BASELINE.json configs 0, 1, 4)."""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def _lap1d(n: int, dtype=np.float64) -> sp.csr_matrix:
    """1-D Dirichlet Laplacian tridiag(-1, 2, -1), n interior points."""
    e = np.ones(n, dtype=dtype)
    return sp.diags([-e[:-1], 2 * e, -e[:-1]], [-1, 0, 1], format="csr")


def poisson2d(nx: int, ny: int | None = None, dtype=np.float64) -> sp.csr_matrix:
    """2-D 5-point Poisson on an nx-by-ny interior grid (row-major, y fastest
    in memory along x: index = iy*nx + ix).  Matches the standard FD stencil
    [[0,-1,0],[-1,4,-1],[0,-1,0]]."""
    ny = nx if ny is None else ny
    Ix = sp.identity(nx, dtype=dtype, format="csr")
    Iy = sp.identity(ny, dtype=dtype, format="csr")
    A = (sp.kron(Iy, _lap1d(nx, dtype)) + sp.kron(_lap1d(ny, dtype), Ix)).tocsr()
    A.eliminate_zeros()
    return A


def poisson3d(nx: int, ny: int | None = None, nz: int | None = None,
              dtype=np.float64) -> sp.csr_matrix:
    """3-D 7-point Poisson on an nx*ny*nz interior grid
    (index = (iz*ny + iy)*nx + ix)."""
    ny = nx if ny is None else ny
    nz = nx if nz is None else nz
    Ix = sp.identity(nx, dtype=dtype, format="csr")
    Iy = sp.identity(ny, dtype=dtype, format="csr")
    Iz = sp.identity(nz, dtype=dtype, format="csr")
    A = (sp.kron(Iz, sp.kron(Iy, _lap1d(nx, dtype)))
         + sp.kron(Iz, sp.kron(_lap1d(ny, dtype), Ix))
         + sp.kron(_lap1d(nz, dtype), sp.kron(Iy, Ix))).tocsr()
    A.eliminate_zeros()
    return A
