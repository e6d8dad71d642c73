"""Convection-diffusion model problem (nonsymmetric).

The reference pairs BiCGStab with AMG for convective/nonsymmetric systems
(SURVEY.md §2 C20; its FEM client produces convection-diffusion operators).
Standard test: -eps*Laplace(u) + b . grad(u) on the unit square, first-order
upwind convection (keeps the matrix an M-matrix, AMG-friendly), Dirichlet
boundaries.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def convection2d(nx: int, ny: int | None = None, epsilon: float = 1e-2,
                 bx: float = 1.0, by: float = 0.5,
                 dtype=np.float64) -> sp.csr_matrix:
    """-eps*Lap(u) + (bx,by).grad(u), 5-point upwind FD on an nx-by-ny
    interior grid with h = 1/(nx+1).  Nonsymmetric for (bx,by) != 0."""
    ny = nx if ny is None else ny
    h = 1.0 / (nx + 1)
    n = nx * ny
    # diffusion part: eps/h^2 * standard 5-point
    cd = epsilon / (h * h)
    # upwind convection: for b > 0, du/dx ~ (u_i - u_{i-1})/h
    cwx_m = -bx / h if bx > 0 else 0.0        # coefficient of u_{i-1,j}
    cwx_p = bx / h if bx < 0 else 0.0         # u_{i+1,j}
    cwx_d = abs(bx) / h
    cwy_m = -by / h if by > 0 else 0.0
    cwy_p = by / h if by < 0 else 0.0
    cwy_d = abs(by) / h

    stencil = {
        (0, 0): 4 * cd + cwx_d + cwy_d,
        (-1, 0): -cd + cwx_m, (1, 0): -cd + cwx_p,
        (0, -1): -cd + cwy_m, (0, 1): -cd + cwy_p,
    }
    ix = np.arange(nx)
    iy = np.arange(ny)
    IX, IY = np.meshgrid(ix, iy)
    idx = (IY * nx + IX).ravel()
    IXf, IYf = IX.ravel(), IY.ravel()
    rows, cols, vals = [], [], []
    for (dx, dy), v in stencil.items():
        if v == 0.0:
            continue
        jx, jy = IXf + dx, IYf + dy
        m = (jx >= 0) & (jx < nx) & (jy >= 0) & (jy < ny)
        rows.append(idx[m])
        cols.append(jy[m] * nx + jx[m])
        vals.append(np.full(int(m.sum()), v, dtype=dtype))
    A = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n)).tocsr()
    A.sum_duplicates()
    return A
