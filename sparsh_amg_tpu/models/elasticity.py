"""2-D linear elasticity (plane stress) Q1 FEM on a structured grid.

The reference's elasticity systems come from its FEM client (ParMooN); here a
self-contained Q1 bilinear-quad assembly produces the same class of SPD
block system (2 dofs per node), used for convergence testing of AMG on
systems of PDEs (BASELINE north star: "Poisson/elasticity test matrices").
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def _q1_elasticity_element(E: float, nu: float) -> np.ndarray:
    """8x8 element stiffness for a unit square Q1 element, plane stress,
    2x2 Gauss quadrature.  Dof order: (ux0, uy0, ux1, uy1, ...) for nodes
    (0,0),(1,0),(1,1),(0,1)."""
    D = (E / (1 - nu * nu)) * np.array(
        [[1, nu, 0], [nu, 1, 0], [0, 0, (1 - nu) / 2]]
    )
    gp = np.array([-1, 1]) / np.sqrt(3.0)
    Ke = np.zeros((8, 8))
    # shape function derivatives on [-1,1]^2 for nodes in CCW order
    def dshape(xi, eta):
        dN_dxi = 0.25 * np.array(
            [-(1 - eta), (1 - eta), (1 + eta), -(1 + eta)])
        dN_deta = 0.25 * np.array(
            [-(1 - xi), -(1 + xi), (1 + xi), (1 - xi)])
        return dN_dxi, dN_deta
    for xi in gp:
        for eta in gp:
            dN_dxi, dN_deta = dshape(xi, eta)
            # unit square element: J = diag(1/2, 1/2), detJ = 1/4
            dN_dx = dN_dxi * 2.0
            dN_dy = dN_deta * 2.0
            B = np.zeros((3, 8))
            B[0, 0::2] = dN_dx
            B[1, 1::2] = dN_dy
            B[2, 0::2] = dN_dy
            B[2, 1::2] = dN_dx
            Ke += B.T @ D @ B * 0.25
    return Ke


def elasticity2d_nullspace(nx: int, ny: int | None = None) -> np.ndarray:
    """The three 2-D rigid-body modes — translations (1,0), (0,1) and the
    in-plane rotation (-y, x) — evaluated at the free dofs of
    :func:`elasticity2d` (same clamping/elimination).  This is the
    near-nullspace basis smoothed aggregation needs for grid-independent
    convergence on elasticity (Vanek/Mandel/Brezina 1996)."""
    ny = nx if ny is None else ny
    nnx, nny = nx + 1, ny + 1
    iy, ix = np.meshgrid(np.arange(nny), np.arange(nnx), indexing="ij")
    x = ix.ravel() / nx
    y = iy.ravel() / ny
    n_nodes = nnx * nny
    B = np.zeros((2 * n_nodes, 3))
    B[0::2, 0] = 1.0      # x-translation -> ux dofs
    B[1::2, 1] = 1.0      # y-translation -> uy dofs
    B[0::2, 2] = -y       # rotation
    B[1::2, 2] = x
    clamped = np.zeros(2 * n_nodes, dtype=bool)
    left_nodes = np.arange(nny) * nnx
    clamped[2 * left_nodes] = True
    clamped[2 * left_nodes + 1] = True
    return B[~clamped]


def elasticity2d(nx: int, ny: int | None = None, E: float = 1e5,
                 nu: float = 0.3, dtype=np.float64) -> sp.csr_matrix:
    """Assemble plane-stress elasticity on an nx-by-ny element grid, with the
    left edge clamped (Dirichlet rows/cols eliminated).  Returns SPD CSR of
    size 2*(nx)*(ny+1) ... after elimination."""
    ny = nx if ny is None else ny
    nnx, nny = nx + 1, ny + 1          # nodes per direction
    Ke = _q1_elasticity_element(E, nu)
    rows, cols, vals = [], [], []
    for ey in range(ny):
        for ex in range(nx):
            n0 = ey * nnx + ex
            nodes = [n0, n0 + 1, n0 + 1 + nnx, n0 + nnx]
            dofs = np.array([[2 * n, 2 * n + 1] for n in nodes]).ravel()
            r, c = np.meshgrid(dofs, dofs, indexing="ij")
            rows.append(r.ravel())
            cols.append(c.ravel())
            vals.append(Ke.ravel())
    n_dof = 2 * nnx * nny
    A = sp.coo_matrix(
        (np.concatenate(vals).astype(dtype),
         (np.concatenate(rows), np.concatenate(cols))),
        shape=(n_dof, n_dof),
    ).tocsr()
    # clamp left edge (ix == 0): eliminate those dofs
    clamped = np.zeros(n_dof, dtype=bool)
    left_nodes = np.arange(nny) * nnx
    clamped[2 * left_nodes] = True
    clamped[2 * left_nodes + 1] = True
    keep = np.where(~clamped)[0]
    A = A[keep][:, keep].tocsr()
    A.sum_duplicates()
    A.eliminate_zeros()
    return A
