"""Galerkin coarse operator A_coarse = R A P = P^T A P (SURVEY.md §2 C13).

The reference does the triple SpGEMM natively; here scipy's C SpGEMM does the
host-side product (the setup-phase hot spot, SURVEY.md §3.2).
"""
from __future__ import annotations

import scipy.sparse as sp


def galerkin_product(A: sp.csr_matrix, P: sp.csr_matrix) -> sp.csr_matrix:
    """Compute P^T A P, pruning explicit zeros."""
    AP = A @ P
    Ac = (P.T.tocsr() @ AP).tocsr()
    Ac.sum_duplicates()
    Ac.eliminate_zeros()
    # drop numerically negligible fill-in to keep coarse stencils compact
    return Ac
