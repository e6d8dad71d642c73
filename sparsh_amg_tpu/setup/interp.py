"""Interpolation operator construction (SURVEY.md §2 C12).

Classical direct interpolation with +/- splitting (BoomerAMG convention):
for an F-point i and strong C-neighbour j,
    w_ij = -alpha * a_ij / d_ii   (a_ij < 0),   alpha = sum(neg offdiag)/sum(neg over C_i)
    w_ij = -beta  * a_ij / d_ii   (a_ij > 0),   beta likewise for positive parts;
if no positive C connections exist, positive off-diagonal mass is lumped into
the diagonal d_ii.  C-points use injection.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from .._native import get_lib, csr_arrays
from .splitting import CPT


def direct_interpolation(A: sp.csr_matrix, strong_mask: np.ndarray,
                         cf: np.ndarray) -> sp.csr_matrix:
    """Build P (n x n_coarse) from A, the strength mask, and a C/F split."""
    n = A.shape[0]
    is_c = cf == CPT
    n_c = int(is_c.sum())
    cmap = np.cumsum(is_c, dtype=np.int64) - 1  # coarse index of each C-point
    cmap32 = cmap.astype(np.int32)

    lib = get_lib()
    if lib is not None:
        indptr, indices, data = csr_arrays(A)
        cap = len(indices) + n
        P_indptr = np.empty(n + 1, dtype=np.int64)
        P_indices = np.empty(cap, dtype=np.int32)
        P_data = np.empty(cap, dtype=np.float64)
        nnz = lib.direct_interp(
            n, indptr, indices, data,
            np.ascontiguousarray(strong_mask, dtype=np.uint8),
            np.ascontiguousarray(cf, dtype=np.int8), cmap32,
            P_indptr, P_indices, P_data)
        return sp.csr_matrix(
            (P_data[:nnz], P_indices[:nnz], P_indptr), shape=(n, n_c))

    return _direct_interp_numpy(A, strong_mask, cf, cmap, n_c)


def truncate_rows(P: sp.csr_matrix, max_per_row: int) -> sp.csr_matrix:
    """Interpolation truncation (hypre's P_max_elmts): keep the
    `max_per_row` largest-|w| entries per row, rescaling so the positive
    and negative row sums are separately preserved.  This is what keeps
    Galerkin operator complexity bounded on 3-D problems — without it
    RS+direct RAP densifies (~270 nnz/row observed at level 5 on a 64^3
    Poisson)."""
    if max_per_row <= 0 or P.nnz == 0:
        return P
    nnzr = np.diff(P.indptr)
    if nnzr.max() <= max_per_row:
        return P
    n = P.shape[0]
    rows = np.repeat(np.arange(n, dtype=np.int64), nnzr)
    # rank within rows via a padded (n, K) slot table + per-row argsort —
    # K is small (max nnz/row), so this is O(n K log K) with short C sorts
    # instead of one global lexsort over every nnz
    K = int(nnzr.max())
    slot = np.arange(P.nnz, dtype=np.int64) - np.repeat(
        P.indptr[:-1].astype(np.int64), nnzr)
    table = np.zeros((n, K))
    table[rows, slot] = np.abs(P.data)
    top = np.argsort(-table, axis=1, kind="stable")[:, :max_per_row]
    keep2d = np.zeros((n, K), dtype=bool)
    keep2d[np.arange(n)[:, None], top] = True
    keep = keep2d[rows, slot]

    def rowsum(mask):
        out = np.zeros(n)
        np.add.at(out, rows, np.where(mask, P.data, 0.0))
        return out

    pos, neg = P.data > 0, P.data < 0
    with np.errstate(divide="ignore", invalid="ignore"):
        s_pos = rowsum(pos) / rowsum(pos & keep)
        s_neg = rowsum(neg) / rowsum(neg & keep)
    s_pos = np.where(np.isfinite(s_pos), s_pos, 1.0)
    s_neg = np.where(np.isfinite(s_neg), s_neg, 1.0)
    data = np.where(pos, P.data * s_pos[rows], P.data * s_neg[rows])[keep]
    out = sp.csr_matrix((data, P.indices[keep],
                         np.concatenate([[0], np.cumsum(
                             np.bincount(rows[keep], minlength=n))])),
                        shape=P.shape)
    return out


def _direct_interp_numpy(A, strong_mask, cf, cmap, n_c):
    """Vectorized numpy fallback (same formula as the native kernel)."""
    n = A.shape[0]
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
    dmask = A.indices == rows
    is_c_col = cf[A.indices] == CPT
    offdiag = ~dmask
    neg, pos = A.data < 0, A.data > 0
    interp_entry = strong_mask & is_c_col & offdiag

    def rowsum(m):
        out = np.zeros(n)
        np.add.at(out, rows, np.where(m, A.data, 0.0))
        return out

    diag = rowsum(dmask)
    sum_neg_all = rowsum(offdiag & neg)
    sum_pos_all = rowsum(offdiag & pos)
    sum_neg_C = rowsum(interp_entry & neg)
    sum_pos_C = rowsum(interp_entry & pos)

    with np.errstate(divide="ignore", invalid="ignore"):
        alpha = np.where(sum_neg_C != 0, sum_neg_all / sum_neg_C, 0.0)
        beta = np.where(sum_pos_C != 0, sum_pos_all / sum_pos_C, 0.0)
    diag = diag + np.where(sum_pos_C == 0, sum_pos_all, 0.0)

    coef = np.where(A.data < 0, alpha[rows], beta[rows])
    with np.errstate(divide="ignore", invalid="ignore"):
        w = np.where(diag[rows] != 0, -coef * A.data / diag[rows], 0.0)

    keep = interp_entry & (w != 0) & (cf[rows] != CPT)
    # F-point rows
    f_rows = rows[keep]
    f_cols = cmap[A.indices[keep]]
    f_vals = w[keep]
    # C-point injection rows
    c_idx = np.where(cf == CPT)[0]
    P = sp.coo_matrix(
        (np.concatenate([f_vals, np.ones(len(c_idx))]),
         (np.concatenate([f_rows, c_idx]),
          np.concatenate([f_cols, cmap[c_idx]]))),
        shape=(n, n_c)).tocsr()
    P.sum_duplicates()
    return P
