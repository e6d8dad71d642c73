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
    lib = get_lib()
    if lib is not None:
        indptr, indices, data = csr_arrays(P)
        out_nnz = int(np.minimum(nnzr, max_per_row).sum())
        O_indptr = np.empty(n + 1, dtype=np.int64)
        O_indices = np.empty(out_nnz, dtype=np.int32)
        O_data = np.empty(out_nnz, dtype=np.float64)
        lib.truncate_interp(n, indptr, indices, data, int(max_per_row),
                            O_indptr, O_indices, O_data)
        return sp.csr_matrix((O_data, O_indices, O_indptr), shape=P.shape)
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


def extpi_interpolation(A: sp.csr_matrix, strong_mask: np.ndarray,
                        cf: np.ndarray) -> sp.csr_matrix:
    """Extended+i (distance-two) interpolation.

    The standard pairing for aggressive PMIS/HMIS coarsening (De Sterck,
    Falgout, Nolting & Yang 2008; hypre interp_type 6): an F-point i
    interpolates from Ĉ_i = C^s_i ∪ (∪_{k∈F^s_i} C^s_k) — its strong
    C-neighbours plus those of its strong F-neighbours — with each strong
    F-neighbour k's connection distributed over Ĉ_i ∪ {i}:

        w_ij = -(a_ij + Σ_{k∈F^s_i} a_ik·ā_kj/d_k) / D_i
        d_k  = Σ_{l∈Ĉ_i∪{i}} ā_kl          (ā_kl: sign-opposite-to-a_kk part)
        D_i  = a_ii + Σ_{weak n} a_in + Σ_{k∈F^s_i} a_ik·ā_ki/d_k

    PMIS leaves F-points whose nearest C-point is two hops away; direct
    interpolation is too weak there, which is why RS+direct densifies
    (opC 3.4 in round 1) while PMIS+ext+i holds opC ≲ 1.6 on 3-D Poisson.
    """
    n = A.shape[0]
    is_c = cf == CPT
    n_c = int(is_c.sum())
    cmap = np.cumsum(is_c, dtype=np.int64) - 1

    lib = get_lib()
    if lib is not None:
        indptr, indices, data = csr_arrays(A)
        strong_u8 = np.ascontiguousarray(strong_mask, dtype=np.uint8)
        cf_i8 = np.ascontiguousarray(cf, dtype=np.int8)
        cmap32 = cmap.astype(np.int32)
        P_indptr = np.empty(n + 1, dtype=np.int64)
        nnz = lib.extpi_symbolic(n, indptr, indices, strong_u8, cf_i8,
                                 P_indptr)
        P_indices = np.empty(nnz, dtype=np.int32)
        P_data = np.empty(nnz, dtype=np.float64)
        lib.extpi_numeric(n, indptr, indices, data, strong_u8, cf_i8,
                          cmap32, P_indptr, P_indices, P_data)
        P = sp.csr_matrix((P_data, P_indices, P_indptr), shape=(n, n_c))
        P.eliminate_zeros()
        return P

    return _extpi_numpy(A, strong_mask, cf, cmap, n_c)


def _extpi_numpy(A, strong_mask, cf, cmap, n_c):
    """Row-loop reference implementation (test oracle; small n only)."""
    n = A.shape[0]
    indptr, indices, data = A.indptr, A.indices, A.data
    rows_out, cols_out, vals_out = [], [], []
    diag = A.diagonal()

    def row(i):
        sl = slice(indptr[i], indptr[i + 1])
        return indices[sl], data[sl], strong_mask[sl]

    for i in range(n):
        if cf[i] == CPT:
            rows_out.append(i)
            cols_out.append(cmap[i])
            vals_out.append(1.0)
            continue
        cols_i, vals_i, str_i = row(i)
        off = cols_i != i
        strongC = str_i & (cf[cols_i] == CPT)
        strongF = str_i & (cf[cols_i] != CPT) & off
        # extended C set
        chat = set(cols_i[strongC].tolist())
        for k in cols_i[strongF]:
            ck, vk, sk = row(k)
            chat.update(ck[sk & (cf[ck] == CPT)].tolist())
        if not chat:
            continue
        acc = {j: 0.0 for j in chat}
        # direct terms a_ij for j in chat
        for j, v in zip(cols_i[off], vals_i[off]):
            if j in acc:
                acc[j] += v
        D = diag[i]
        for idx in range(len(cols_i)):
            k, a_ik = cols_i[idx], vals_i[idx]
            if k == i:
                continue
            if strongF[idx]:
                ck, vk, _ = row(k)
                abar = np.where(vk * diag[k] < 0, vk, 0.0)
                in_set = np.array([(c in acc) or (c == i) for c in ck])
                d_k = abar[in_set].sum()
                if d_k == 0.0:
                    D += a_ik          # lump: k has no path back
                    continue
                f = a_ik / d_k
                for c, ab in zip(ck, abar):
                    if ab == 0.0:
                        continue
                    if c == i:
                        D += f * ab
                    elif c in acc:
                        acc[c] += f * ab
            elif k not in acc:
                D += a_ik              # weak, outside chat: lump
        if D == 0.0:
            continue
        for j, num in acc.items():
            w = -num / D
            if w != 0.0:
                rows_out.append(i)
                cols_out.append(cmap[j])
                vals_out.append(w)
    P = sp.coo_matrix((vals_out, (rows_out, cols_out)),
                      shape=(n, n_c)).tocsr()
    return P


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
