"""Process-local smoothed-aggregation setup over row blocks (VERDICT r4
next #3: the elasticity workload could previously only be set up
globally — every rank rebuilding the full RBM-SA hierarchy, exactly the
r3 defect the blocked classical path fixed for Poisson).

The sequential greedy Vanek aggregation looks unparallelizable (roots
are first-come in scan order), but its outcome is reproducible from
independent rounds because every decision depends only on SMALLER-id
decisions (see `setup.aggregate.greedy_aggregation_rounds`, the serial
oracle):

  * pass-1 roots are the LEXICOGRAPHIC maximal independent set on the
    distance<=2 strength graph — computed here as PMIS rounds with
    weight = -(global id) over `blocked_pmis_comm(weight="lexid")`,
    reusing the whole distributed-PMIS exchange machinery;
  * pass-1 members attach to their (provably unique) root neighbor;
  * pass-2 members attach to the aggregate of their smallest-id
    pass-<=1-assigned neighbor, from the post-pass-1 snapshot;
  * pass-3 roots are the lexicographic MIS on the leftover-restricted
    distance-1 graph, numbered after the pass-1 roots.

The aggregate map is therefore BIT-IDENTICAL to the serial greedy
(tests/test_blocked_sa.py), and so is the nullspace tentative
prolongator (per-aggregate QR on the aggregate owner, padded to the
allreduced max dof count so LAPACK sees the same matrices), and the
Jacobi-smoothed P (the SAME scipy kernels on ghost-extended rows — one
ghost P exchange; scipy's CSR matmul is row-local with a deterministic
accumulation order and the monotone local column remap preserves it).
Only the Galerkin RAP (rank-order summation, setup/blocked.py) differs
at rounding level, as in the blocked classical path.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..params import AMGParams
from .comm import BlockComm
from .splitting import CPT
from .blocked import (blocked_pmis_comm, fetch_values, fetch_rows,
                      _ghosts_of, _stable_order, owner_of, _pattern_csr,
                      _local_pos, _local_nodes)

_I64 = np.int64


# ---------------------------------------------------------------------------
# Row-block mirrors of the serial SA building blocks
# ---------------------------------------------------------------------------

def amalgamate_rows(A_own: sp.csr_matrix, bs: int) -> sp.csr_matrix:
    """Node-amalgamated rows of a dof row block (serial
    `aggregate.amalgamate` restricted to owned rows; requires the block
    boundaries to be node-aligned).  Global node columns."""
    nloc, n = A_own.shape
    assert nloc % bs == 0 and n % bs == 0
    coo = A_own.tocoo()
    N = sp.coo_matrix(
        (coo.data * coo.data, (coo.row // bs, coo.col // bs)),
        shape=(nloc // bs, n // bs)).tocsr()
    N.sum_duplicates()
    np.sqrt(N.data, out=N.data)
    return N


def symmetric_strength_rows(M_own: sp.csr_matrix, r0: int,
                            bounds: np.ndarray, comm: BlockComm,
                            theta: float):
    """Row-block mirror of `strength.symmetric_strength`: the cut needs
    |column diagonals|, fetched from their owners for ghost columns.
    Returns (mask over the local nnz, pattern S_own with global cols)."""
    nloc, n = M_own.shape
    rows_g = r0 + np.repeat(np.arange(nloc, dtype=_I64),
                            np.diff(M_own.indptr))
    cols = np.asarray(M_own.indices, dtype=_I64)
    dmask = cols == rows_g
    diag_own = np.zeros(nloc)
    diag_own[rows_g[dmask] - r0] = np.abs(M_own.data[dmask])
    ghosts = _ghosts_of(cols, r0, r0 + nloc)
    dg = fetch_values(comm, bounds, r0, {"d": diag_own}, ghosts)["d"]
    diag_col = np.empty(cols.shape)
    own = (cols >= r0) & (cols < r0 + nloc)
    diag_col[own] = diag_own[cols[own] - r0]
    diag_col[~own] = np.abs(dg[np.searchsorted(ghosts, cols[~own])])
    cut = theta * np.sqrt(diag_own[rows_g - r0] * diag_col)
    mask = (~dmask) & (np.abs(M_own.data) >= cut) & (cut > 0)
    counts = np.bincount((rows_g - r0)[mask], minlength=nloc).astype(_I64)
    indptr = np.zeros(nloc + 1, dtype=_I64)
    np.cumsum(counts, out=indptr[1:])
    S = _pattern_csr(indptr, M_own.indices[mask].copy(), (nloc, n))
    return mask, S


def dist2_pattern_rows(S_own: sp.csr_matrix, r0: int, r1: int,
                       bounds: np.ndarray, comm: BlockComm
                       ) -> sp.csr_matrix:
    """Owned rows of pattern(S + S*S) minus the diagonal — the
    distance<=2 graph of the symmetric strength graph (the serial
    `aggregate.dist2_graph`), built from one ghost-row exchange."""
    nloc, n = S_own.shape
    cols = np.asarray(S_own.indices, dtype=_I64)
    g1 = _ghosts_of(cols, r0, r1)
    S_g1 = fetch_rows(comm, bounds, r0, S_own, g1, with_data=False)
    # partial global-row CSR holding own + distance-1 ghost rows: the
    # only rows S_own @ . ever reads
    counts = np.zeros(n, dtype=_I64)
    counts[r0:r1] = np.diff(S_own.indptr)
    if g1.size:
        counts[g1] = np.diff(S_g1.indptr)
    indptr = np.zeros(n + 1, dtype=_I64)
    np.cumsum(counts, out=indptr[1:])
    nnz = int(indptr[-1])
    idx = np.empty(nnz, dtype=np.int32)
    for B, rr in ((S_own, np.arange(r0, r1, dtype=_I64)), (S_g1, g1)):
        if B.nnz == 0:
            continue
        ln = np.diff(B.indptr)
        pos = np.repeat(indptr[rr], ln) + (
            np.arange(B.nnz, dtype=_I64)
            - np.repeat(B.indptr[:-1].astype(_I64), ln))
        idx[pos] = B.indices
    S_part = sp.csr_matrix(
        (np.ones(nnz, dtype=np.float32), idx, indptr), shape=(n, n))
    P1 = sp.csr_matrix(
        (np.ones(S_own.nnz, dtype=np.float32), S_own.indices,
         S_own.indptr), shape=S_own.shape)
    S2 = (P1 + P1 @ S_part).tocsr()
    S2.sort_indices()
    # drop the diagonal of the OWNED rows (global row ids r0 + i)
    rows_l = np.repeat(np.arange(nloc, dtype=_I64), np.diff(S2.indptr))
    keep = S2.indices != (rows_l + r0)
    counts2 = np.bincount(rows_l[keep], minlength=nloc).astype(_I64)
    indptr2 = np.zeros(nloc + 1, dtype=_I64)
    np.cumsum(counts2, out=indptr2[1:])
    return _pattern_csr(indptr2, S2.indices[keep].copy(), (nloc, n))


def _first_hit_per_row(rows_l, vals, mask):
    """For each local row with any masked entry, the value at its FIRST
    masked entry (CSR cols ascending => smallest global id)."""
    k = np.flatnonzero(mask)
    r_u, first = np.unique(rows_l[k], return_index=True)
    return r_u, vals[k[first]]


def blocked_aggregation(S_own: sp.csr_matrix, r0: int, r1: int,
                        bounds: np.ndarray, comm: BlockComm):
    """Distributed greedy Vanek aggregation, bit-identical to the serial
    `greedy_aggregation` (see module docstring).  Returns
    (agg_own with GLOBAL aggregate ids, n_agg, seg_counts) where
    seg_counts = (counts1, counts3) are the per-rank pass-1/pass-3 root
    counts — aggregate a is OWNED by the rank whose root created it;
    `agg_owner_fn(seg_counts)` maps ids to owners."""
    nloc = r1 - r0
    S2_own = dist2_pattern_rows(S_own, r0, r1, bounds, comm)
    cf1 = blocked_pmis_comm(S2_own, r0, r1, bounds, comm,
                            weight="lexid", symmetric=True, iso_cpt=True)
    root1 = cf1 == CPT

    counts1 = [int(c) for c in comm.allgather(int(root1.sum()))]
    base1 = sum(counts1[: comm.rank])
    n1 = sum(counts1)
    agg = np.full(nloc, -1, dtype=_I64)
    agg[root1] = base1 + np.arange(int(root1.sum()), dtype=_I64)

    rows_l = np.repeat(np.arange(nloc, dtype=_I64), np.diff(S_own.indptr))
    cols = np.asarray(S_own.indices, dtype=_I64)
    ghosts = _ghosts_of(cols, r0, r1)
    own = (cols >= r0) & (cols < r1)
    gpos = np.searchsorted(ghosts, cols[~own])

    def ext(vals_own, vals_g):
        out = np.empty(cols.shape, dtype=np.asarray(vals_own).dtype)
        out[own] = vals_own[cols[own] - r0]
        out[~own] = vals_g[gpos]
        return out

    info = fetch_values(comm, bounds, r0,
                        {"root": root1.astype(np.int8), "agg": agg},
                        ghosts)
    root_c = ext(root1.astype(np.int8), info["root"]).view(bool)
    agg_c = ext(agg, info["agg"])
    # pass 1: the unique root neighbor of each non-root row
    m1 = root_c & ~root1[rows_l]
    agg[rows_l[m1]] = agg_c[m1]

    # pass 2 (post-pass-1 snapshot)
    info2 = fetch_values(comm, bounds, r0, {"agg": agg}, ghosts)
    agg_c = ext(agg, info2["agg"])
    m2 = (agg[rows_l] < 0) & (agg_c >= 0)
    r_u, val = _first_hit_per_row(rows_l, agg_c, m2)
    agg[r_u] = val

    # pass 3: lexicographic MIS on the leftover-restricted subgraph
    left = agg < 0
    n_left = int(comm.allreduce_sum(int(left.sum())))
    counts3 = [0] * comm.size
    if n_left > 0:
        infoL = fetch_values(comm, bounds, r0,
                             {"left": left.astype(np.int8)}, ghosts)
        left_c = ext(left.astype(np.int8), infoL["left"]).view(bool)
        mL = left[rows_l] & left_c
        countsL = np.bincount(rows_l[mL], minlength=nloc).astype(_I64)
        indptrL = np.zeros(nloc + 1, dtype=_I64)
        np.cumsum(countsL, out=indptrL[1:])
        SL = _pattern_csr(indptrL, S_own.indices[mL].copy(),
                          (nloc, S_own.shape[1]))
        cfL = blocked_pmis_comm(SL, r0, r1, bounds, comm,
                                weight="lexid", symmetric=True,
                                iso_cpt=True)
        root3 = (cfL == CPT) & left
        counts3 = [int(c) for c in comm.allgather(int(root3.sum()))]
        base3 = n1 + sum(counts3[: comm.rank])
        agg[root3] = base3 + np.arange(int(root3.sum()), dtype=_I64)
        # members: smallest-id adjacent pass-3 root
        info3 = fetch_values(comm, bounds, r0,
                             {"root3": root3.astype(np.int8),
                              "agg": agg}, ghosts)
        root3_c = ext(root3.astype(np.int8), info3["root3"]).view(bool)
        agg_c = ext(agg, info3["agg"])
        m3 = left[rows_l] & ~root3[rows_l] & root3_c
        r_u3, val3 = _first_hit_per_row(rows_l, agg_c, m3)
        agg[r_u3] = val3
    n_agg = n1 + sum(counts3)
    assert (agg >= 0).all(), "blocked aggregation left unassigned nodes"
    return agg, n_agg, (counts1, counts3)


def agg_owner_fn(seg_counts):
    """Owner rank of aggregate ids under the two-segment (pass-1 then
    pass-3) numbering."""
    counts1, counts3 = seg_counts
    n1 = sum(counts1)
    b1 = np.concatenate([[0], np.cumsum(counts1)]).astype(_I64)
    b3 = np.concatenate([[0], np.cumsum(counts3)]).astype(_I64) + n1

    def owner(ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(ids, dtype=_I64)
        out = np.empty(ids.shape, dtype=_I64)
        is1 = ids < n1
        out[is1] = np.searchsorted(b1, ids[is1], side="right") - 1
        out[~is1] = np.searchsorted(b3, ids[~is1], side="right") - 1
        return out
    return owner


# ---------------------------------------------------------------------------
# Tentative prolongator (piecewise-constant / nullspace QR)
# ---------------------------------------------------------------------------

def tentative_rows(agg_dof_own: np.ndarray, n_agg: int, r0: int,
                   bounds: np.ndarray, comm: BlockComm,
                   B_own: np.ndarray | None, segs):
    """Owned dof rows of the tentative prolongator.

    Without a nullspace: P[i, agg[i]] = 1 (fully local).  With one,
    members route their B rows to the aggregate's owner, which batch-QRs
    each owned aggregate exactly as the serial
    `tentative_prolongator_nullspace` (same dof ordering, same padded
    height via the allreduced max count, same rank guard with the
    allreduced scale, same kept-column renumbering) and routes the Q
    rows back.  Returns (P_own, n_c, B_c_parts) with B_c_parts =
    (kept coarse dof ids, their R rows) produced by THIS rank's
    aggregates — the caller routes them to the coarse owners."""
    nloc = agg_dof_own.shape[0]
    if B_own is None:
        P = sp.csr_matrix(
            (np.ones(nloc), agg_dof_own.astype(np.int32),
             np.arange(nloc + 1, dtype=_I64)),
            shape=(nloc, n_agg))
        return P, n_agg, None

    k = B_own.shape[1]
    size = comm.size
    owner_of_agg = agg_owner_fn(segs)
    n1 = sum(segs[0])
    # route member dof rows to aggregate owners, ascending (agg, dof id)
    order = np.argsort(agg_dof_own, kind="stable")
    a_srt = np.asarray(agg_dof_own, dtype=_I64)[order]
    dest = owner_of_agg(a_srt)
    o2 = _stable_order(dest, size)
    a2, m2 = a_srt[o2], order[o2]
    cuts = np.searchsorted(dest[o2], np.arange(size + 1))
    send = [(a2[cuts[d]:cuts[d + 1]],
             r0 + m2[cuts[d]:cuts[d + 1]],
             B_own[m2[cuts[d]:cuts[d + 1]]])
            for d in range(size)]
    got = comm.alltoall(send)
    aggs = (np.concatenate([g[0] for g in got]) if got
            else np.empty(0, _I64))
    gids = (np.concatenate([g[1] for g in got]) if got
            else np.empty(0, _I64))
    Brows = (np.concatenate([g[2] for g in got]) if got
             else np.empty((0, k)))
    # (agg, global dof id) ascending — the serial table ordering
    o = np.lexsort((gids, aggs))
    aggs, gids, Brows = aggs[o], gids[o], Brows[o]
    own_aggs, inv, counts = np.unique(aggs, return_inverse=True,
                                      return_counts=True)
    na_own = own_aggs.size
    m_max = int(comm.allreduce_max(
        int(counts.max()) if na_own else 0))
    if na_own:
        slot = np.arange(aggs.size, dtype=_I64) - np.repeat(
            np.concatenate([[0], np.cumsum(counts[:-1])]), counts)
    else:
        slot = np.zeros(0, dtype=_I64)   # rank owns no aggregates here
    table = np.zeros((na_own, max(m_max, 1), k))
    table[inv, slot, :] = Brows
    Q, R = np.linalg.qr(table) if na_own else (
        np.zeros((0, max(m_max, 1), k)), np.zeros((0, k, k)))
    rdiag = np.abs(np.einsum("aii->ai", R)) if na_own \
        else np.zeros((0, k))
    scale = float(comm.allreduce_max(
        float(np.abs(B_own).max()) if B_own.size else 0.0)) + 1e-300
    bad = rdiag <= 1e-10 * scale                    # (na_own, k)
    Q = np.where(bad[:, None, :], 0.0, Q)
    R = np.where(bad[:, :, None], 0.0, R)
    # global renumbering of KEPT coarse dofs (serial: P[:, keep]) — the
    # serial order is ASCENDING AGGREGATE ID, and each rank owns TWO id
    # segments (its pass-1 block, then — after every rank's pass-1
    # block — its pass-3 block), so the prefix scan must be
    # segment-major, not rank-major
    kept = ~bad                                     # (na_own, k)
    is1 = own_aggs < n1
    kept1 = int(kept[is1].sum())
    kept3 = int(kept[~is1].sum())
    counts_k = comm.allgather((kept1, kept3))
    tot1 = sum(c[0] for c in counts_k)
    base1 = sum(c[0] for c in counts_k[: comm.rank])
    base3 = tot1 + sum(c[1] for c in counts_k[: comm.rank])
    n_c = tot1 + sum(c[1] for c in counts_k)
    newcol = np.full((na_own, k), -1, dtype=_I64)
    k1 = kept & is1[:, None]
    k3 = kept & ~is1[:, None]
    newcol[k1] = base1 + np.arange(kept1, dtype=_I64)
    newcol[k3] = base3 + np.arange(kept3, dtype=_I64)
    # reply (Q rows + kept-column map) to each member dof's owner
    dest_m = owner_of(gids, bounds)
    om = _stable_order(dest_m, size)
    cuts_m = np.searchsorted(dest_m[om], np.arange(size + 1))
    send = [(gids[om[cuts_m[d]:cuts_m[d + 1]]],
             Q[inv[om[cuts_m[d]:cuts_m[d + 1]]],
               slot[om[cuts_m[d]:cuts_m[d + 1]]], :],
             newcol[inv[om[cuts_m[d]:cuts_m[d + 1]]]])
            for d in range(size)]
    back = comm.alltoall(send)
    g_b = (np.concatenate([b[0] for b in back]) if back
           else np.empty(0, _I64))
    Q_b = (np.concatenate([b[1] for b in back]) if back
           else np.empty((0, k)))
    C_b = (np.concatenate([b[2] for b in back]) if back
           else np.empty((0, k), _I64))
    loc = (np.asarray(g_b, _I64) - r0)
    vals = np.zeros((nloc, k))
    colid = np.full((nloc, k), -1, dtype=_I64)
    vals[loc] = Q_b
    colid[loc] = C_b
    keep_e = (colid >= 0) & (vals != 0.0)       # serial eliminate_zeros
    counts_r = keep_e.sum(axis=1).astype(_I64)
    indptr = np.zeros(nloc + 1, dtype=_I64)
    np.cumsum(counts_r, out=indptr[1:])
    P = sp.csr_matrix(
        (vals[keep_e], colid[keep_e].astype(np.int32), indptr),
        shape=(nloc, n_c))
    # each dof row touches one aggregate whose kept columns ascend
    P.has_sorted_indices = True
    B_c_rows = R[np.repeat(np.arange(na_own), k).reshape(na_own, k)[kept],
                 np.tile(np.arange(k), (na_own, 1))[kept], :] \
        if na_own else np.empty((0, k))
    return P, n_c, (newcol[kept], B_c_rows)


# ---------------------------------------------------------------------------
# Jacobi smoothing with one ghost-P exchange
# ---------------------------------------------------------------------------

def smooth_p_rows(A_own: sp.csr_matrix, P_own: sp.csr_matrix, r0: int,
                  r1: int, bounds: np.ndarray, comm: BlockComm,
                  params: AMGParams,
                  strong_mask: np.ndarray | None) -> sp.csr_matrix:
    """Row-block mirror of `aggregate.smooth_prolongator`:
    P = (I - omega D^-1 A^F) P_tent with the SAME scipy kernels on
    ghost-extended rows, so owned rows are bit-identical to the serial
    smoother's."""
    nloc = r1 - r0
    omega = params.jacobi_omega_smooth_P
    A = A_own
    rows_g = r0 + np.repeat(np.arange(nloc, dtype=_I64), np.diff(A.indptr))
    dmask = np.asarray(A.indices, dtype=_I64) == rows_g
    if strong_mask is not None:
        keep = strong_mask | dmask
        data_f = np.where(keep, A.data, 0.0)
        if params.p_smooth_compensation != "none":
            lump = np.zeros(nloc)
            np.add.at(lump, rows_g - r0, np.where(~keep, A.data, 0.0))
            sign = 1.0 if params.p_smooth_compensation == "lump" else -1.0
            data_f = np.where(dmask, data_f + sign * lump[rows_g - r0],
                              data_f)
        A = sp.csr_matrix((data_f, A.indices.copy(), A.indptr.copy()),
                          shape=A.shape)
        A.eliminate_zeros()
        rows_g = r0 + np.repeat(np.arange(nloc, dtype=_I64),
                                np.diff(A.indptr))
        dmask = np.asarray(A.indices, dtype=_I64) == rows_g
    d = np.zeros(nloc)
    d[rows_g[dmask] - r0] = A.data[dmask]
    with np.errstate(divide="ignore"):
        dinv = np.where(d != 0, 1.0 / d, 0.0)
    # sp.diags(dinv) @ A scales each row entry by one multiply — mirrored
    DA = sp.csr_matrix((A.data * np.repeat(dinv, np.diff(A.indptr)),
                        A.indices, A.indptr), shape=A.shape)
    if params.p_smooth_spectral:
        omega = omega / max(_rho_dinva_blocked(DA, comm), 1e-12)
    cols = np.asarray(DA.indices, dtype=_I64)
    g1 = _ghosts_of(cols, r0, r1)
    P_g1 = fetch_rows(comm, bounds, r0, P_own, g1)
    nodes, own0 = _local_nodes(r0, r1, g1)
    ne = nodes.size
    counts = np.zeros(ne, dtype=_I64)
    counts[own0:own0 + nloc] = np.diff(P_own.indptr)
    gdst = _local_pos(g1, r0, r1, g1)
    if g1.size:
        counts[gdst] = np.diff(P_g1.indptr)
    indptr = np.zeros(ne + 1, dtype=_I64)
    np.cumsum(counts, out=indptr[1:])
    pi = np.empty(int(indptr[-1]), dtype=np.int32)
    pv = np.empty(int(indptr[-1]))
    from .blocked import _scatter_rows
    for B, dst in ((P_own, np.arange(own0, own0 + nloc, dtype=_I64)),
                   (P_g1, gdst)):
        if B.shape[0] == 0 or B.nnz == 0:
            continue
        _scatter_rows(B, indptr[dst], pi, pv)
    P_ext = sp.csr_matrix((pv, pi, indptr), shape=(ne, P_own.shape[1]))
    P_ext.has_sorted_indices = True
    DA_loc = sp.csr_matrix(
        (DA.data, _local_pos(cols, r0, r1, g1).astype(np.int32),
         np.ascontiguousarray(DA.indptr, dtype=_I64)),
        shape=(nloc, ne))
    DA_loc.has_sorted_indices = True
    P = (P_own - omega * (DA_loc @ P_ext)).tocsr()
    P.sum_duplicates()
    return P


def _rho_dinva_blocked(DA_own: sp.csr_matrix, comm: BlockComm,
                       iters: int = 15) -> float:
    """Mirror of smooth_prolongator's spectral power loop: every rank
    holds the seeded GLOBAL iterate, computes its owned rows, and the
    allgather reassembles it in rank order — bit-identical norms."""
    n = DA_own.shape[1]
    rng = np.random.default_rng(7)
    v = rng.standard_normal(n)
    rho = 1.0
    for _ in range(iters):
        w_own = DA_own @ v
        v = np.concatenate(comm.allgather(w_own))
        nrm = np.linalg.norm(v)
        if nrm == 0:
            break
        rho, v = nrm, v / nrm
    return rho


# ---------------------------------------------------------------------------
# One full blocked SA step
# ---------------------------------------------------------------------------

def blocked_sa_step(A_own: sp.csr_matrix, r0: int, r1: int,
                    bounds: np.ndarray, comm: BlockComm,
                    params: AMGParams, B_own: np.ndarray | None,
                    blocksize: int):
    """One smoothed-aggregation setup step on the owned row block.
    Returns (P_own, n_c, B_c_parts) or None on a (globally agreed)
    stall.  B_c_parts = (coarse dof ids, R rows) owned-aggregate output
    (None without a nullspace); the caller routes them to the coarse
    bounds it chooses."""
    n = int(bounds[-1])
    bs = blocksize if (blocksize > 1 and n % blocksize == 0) else 1
    if bs > 1:
        assert all(int(b) % bs == 0 for b in bounds), \
            "row blocks must be node-aligned (see params.row_align)"
    strong_dof = None
    if params.p_smooth_filter and params.interpolation == "smoothed":
        strong_dof, _ = symmetric_strength_rows(A_own, r0, bounds, comm,
                                                params.agg_theta)
    if bs > 1:
        N_own = amalgamate_rows(A_own, bs)
        bounds_n = (np.asarray(bounds, dtype=_I64) // bs)
        _, Sn = symmetric_strength_rows(N_own, r0 // bs, bounds_n, comm,
                                        params.agg_theta)
        aggn, n_agg, segs = blocked_aggregation(Sn, r0 // bs, r1 // bs,
                                                bounds_n, comm)
        agg_dof = np.repeat(aggn, bs)
    else:
        _, Sd = symmetric_strength_rows(A_own, r0, bounds, comm,
                                        params.agg_theta)
        agg_dof, n_agg, segs = blocked_aggregation(Sd, r0, r1, bounds,
                                                   comm)
    if n_agg == 0 or n_agg >= n:
        return None
    P_own, n_c, bparts = tentative_rows(
        agg_dof, n_agg, r0, bounds, comm, B_own, segs)
    if n_c == 0 or n_c >= n:
        return None
    if params.interpolation == "smoothed":
        P_own = smooth_p_rows(A_own, P_own, r0, r1, bounds, comm, params,
                              strong_dof if params.p_smooth_filter
                              else None)
    return P_own, n_c, bparts


def route_coarse_nullspace(bparts, bounds_c: np.ndarray,
                           comm: BlockComm, k: int) -> np.ndarray:
    """Route (coarse dof id, R row) pairs to their owners under
    ``bounds_c``; returns this rank's (nc_loc, k) coarse nullspace."""
    ids, rows = bparts
    ids = np.asarray(ids, dtype=_I64)
    dest = owner_of(ids, bounds_c)
    o = _stable_order(dest, comm.size)
    cuts = np.searchsorted(dest[o], np.arange(comm.size + 1))
    send = [(ids[o[cuts[d]:cuts[d + 1]]], rows[o[cuts[d]:cuts[d + 1]]])
            for d in range(comm.size)]
    got = comm.alltoall(send)
    c0 = int(bounds_c[comm.rank])
    ncl = int(bounds_c[comm.rank + 1]) - c0
    B_c = np.zeros((ncl, k))
    for gi, gr in got:
        if len(gi):
            B_c[np.asarray(gi, _I64) - c0] = gr
    return B_c
