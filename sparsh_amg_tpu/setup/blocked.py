"""Per-host row-block setup for the finest level (SURVEY.md §3.2: the
reference coarsens under MPI with boundary exchanges; VERDICT r2 next #7).

The single-host native setup measured 195 s / 33 GB at 100M unknowns, so
global setup covers the v5p-16 north star — this module is the designed
escape hatch beyond it (~1B+ rows): every host builds strength, PMIS and
interpolation rows for its contiguous row block, exchanging only boundary
data.  The exchanges, in pod order:

  1. ST-degrees: each host bincounts the columns of its strength rows and
     the partial counts are reduced to the owners (one additive exchange).
     PMIS weights w_i = deg_i + hash01(global_i) are then host-local.
  2. incoming strength edges: each host sends its outgoing boundary edges
     (j -> i, i remote) to i's owner — one structural exchange giving
     every host ST rows for its owned points.
  3. per-PMIS-round: C/F states of boundary points, twice per round
     (after selection, after F-marking) — the distributed PMIS of
     De Sterck/Yang/Heys 2006, exactly hypre's pattern.
  4. pre-interpolation: ghost A rows at distance 1 plus C/F and coarse
     ids at distance 2 (ext+i reads neighbour ROWS at distance 1 and
     only cf/coarse-id of distance-2 points), and the exclusive prefix
     scan of per-host C counts that globalizes coarse numbering.

This file SIMULATES the hosts sequentially in one process, but each
block's compute reads only its owned rows plus the explicitly exchanged
halo structures above, so the data flow is pod-shaped.  Because PMIS
weights are pure functions of global index + exchanged degrees, and the
ext+i row formula reads only distance-<=2 data, the stitched (cf, P) are
BIT-IDENTICAL to the global `_coarsen_once` output — asserted by
tests/test_blocked.py on 64^3 Poisson.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..params import AMGParams
from .strength import classical_strength
from .splitting import _hash01, FPT, CPT
from .interp import extpi_interpolation, direct_interpolation, truncate_rows

UNASSIGNED = -1


def block_bounds(n: int, n_blocks: int) -> np.ndarray:
    """Contiguous row-block boundaries (n_blocks+1,), balanced like
    parallel.partition: first n % n_blocks blocks get one extra row."""
    base, rem = divmod(n, n_blocks)
    sizes = np.full(n_blocks, base, dtype=np.int64)
    sizes[:rem] += 1
    return np.concatenate([[0], np.cumsum(sizes)])


def _st_degrees(S_blocks, n: int) -> np.ndarray:
    """Exchange 1: additive reduction of per-host column counts.  Each
    host contributes bincount(columns of its strength rows); the sum is
    the global ST row degree."""
    deg = np.zeros(n, dtype=np.int64)
    for Sb in S_blocks:
        if Sb.nnz:
            deg += np.bincount(Sb.indices, minlength=n)
    return deg


def _incoming_edges(S_blocks, bounds, n: int) -> sp.csr_matrix:
    """Exchange 2: route outgoing strength edges to their target's owner.
    Returns the global ST pattern (each host holds rows of its block)."""
    rows = []
    cols = []
    for b, Sb in enumerate(S_blocks):
        r0 = bounds[b]
        src = np.repeat(np.arange(Sb.shape[0], dtype=np.int64) + r0,
                        np.diff(Sb.indptr))
        rows.append(Sb.indices.astype(np.int64))   # target point (new row)
        cols.append(src)                           # source point
    rows = np.concatenate(rows) if rows else np.empty(0, dtype=np.int64)
    cols = np.concatenate(cols) if cols else np.empty(0, dtype=np.int64)
    ST = sp.csr_matrix(
        (np.ones(len(rows), dtype=np.int8), (rows, cols)), shape=(n, n))
    ST.sort_indices()
    return ST


def blocked_pmis(S_blocks, bounds, n: int, seed: int = 0) -> np.ndarray:
    """Distributed PMIS over row blocks, replicating the native
    `pmis_cf` semantics exactly (amg_core.cpp:384): w = |ST_i| +
    hash01(i, seed); per round, an unassigned i becomes C when no
    unassigned j != i in S(i) u ST(i) has w_j >= w_i; then unassigned
    points strongly depending on a C become F.  `cf` plays the role of
    the exchanged boundary state: each block WRITES only its own rows
    and reads only owned + halo entries."""
    deg = _st_degrees(S_blocks, n)                       # exchange 1
    ST = _incoming_edges(S_blocks, bounds, n)            # exchange 2
    w = deg.astype(np.float64) + _hash01(
        np.arange(n, dtype=np.uint64), seed)
    cf = np.full(n, UNASSIGNED, dtype=np.int8)

    n_blocks = len(S_blocks)
    # per-block precomputed row ids of each nnz (for segment max)
    blk = []
    for b in range(n_blocks):
        r0, r1 = bounds[b], bounds[b + 1]
        Sb = S_blocks[b]
        STb = ST[r0:r1]
        s_rows = np.repeat(np.arange(r1 - r0), np.diff(Sb.indptr))
        st_rows = np.repeat(np.arange(r1 - r0), np.diff(STb.indptr))
        # isolated points (no strength in either direction) -> F upfront
        iso = (np.diff(Sb.indptr) == 0) & (np.diff(STb.indptr) == 0)
        cf[r0:r1][iso] = FPT
        blk.append((r0, r1, Sb, STb, s_rows, st_rows))

    prev_un = int((cf == UNASSIGNED).sum())
    while prev_un > 0:
        un = cf == UNASSIGNED                      # halo state, pre-round
        # --- selection phase: every block reads the SAME pre-round cf ---
        new_c = []
        for r0, r1, Sb, STb, s_rows, st_rows in blk:
            nloc = r1 - r0
            loc = np.arange(r0, r1)
            m = np.full(nloc, -np.inf)
            for rows_nnz, Mb in ((s_rows, Sb), (st_rows, STb)):
                if Mb.nnz == 0:
                    continue
                j = Mb.indices
                wj = np.where(un[j] & (j != (rows_nnz + r0)), w[j], -np.inf)
                np.maximum.at(m, rows_nnz, wj)
            new_c.append(un[loc] & (w[r0:r1] > m))
        # exchange 3a: publish this round's C points
        for (r0, r1, *_), nc in zip(blk, new_c):
            cf[r0:r1][nc] = CPT
        # --- F phase: reads post-selection cf (new halo Cs included) ---
        for r0, r1, Sb, _, s_rows, _ in blk:
            un_loc = cf[r0:r1] == UNASSIGNED
            if not un_loc.any() or Sb.nnz == 0:
                continue
            hit = np.zeros(r1 - r0, dtype=bool)
            np.logical_or.at(hit, s_rows, cf[Sb.indices] == CPT)
            cf[r0:r1][un_loc & hit] = FPT
        # exchange 3b: publish F states; stall guard as in the native code
        now_un = int((cf == UNASSIGNED).sum())
        if now_un == prev_un:
            break
        prev_un = now_un
    cf[cf == UNASSIGNED] = CPT
    return cf


def _extended_rows(A: sp.csr_matrix, r0: int, r1: int):
    """Exchange 4 (structure): the ghost row set a host needs for ext+i —
    every point referenced by its owned rows (distance 1, full A rows)
    plus every point referenced by THOSE rows (distance 2, cf/coarse-id
    only).  Returns (e1, e2): sorted global id arrays, owned ⊆ e1 ⊆ e2."""
    owned = np.arange(r0, r1, dtype=np.int64)
    cols1 = A.indices[A.indptr[r0]:A.indptr[r1]].astype(np.int64)
    e1 = np.union1d(owned, cols1)
    lo, hi = A.indptr[e1], A.indptr[e1 + 1]
    cols2 = np.concatenate([A.indices[a:b] for a, b in zip(lo, hi)]) \
        if len(e1) else np.empty(0, dtype=np.int32)
    e2 = np.union1d(e1, cols2.astype(np.int64))
    return e1, e2


def blocked_interpolation(A: sp.csr_matrix, cf: np.ndarray, bounds,
                          params: AMGParams) -> sp.csr_matrix:
    """Build interpolation rows per block from exchanged ghost rows and
    stitch.  Each block assembles a local square matrix over its
    distance-2 node set (rows filled only for owned + distance-1 ghosts
    — exactly the rows a pod host receives), runs the SAME native ext+i
    kernel on it, and keeps its owned P rows with columns remapped to
    the global coarse numbering (prefix-scan exchange)."""
    n = A.shape[0]
    is_c = cf == CPT
    gmap = np.cumsum(is_c, dtype=np.int64) - 1   # global coarse ids
    n_c = int(is_c.sum())
    n_blocks = len(bounds) - 1
    parts = []
    for b in range(n_blocks):
        r0, r1 = int(bounds[b]), int(bounds[b + 1])
        e1, e2 = _extended_rows(A, r0, r1)
        ne = len(e2)
        # local square CSR: rows for e1 hold the full exchanged A rows
        # (column ids remapped into e2-local space), rows e2\e1 stay
        # empty — ext+i never reads beyond distance-1 rows.
        fill = np.isin(e2, e1)
        counts = np.zeros(ne, dtype=np.int64)
        counts[fill] = (A.indptr[e1 + 1] - A.indptr[e1])
        indptr = np.concatenate([[0], np.cumsum(counts)])
        idx_chunks = [A.indices[A.indptr[i]:A.indptr[i + 1]] for i in e1]
        dat_chunks = [A.data[A.indptr[i]:A.indptr[i + 1]] for i in e1]
        gcols = np.concatenate(idx_chunks) if idx_chunks else \
            np.empty(0, dtype=A.indices.dtype)
        data = np.concatenate(dat_chunks) if dat_chunks else \
            np.empty(0, dtype=A.data.dtype)
        lcols = np.searchsorted(e2, gcols).astype(np.int32)
        A_loc = sp.csr_matrix((data, lcols, indptr), shape=(ne, ne))
        # strength is row-local: identical mask per (full) row
        strong_loc, _ = classical_strength(A_loc, params.theta)
        cf_loc = cf[e2]
        if params.interpolation == "extpi":
            P_loc = extpi_interpolation(A_loc, strong_loc, cf_loc)
        else:
            P_loc = direct_interpolation(A_loc, strong_loc, cf_loc)
        # owned rows of P_loc; local coarse k -> e2's k-th C point ->
        # global coarse id
        own_pos = np.searchsorted(e2, np.arange(r0, r1))
        P_own = P_loc[own_pos]
        lc_nodes = e2[cf_loc == CPT]             # sorted global ids
        col_map = gmap[lc_nodes].astype(np.int64)
        P_own = sp.csr_matrix(
            (P_own.data, col_map[P_own.indices], P_own.indptr),
            shape=(r1 - r0, n_c))
        parts.append(P_own)
    # NOTE: intra-row order is the kernel's emission order, NOT sorted —
    # truncation tie-breaks on slot order, so sorting here would pick
    # different entries than the global path on |w| ties.
    return sp.vstack(parts, format="csr")


def blocked_coarsen_once(A: sp.csr_matrix, params: AMGParams,
                         n_blocks: int):
    """One block-parallel setup step for the finest level: per-host
    strength + distributed PMIS + per-host ext+i, stitched.  Mirrors
    hierarchy._coarsen_once for coarsening in {pmis} / interpolation in
    {extpi, direct}; returns (P, cf)."""
    assert params.coarsening == "pmis", "blocked setup: PMIS only"
    A = A.tocsr()
    n = A.shape[0]
    bounds = block_bounds(n, n_blocks)
    # per-host strength on OWNED rows only (strength is row-local).  The
    # block is assembled as a full-shape CSR whose rows outside [r0, r1)
    # are empty: the strength kernel detects the diagonal as col == row,
    # so global row/column ids must stay aligned; nnz is still block-only.
    S_blocks = []
    for b in range(n_blocks):
        r0, r1 = int(bounds[b]), int(bounds[b + 1])
        indptr = np.empty(n + 1, dtype=A.indptr.dtype)
        indptr[:r0] = A.indptr[r0]
        indptr[r0:r1 + 1] = A.indptr[r0:r1 + 1]
        indptr[r1 + 1:] = A.indptr[r1]
        Ab = sp.csr_matrix(
            (A.data[A.indptr[r0]:A.indptr[r1]],
             A.indices[A.indptr[r0]:A.indptr[r1]],
             indptr - A.indptr[r0]),
            shape=(n, n))
        _, Sb = classical_strength(Ab, params.theta)
        S_blocks.append(Sb[r0:r1])
    cf = blocked_pmis(S_blocks, bounds, n)
    P = blocked_interpolation(A, cf, bounds, params)
    return truncate_rows(P, params.interp_max), cf
