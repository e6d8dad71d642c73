"""Aggressive coarsening via two-round PMIS + multipass interpolation
(params.aggressive="pmis2"; hypre agg_num_levels + agg_interp_type=4
analogue — SURVEY.md §2 C10/C12 aggressive path)."""
import numpy as np
import pytest
import scipy.sparse as sp

from sparsh_amg_tpu.models.poisson import poisson2d, poisson3d
from sparsh_amg_tpu.params import AMGParams
from sparsh_amg_tpu.setup.hierarchy import amg_setup
from sparsh_amg_tpu.setup.strength import classical_strength
from sparsh_amg_tpu.setup.splitting import (pmis_splitting, dist2_cc_graph,
                                            CPT, FPT)
from sparsh_amg_tpu.setup.interp import (multipass_interpolation,
                                         _multipass_numpy, smooth_truncate,
                                         truncate_rows)
from sparsh_amg_tpu.setup.aggregate import smooth_prolongator
from sparsh_amg_tpu.solve.solver import AMGSolver
import sparsh_amg_tpu._native as nat


def _split(A, theta=0.06):
    strong, S = classical_strength(A, theta)
    cf1 = pmis_splitting(S)
    S2 = dist2_cc_graph(S, cf1)
    cf2 = pmis_splitting(S2, seed=1)
    cf = cf1.copy()
    c1 = np.flatnonzero(cf1 == CPT)
    cf[c1[cf2 == FPT]] = FPT
    return strong, S, cf1, cf


def _no_lib():
    """Temporarily disable the native library (numpy-oracle path)."""
    class Ctx:
        def __enter__(self):
            self.lib = nat._LIB
            nat._LIB = None

        def __exit__(self, *a):
            nat._LIB = self.lib
    return Ctx()


def test_dist2_native_matches_oracle():
    A = poisson3d(12)
    strong, S = classical_strength(A, 0.06)
    cf1 = pmis_splitting(S)
    S2n = dist2_cc_graph(S, cf1)
    with _no_lib():
        S2p = dist2_cc_graph(S, cf1)
    S2n = S2n.tocsr()
    S2n.sort_indices()
    assert S2n.shape == S2p.shape
    assert np.array_equal(S2n.indptr, S2p.indptr)
    assert np.array_equal(S2n.indices, S2p.indices)


def test_dist2_reaches_through_f_points():
    # path graph 0-1-2 with C={0,2}: 0 and 2 are distance 2 through F=1
    A = sp.csr_matrix(np.array([[2.0, -1.0, 0.0],
                                [-1.0, 2.0, -1.0],
                                [0.0, -1.0, 2.0]]))
    strong, S = classical_strength(A, 0.25)
    cf = np.array([1, 0, 1], dtype=np.int8)
    S2 = dist2_cc_graph(S, cf)
    assert S2.shape == (2, 2)
    assert S2[0, 1] != 0 and S2[1, 0] != 0


def test_multipass_native_matches_oracle():
    A = poisson3d(10)
    strong, S, cf1, cf = _split(A)
    Pn = multipass_interpolation(A, strong, cf, max_per_row=5)
    with _no_lib():
        Pp = multipass_interpolation(A, strong, cf, max_per_row=5)
    d = (Pn - Pp).tocsr()
    d.data[np.abs(d.data) < 1e-12] = 0
    d.eliminate_zeros()
    assert d.nnz == 0, f"{d.nnz} mismatching entries, max {abs(d).max()}"


def test_multipass_rows_partition_of_unity():
    # On an operator with EXACTLY zero row sums, every multipass P row
    # sums to 1: pass-1 rows by the alpha/beta scaling identity, pass-p
    # rows because they inherit their neighbours' row sums.  (On a
    # Dirichlet problem this only holds away from the boundary — deep
    # passes legitimately inherit boundary deficits — so zero the row
    # sums first.)
    A = poisson3d(12).tolil()
    d = np.asarray(A.sum(axis=1)).ravel()
    A.setdiag(A.diagonal() - d)
    A = A.tocsr()
    strong, S = classical_strength(A, 0.06)
    cf1 = pmis_splitting(S)
    S2 = dist2_cc_graph(S, cf1)
    cf2 = pmis_splitting(S2, seed=1)
    cf = cf1.copy()
    c1 = np.flatnonzero(cf1 == CPT)
    cf[c1[cf2 == FPT]] = FPT
    P = multipass_interpolation(A, strong, cf, max_per_row=5)
    rs = np.asarray(P.sum(axis=1)).ravel()
    assert P.nnz > 0
    assert np.all(np.abs(rs - 1.0) < 1e-8)


def test_fused_smoothing_matches_scipy_reference():
    A = poisson3d(10)
    strong, S, cf1, cf = _split(A)
    P0 = multipass_interpolation(A, strong, cf, 5)
    ref = truncate_rows(smooth_prolongator(A, P0, 2 / 3.0,
                                           strong_mask=strong), 5)
    fused = multipass_interpolation(A, strong, cf, 5, smooth_omega=2 / 3.0)
    d = (ref - fused).tocsr()
    d.data[np.abs(d.data) < 1e-10] = 0
    d.eliminate_zeros()
    # identical up to truncation tie-breaks on equal-|w| entries
    assert d.nnz <= max(2, ref.nnz // 100)


def test_smooth_truncate_matches_reference():
    A = poisson2d(24)
    strong, S = classical_strength(A, 0.25)
    cf = pmis_splitting(S)
    P0 = multipass_interpolation(A, strong, cf, 4)
    ref = truncate_rows(smooth_prolongator(A, P0, 2 / 3.0,
                                           strong_mask=strong), 4)
    fast = smooth_truncate(A, P0, strong, 2 / 3.0, 4)
    d = (ref - fast).tocsr()
    d.data[np.abs(d.data) < 1e-10] = 0
    d.eliminate_zeros()
    assert d.nnz <= max(2, ref.nnz // 100)


@pytest.mark.parametrize("n,maker", [(48, poisson2d), (14, poisson3d)])
def test_pmis2_hierarchy_converges(n, maker):
    A = maker(n)
    params = AMGParams(smoother="chebyshev", cycle="V",
                       coarsening="pmis", interpolation="extpi",
                       interp_max=4, agg_levels=1, interp_max_composed=5,
                       aggressive="pmis2", rap_drop_tol=0.01)
    hier = amg_setup(A, params)
    assert hier.n_levels >= 2
    assert hier.operator_complexity() < 2.0
    solver = AMGSolver(A, params=params, hierarchy=hier)
    res = solver.solve(np.ones(A.shape[0]), tol=1e-8)
    assert res.converged
    # aggressive+multipass+smoothing matches the composed path's
    # iteration count (measured 96^3: both 20) — pin loosely
    assert res.iterations <= 26


def test_pmis2_smoothing_improves_or_matches():
    A = poisson3d(16)
    base = dict(smoother="chebyshev", cycle="V", coarsening="pmis",
                interpolation="extpi", interp_max=4, agg_levels=1,
                interp_max_composed=5, aggressive="pmis2",
                rap_drop_tol=0.01)
    its = {}
    for sm in (False, True):
        params = AMGParams(**base, multipass_smooth=sm)
        hier = amg_setup(A, params)
        solver = AMGSolver(A, params=params, hierarchy=hier)
        res = solver.solve(np.ones(A.shape[0]), tol=1e-8)
        assert res.converged
        its[sm] = res.iterations
    assert its[True] <= its[False]
