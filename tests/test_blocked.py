"""Per-host row-block setup (setup/blocked.py; VERDICT r2 next #7).

The blocked path must reproduce the GLOBAL setup exactly: PMIS weights
are pure functions of global index + exchanged ST-degrees, and ext+i
rows read only distance-<=2 data, so per-block computation with boundary
exchanges is bit-identical to the one-host computation — asserted here
on 64^3 Poisson with 8 simulated hosts, plus a convergence run whose
finest level comes from the blocked setup.
"""
import numpy as np
import pytest
import scipy.sparse as sp

from sparsh_amg_tpu.models.poisson import poisson3d, poisson2d
from sparsh_amg_tpu.params import AMGParams, KrylovParams
from sparsh_amg_tpu.setup.strength import classical_strength
from sparsh_amg_tpu.setup.splitting import pmis_splitting
from sparsh_amg_tpu.setup.interp import extpi_interpolation, truncate_rows
from sparsh_amg_tpu.setup.blocked import (block_bounds, blocked_pmis,
                                          blocked_coarsen_once)
from sparsh_amg_tpu.setup.hierarchy import amg_setup, Hierarchy, Level
from sparsh_amg_tpu.setup.galerkin import galerkin_product
from sparsh_amg_tpu.setup.transpose import csr_transpose

PARAMS = AMGParams(coarsening="pmis", interpolation="extpi", interp_max=4)


def _global_once(A, params):
    mask, S = classical_strength(A, params.theta)
    cf = pmis_splitting(S)
    P = truncate_rows(extpi_interpolation(A, mask, cf), params.interp_max)
    return P, cf, S


def _csr_equal(X, Y):
    return (X.shape == Y.shape and np.array_equal(X.indptr, Y.indptr)
            and np.array_equal(X.indices, Y.indices)
            and np.array_equal(X.data, Y.data))


@pytest.mark.parametrize("nside,n_blocks", [(16, 3), (64, 8)])
def test_blocked_matches_global_poisson3d(nside, n_blocks):
    A = poisson3d(nside)
    P_g, cf_g, _ = _global_once(A, PARAMS)
    P_b, cf_b = blocked_coarsen_once(A, PARAMS, n_blocks)
    assert np.array_equal(cf_g, cf_b)
    assert _csr_equal(P_g, P_b)


def test_blocked_pmis_alone_matches_native():
    """The distributed PMIS driver (per-round boundary exchange) equals
    the native single-host pmis_cf on an anisotropic 2-D problem."""
    from sparsh_amg_tpu.models.anisotropic import anisotropic2d
    A = anisotropic2d(48, epsilon=1e-3, angle_deg=30.0)
    mask, S = classical_strength(A, PARAMS.theta)
    cf_g = pmis_splitting(S)
    n = A.shape[0]
    bounds = block_bounds(n, 5)
    S_blocks = [S[int(bounds[b]):int(bounds[b + 1])] for b in range(5)]
    cf_b = blocked_pmis(S_blocks, bounds, n)
    assert np.array_equal(cf_g, cf_b)


def test_blocked_direct_interp():
    p = AMGParams(coarsening="pmis", interpolation="direct", interp_max=4)
    A = poisson2d(24)
    mask, S = classical_strength(A, p.theta)
    cf = pmis_splitting(S)
    from sparsh_amg_tpu.setup.interp import direct_interpolation
    P_g = truncate_rows(direct_interpolation(A, mask, cf), p.interp_max)
    P_b, cf_b = blocked_coarsen_once(A, p, 4)
    assert np.array_equal(cf, cf_b)
    assert _csr_equal(P_g, P_b)


def test_blocked_setup_to_distributed_handoff():
    """Per-host row-block setup feeds the DISTRIBUTED solver: the
    hierarchy whose finest level came from blocked setup solves under an
    8-way shard_map with the same iteration count as the fully-global
    distributed solve (SURVEY §3.2 setup -> MPI-boundary handoff)."""
    import jax
    from sparsh_amg_tpu.parallel.solver import DistAMGSolver, default_mesh
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    A = poisson3d(24)
    params = PARAMS
    kr = KrylovParams(method="cg", tol=1e-8)
    P, cf = blocked_coarsen_once(A, params, 8)
    R = csr_transpose(P)
    Ac = galerkin_product(A, P, R=R, drop_tol=params.rap_drop_tol)
    sub = amg_setup(Ac, params)
    hier_b = Hierarchy(
        levels=[Level(A=A.astype(np.float64), P=P, R=R, cf=cf)]
        + sub.levels, params=params)
    b = np.random.default_rng(11).standard_normal(A.shape[0])
    mesh = default_mesh(8)
    res_b = DistAMGSolver(A, mesh=mesh, params=params, krylov=kr,
                          hierarchy=hier_b).solve(b)
    res_g = DistAMGSolver(A, mesh=mesh, params=params, krylov=kr).solve(b)
    assert res_b.converged and res_g.converged
    assert abs(res_b.iterations - res_g.iterations) <= 1
    np.testing.assert_allclose(res_b.x, res_g.x, rtol=1e-6, atol=1e-8)


def test_blocked_hierarchy_convergence():
    """Hierarchy whose finest level came from the blocked setup converges
    in the same iteration count (+-1) as the global setup (VERDICT #7
    'matches within iterations +-1')."""
    from sparsh_amg_tpu.solve.solver import AMGSolver
    A = poisson3d(32)
    params = PARAMS
    kr = KrylovParams(method="cg", tol=1e-8)

    hier_g = amg_setup(A, params)

    P, cf = blocked_coarsen_once(A, params, 4)
    R = csr_transpose(P)
    Ac = galerkin_product(A, P, R=R, drop_tol=params.rap_drop_tol)
    sub = amg_setup(Ac, params)
    A0 = A.astype(np.float64)
    hier_b = Hierarchy(
        levels=[Level(A=A0, P=P, R=R, cf=cf)] + sub.levels, params=params)

    b = np.random.default_rng(3).standard_normal(A.shape[0])
    res_g = AMGSolver(A, params, kr, hierarchy=hier_g).solve(b)
    res_b = AMGSolver(A, params, kr, hierarchy=hier_b).solve(b)
    assert res_g.converged and res_b.converged
    assert abs(res_g.iterations - res_b.iterations) <= 1
