"""BASELINE.json acceptance-config convergence tests (SURVEY.md §4.2):
scaled-down versions of the driver's configs, run on the CPU backend.
config[0] (2-D Poisson V+wJacobi PCG) and [1] (3-D + Chebyshev) live in
test_solver.py; here configs [2] (anisotropic, aggregation+W+BiCGStab) and
the elasticity family from the north star."""
import numpy as np

from sparsh_amg_tpu.models import anisotropic2d, elasticity2d
from sparsh_amg_tpu.params import AMGParams, KrylovParams
from sparsh_amg_tpu.solve.solver import AMGSolver


def _relres(A, x, b):
    return np.linalg.norm(b - A @ x) / np.linalg.norm(b)


def test_anisotropic_aggregation_wcycle_bicgstab():
    """config[2]: eps=1e-3 rotated anisotropic diffusion, aggregation
    coarsening, W-cycle + BiCGStab to 1e-8."""
    A = anisotropic2d(48, epsilon=1e-3, angle_deg=45).tocsr()
    b = np.random.default_rng(0).standard_normal(A.shape[0])
    p = AMGParams(coarsening="aggregation", interpolation="smoothed",
                  cycle="W", smoother="l1jacobi")
    s = AMGSolver(A, p, KrylovParams(method="bicgstab", tol=1e-8,
                                     maxiter=400))
    r = s.solve(b)
    assert r.converged
    assert _relres(A, r.x, b) <= 1e-8
    assert s.hierarchy.n_levels >= 2


def test_anisotropic_rs_pcg():
    A = anisotropic2d(48, epsilon=1e-3, angle_deg=45).tocsr()
    b = np.random.default_rng(1).standard_normal(A.shape[0])
    p = AMGParams(coarsening="rs", smoother="l1jacobi")
    r = AMGSolver(A, p, KrylovParams(tol=1e-8, maxiter=200)).solve(b)
    assert r.converged and _relres(A, r.x, b) <= 1e-8


def test_elasticity_rs_chebyshev():
    A = elasticity2d(16).tocsr()
    b = np.random.default_rng(2).standard_normal(A.shape[0])
    p = AMGParams(coarsening="rs", smoother="chebyshev")
    r = AMGSolver(A, p, KrylovParams(tol=1e-8, maxiter=300)).solve(b)
    assert r.converged and _relres(A, r.x, b) <= 1e-8


def test_grid_independent_iterations_2d():
    """The defining AMG property (SURVEY.md §4.2): iteration counts stay
    ~flat as n grows."""
    from sparsh_amg_tpu.models import poisson2d
    iters = []
    for nx in (24, 48, 96):
        A = poisson2d(nx)
        b = np.random.default_rng(3).standard_normal(A.shape[0])
        p = AMGParams(smoother="chebyshev")
        r = AMGSolver(A, p, KrylovParams(tol=1e-8)).solve(b)
        assert r.converged
        iters.append(r.iterations)
    assert max(iters) <= min(iters) + 8, iters


def test_convection_diffusion_bicgstab():
    """Nonsymmetric convection-diffusion (upwind): the BiCGStab target
    class the reference serves its FEM client for."""
    from sparsh_amg_tpu.models import convection2d
    A = convection2d(48, epsilon=1e-2).tocsr()
    # verify genuinely nonsymmetric
    assert abs(A - A.T).max() > 1e-8
    b = np.random.default_rng(5).standard_normal(A.shape[0])
    p = AMGParams(coarsening="rs", smoother="l1jacobi")
    r = AMGSolver(A, p, KrylovParams(method="bicgstab", tol=1e-8,
                                     maxiter=400)).solve(b)
    assert r.converged and _relres(A, r.x, b) <= 1e-8


def test_anisotropic_grid_independent_theta025():
    """Rotated anisotropy, agg_theta=0.25 (round 5): aggregates follow
    the characteristic and iterations stay flat — 21/22 at 96/192 here,
    22/22/21/25 measured at 256-1448^2 (the shipped 0.08 recipe grew
    80 -> 118 with n)."""
    iters = []
    for m in (96, 192):
        A = anisotropic2d(m, epsilon=1e-3, angle_deg=45).tocsr()
        b = np.random.default_rng(0).standard_normal(A.shape[0])
        p = AMGParams(coarsening="aggregation", interpolation="smoothed",
                      cycle="W", smoother="l1jacobi", agg_theta=0.25)
        r = AMGSolver(A, p, KrylovParams(method="bicgstab", tol=1e-8,
                                         maxiter=400)).solve(b)
        assert r.converged and _relres(A, r.x, b) <= 1e-8
        iters.append(r.iterations)
    assert max(iters) <= 28, iters
    assert iters[1] <= iters[0] + 4, iters
