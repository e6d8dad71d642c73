"""Auxiliary subsystems: serialization roundtrip (SURVEY.md §5.4),
coarse-level fallback, host/device loop-mode agreement, aggregation on 3-D."""
import os
import numpy as np
import pytest

from sparsh_amg_tpu.models.poisson import poisson2d, poisson3d
from sparsh_amg_tpu.params import AMGParams, KrylovParams
from sparsh_amg_tpu.setup.hierarchy import amg_setup
from sparsh_amg_tpu.solve.solver import AMGSolver
from sparsh_amg_tpu.utils.serialize import save_hierarchy, load_hierarchy


def test_hierarchy_serialize_roundtrip(tmp_path):
    A = poisson2d(24)
    params = AMGParams(coarse_size=40, smoother="chebyshev")
    hier = amg_setup(A, params)
    path = str(tmp_path / "h.npz")
    save_hierarchy(path, hier)
    h2 = load_hierarchy(path)
    assert h2.params == params
    assert h2.n_levels == hier.n_levels
    for a, b_ in zip(hier.levels, h2.levels):
        assert (a.A != b_.A).nnz == 0
        if a.P is not None:
            assert (a.P != b_.P).nnz == 0

    # a solver built from the loaded hierarchy converges identically
    b = np.random.default_rng(0).standard_normal(A.shape[0])
    r1 = AMGSolver(A, params, hierarchy=hier).solve(b)
    r2 = AMGSolver(A, params, hierarchy=h2).solve(b)
    assert r1.converged and r2.converged
    np.testing.assert_allclose(r1.x, r2.x, rtol=1e-10)


def test_coarse_smooth_fallback():
    """Hierarchy stopped early (big coarsest, no dense inverse) still
    converges via the l1-Jacobi coarse fallback."""
    A = poisson2d(40)
    params = AMGParams(max_levels=2, coarse_inv_max=100,
                       smoother="chebyshev")
    b = np.random.default_rng(1).standard_normal(A.shape[0])
    s = AMGSolver(A, params, KrylovParams(tol=1e-8, maxiter=300))
    assert s.device.levels[-1].coarse_inv is None
    r = s.solve(b)
    assert r.converged
    assert np.linalg.norm(b - A @ r.x) / np.linalg.norm(b) <= 1e-8


def test_coarse_solver_options():
    """coarse_solver lu|cholesky|smooth are honored (VERDICT r1 #6)."""
    import jax.numpy as jnp
    A = poisson2d(24)
    b = np.random.default_rng(2).standard_normal(A.shape[0])
    for method in ("lu", "cholesky"):
        s = AMGSolver(A, AMGParams(coarse_size=60, coarse_solver=method))
        lev = s.device.levels[-1]
        assert lev.coarse_inv is not None
        # fp32 regardless of band_dtype (an 8-bit-mantissa inverse is a
        # weaker coarse anchor)
        assert lev.coarse_inv.dtype == jnp.float32
        r = s.solve(b)
        assert r.converged
    # cholesky must reject a non-SPD coarse operator
    import scipy.sparse as sp
    n = 80
    Aind = sp.diags(np.where(np.arange(n) % 2 == 0, 2.0, -2.0), 0).tocsr()
    with pytest.raises(np.linalg.LinAlgError):
        AMGSolver(Aind, AMGParams(coarse_size=100, coarse_solver="cholesky",
                                  reorder="none"))
    # smooth: no inverse is built; coarse_smooth_sweeps drives the fallback
    s = AMGSolver(A, AMGParams(coarse_size=60, coarse_solver="smooth",
                               coarse_smooth_sweeps=40),
                  KrylovParams(tol=1e-8, maxiter=300))
    assert s.device.levels[-1].coarse_inv is None
    assert s.device.levels[-1].coarse_sweeps == 40
    r = s.solve(b)
    assert r.converged


def test_coarse_inv_fp32_with_bf16_bands():
    """band_dtype=bfloat16 must not leak into the coarse inverse."""
    import jax.numpy as jnp
    A = poisson2d(24)
    s = AMGSolver(A, AMGParams(coarse_size=60, band_dtype="bfloat16"))
    assert s.device.levels[-1].coarse_inv.dtype == jnp.float32


def test_host_device_loop_modes_agree():
    A = poisson2d(32)
    b = np.random.default_rng(2).standard_normal(A.shape[0])
    params = AMGParams(coarse_size=40)
    rh = AMGSolver(A, params, KrylovParams(loop_mode="host")).solve(b)
    rd = AMGSolver(A, params, KrylovParams(loop_mode="device")).solve(b)
    assert rh.converged and rd.converged
    for r in (rh, rd):
        assert np.linalg.norm(b - A @ r.x) / np.linalg.norm(b) <= 1e-8
    # the chunk scheduler (per-chunk contraction re-estimation + the
    # {1,2,4} tail ladder) lands within +1 iteration of the while_loop
    # count per refinement pass (VERDICT r3 next #4)
    assert rh.iterations <= rd.iterations + rh.refine_passes


def test_host_chunk_scheduler_tight_and_auto_mode():
    """Host-chunked scheduling stays within +1 iteration per pass of the
    device while_loop on a COLD solver (no warm-start contraction
    estimate), at the flagship chunk size; loop_mode='auto' resolves."""
    from sparsh_amg_tpu.models.poisson import poisson3d
    A = poisson3d(20)
    b = np.random.default_rng(7).standard_normal(A.shape[0])
    params = AMGParams(smoother="chebyshev", coarsening="pmis",
                       interpolation="extpi", interp_max=4,
                       rap_drop_tol=0.01, agg_levels=1,
                       interp_max_composed=5, aggressive="pmis2",
                       coarse_size=400)
    rd = AMGSolver(A, params, KrylovParams(loop_mode="device")).solve(b)
    rh = AMGSolver(A, params, KrylovParams(loop_mode="host",
                                           chunk=12)).solve(b)
    assert rh.converged and rd.converged
    assert rh.iterations <= rd.iterations + rh.refine_passes, \
        (rh.iterations, rd.iterations, rh.history, rd.history)
    # auto resolves via the RTT probe (CPU backend: sub-ms -> device)
    ra = AMGSolver(A, params, KrylovParams(loop_mode="auto")).solve(b)
    assert ra.converged


def test_aggregation_poisson3d():
    """agg_theta default must mark 3-D Laplacian connections strong
    (theta=0.25 marks nothing: offdiag/diag = 1/6)."""
    A = poisson3d(16)
    b = np.random.default_rng(3).standard_normal(A.shape[0])
    params = AMGParams(coarsening="aggregation", interpolation="smoothed",
                       smoother="chebyshev")
    s = AMGSolver(A, params, KrylovParams(tol=1e-8))
    assert s.hierarchy.n_levels >= 2
    r = s.solve(b)
    assert r.converged and r.iterations < 40


def test_bicgstab_host_mode():
    A = poisson2d(24)
    b = np.random.default_rng(4).standard_normal(A.shape[0])
    params = AMGParams(coarse_size=40)
    r = AMGSolver(A, params, KrylovParams(method="bicgstab",
                                          loop_mode="host")).solve(b)
    assert r.converged
    assert np.linalg.norm(b - A @ r.x) / np.linalg.norm(b) <= 1e-8


def test_rcm_reorder_scrambled_poisson():
    """A randomly permuted Poisson matrix (bandwidth ~ n) is RCM-reordered
    back to banded form transparently; the returned x matches the original
    ordering (SURVEY.md §7 hard-part #2)."""
    import scipy.sparse as sp
    from sparsh_amg_tpu.setup.reorder import bandwidth
    A = poisson2d(24).tocsr()
    n = A.shape[0]
    rng = np.random.default_rng(5)
    p = rng.permutation(n)
    As = A[p][:, p].tocsr()
    assert bandwidth(As) > 0.5 * n
    b = rng.standard_normal(n)
    s = AMGSolver(As, AMGParams(smoother="chebyshev"),
                  KrylovParams(tol=1e-8))
    assert s.perm is not None
    from sparsh_amg_tpu.setup.reorder import bandwidth as bw2
    assert bw2(s.A_host) < 0.2 * n
    r = s.solve(b)
    assert r.converged
    assert np.linalg.norm(b - As @ r.x) / np.linalg.norm(b) <= 1e-8


def test_two_stage_gs_smoother():
    """gs2 (two-stage Gauss-Seidel, the hybrid-GS analogue) converges and
    beats plain Jacobi on iteration count."""
    A = poisson2d(32)
    b = np.random.default_rng(6).standard_normal(A.shape[0])
    r_gs = AMGSolver(A, AMGParams(smoother="gs2"),
                     KrylovParams(tol=1e-8)).solve(b)
    r_j = AMGSolver(A, AMGParams(smoother="jacobi"),
                    KrylovParams(tol=1e-8)).solve(b)
    assert r_gs.converged
    assert np.linalg.norm(b - A @ r_gs.x) / np.linalg.norm(b) <= 1e-8
    assert r_gs.iterations <= r_j.iterations


def test_two_stage_gs_dist():
    from sparsh_amg_tpu.parallel import DistAMGSolver
    A = poisson2d(24)
    b = np.random.default_rng(7).standard_normal(A.shape[0])
    r = DistAMGSolver(A, params=AMGParams(smoother="gs2", coarse_size=40),
                      krylov=KrylovParams(tol=1e-8)).solve(b)
    assert r.converged
    assert np.linalg.norm(b - A @ r.x) / np.linalg.norm(b) <= 1e-8


def test_iteration_logging(caplog):
    """utils.logging is wired into the host-mode loop (SURVEY.md §5.5):
    DEBUG level emits per-chunk iteration records and per-pass refine
    records; INFO (default) stays silent."""
    import logging
    A = poisson2d(24)
    b = np.random.default_rng(7).standard_normal(A.shape[0])
    s = AMGSolver(A, AMGParams(coarse_size=40),
                  KrylovParams(loop_mode="host"))
    with caplog.at_level(logging.DEBUG, logger="sparsh_amg_tpu"):
        s.solve(b)
    recs = [r for r in caplog.records if "relres" in r.getMessage()
            or "refine pass" in r.getMessage()]
    assert len(recs) >= 2
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="sparsh_amg_tpu"):
        s.solve(b)
    assert not [r for r in caplog.records if r.levelno <= logging.DEBUG]


def test_device_bytes_accounting():
    """device_bytes() counts every persistent device leaf and is the
    right order of magnitude for the hierarchy it describes."""
    from sparsh_amg_tpu.models.poisson import poisson3d
    from sparsh_amg_tpu.params import AMGParams
    from sparsh_amg_tpu.solve.solver import AMGSolver
    from sparsh_amg_tpu.utils.meminfo import (tree_device_bytes,
                                              device_memory_stats)
    A = poisson3d(12)
    solver = AMGSolver(A, AMGParams(smoother="chebyshev"))
    nb = solver.device_bytes()
    # at least the fine-level df64 hi bands (7 * 4 B * n rows, padded)
    assert nb >= 7 * 4 * A.shape[0]
    assert nb < 1 << 30  # and not absurd for a 1728-row problem
    assert nb == tree_device_bytes((solver.device, solver.A_df))
    # CPU backend: stats dict must be well-formed (possibly empty)
    stats = device_memory_stats()
    assert isinstance(stats, dict)
