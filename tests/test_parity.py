"""Convergence-parity harness (SURVEY.md §4.3, VERDICT r1 next-round #3).

The named SuiteSparse matrices (thermal2, parabolic_fem, G3_circuit) are
unfetchable in this zero-egress environment, so per SURVEY §4.3 the parity
baseline is the first verified run of this implementation: the table below
pins expected iteration counts (±2) for every built-in problem family and
the committed ``.mtx`` fixtures, so convergence-quality regressions fail
loudly instead of hiding under ``maxiter``.

Pinned 2026-08-17 (round 2) on the CPU backend; the device while_loop and
host-chunk paths give identical counts up to chunk rounding.
"""
import json
import os

import numpy as np
import pytest

from sparsh_amg_tpu.models import (poisson2d, poisson3d, anisotropic2d,
                                   elasticity2d, convection2d)
from sparsh_amg_tpu.models.convection import convection3d as _convection3d
from sparsh_amg_tpu.models.anisotropic import anisotropic3d as _anisotropic3d
from sparsh_amg_tpu.models.elasticity import (
    elasticity2d_nullspace as _elas_ns, elasticity3d as _elas3d,
    elasticity3d_nullspace as _elas3d_ns)
from sparsh_amg_tpu.models.jump import jump2d as _jump2d
from sparsh_amg_tpu.params import AMGParams, KrylovParams
from sparsh_amg_tpu.solve.solver import AMGSolver

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

AGGRESSIVE = dict(coarsening="pmis", interpolation="extpi", interp_max=4,
                  rap_drop_tol=0.01, agg_levels=1)

# (name, builder, params, krylov, expected_iters)
PARITY_TABLE = [
    # re-pinned round 4: the chunk scheduler (probe + {1,2,4} ladder)
    # removed the host-mode overrun baked into the old 12 — the solve
    # now stops at the same count the device while_loop needs
    ("poisson2d_64_jacobi_V_cg", lambda: poisson2d(64),
     AMGParams(smoother="jacobi"), KrylovParams(), 9),
    ("poisson2d_64_cheby_V_cg", lambda: poisson2d(64),
     AMGParams(smoother="chebyshev"), KrylovParams(), 12),
    ("poisson3d_24_cheby_V_cg", lambda: poisson3d(24),
     AMGParams(smoother="chebyshev"), KrylovParams(), 12),
    ("poisson3d_24_aggressive", lambda: poisson3d(24),
     AMGParams(smoother="chebyshev", **AGGRESSIVE), KrylovParams(), 12),
    ("poisson3d_24_aggressive_pmis2", lambda: poisson3d(24),
     AMGParams(smoother="chebyshev", interp_max_composed=5,
               aggressive="pmis2", **AGGRESSIVE), KrylovParams(), 12),
    ("anisotropic2d_48_agg_W_bicgstab", lambda: anisotropic2d(48),
     AMGParams(coarsening="aggregation", interpolation="smoothed",
               cycle="W", smoother="chebyshev"),
     KrylovParams(method="bicgstab"), 20),
    ("convection2d_48_gs2_V_bicgstab", lambda: convection2d(48),
     AMGParams(smoother="gs2"), KrylovParams(method="bicgstab"), 12),
    # 3-D rotated anisotropy (round 4): eps_y=eps_z=1e-3, rotation in
    # the x-y plane; PMIS+ext+i + Chebyshev V, 13/16/19 at m=16/24/32
    ("anisotropic3d_24_pmis_extpi_V_cg",
     lambda: _anisotropic3d(24, eps_y=1e-3, eps_z=1e-3, angle_deg=45),
     AMGParams(coarsening="pmis", interpolation="extpi", interp_max=4,
               rap_drop_tol=0.01, smoother="chebyshev"),
     KrylovParams(maxiter=400), 16),
    # 3-D CDR (round 4): 7-point upwind, PMIS+ext+i with RAP filtering
    # keeps opC ~2.5 grid-independent (classical RS blew up to 9.3 at
    # m=24); 9/10/9 iters at m=16/24/32
    ("convection3d_24_pmis_extpi_V_bicgstab",
     lambda: _convection3d(24),
     AMGParams(smoother="gs2", coarsening="pmis", interpolation="extpi",
               interp_max=4, rap_drop_tol=0.01),
     KrylovParams(method="bicgstab"), 10),
    ("elasticity2d_24_agg_V_cg", lambda: elasticity2d(24),
     AMGParams(coarsening="aggregation", interpolation="smoothed",
               smoother="chebyshev", coarse_size=200),
     KrylovParams(maxiter=300), 44),
    # discontinuous-coefficient diffusion (classic AMG stressor; round 3):
    # harmonic-mean FD faces, log-uniform random blocks, contrast 1e4 —
    # grid-independent 14/14/15 at m=64/128/192 with PMIS+ext+i
    ("jump2d_64_random_1e4_V_cg",
     lambda: _jump2d(64, contrast=1e4, pattern="random"),
     AMGParams(smoother="chebyshev", coarsening="pmis",
               interpolation="extpi", interp_max=4),
     KrylovParams(maxiter=300), 14),
    # the flagship elasticity recipe (VERDICT r2 #8): rigid-body-mode SA
    # + node-amalgamated aggregation (agg_blocksize=2) + unfiltered P
    # smoothing — 17 iters / opC 1.32 vs 44 / 1.91 for nullspace-less SA
    ("elasticity2d_48_rbm_sa_V_cg",
     lambda: (elasticity2d(48), _elas_ns(48)),
     AMGParams(coarsening="aggregation", interpolation="smoothed",
               smoother="chebyshev", coarse_size=200, agg_blocksize=2,
               p_smooth_filter=False),
     KrylovParams(maxiter=300), 17),
    # 3-D hex elasticity (VERDICT r3 next #8): 81-entry rows, 6 rigid-body
    # modes through node-amalgamated aggregation (agg_blocksize=3) —
    # 13/13/14 iters at m=8/12/16, opC <= 1.52
    ("elasticity3d_12_rbm_sa_V_cg",
     lambda: (_elas3d(12), _elas3d_ns(12)),
     AMGParams(coarsening="aggregation", interpolation="smoothed",
               smoother="chebyshev", coarse_size=200, agg_blocksize=3,
               p_smooth_filter=False),
     KrylovParams(maxiter=300), 13),
]


@pytest.mark.parametrize(
    "name,builder,params,krylov,expected",
    PARITY_TABLE, ids=[c[0] for c in PARITY_TABLE])
def test_pinned_iteration_counts(name, builder, params, krylov, expected):
    out = builder()
    A, nullspace = out if isinstance(out, tuple) else (out, None)
    b = np.random.default_rng(17).standard_normal(A.shape[0])
    res = AMGSolver(A, params, krylov, nullspace=nullspace).solve(b)
    assert res.converged, f"{name}: did not converge ({res})"
    assert abs(res.iterations - expected) <= 2, (
        f"{name}: iterations {res.iterations} drifted from pinned "
        f"{expected} (±2) — convergence-quality regression")


# ---------------------------------------------------------------------------
# .mtx fixture ingestion through the CLI (BASELINE config[3] surface)
# ---------------------------------------------------------------------------

FIXTURE_EXPECT = {
    # fixture -> (cli extra args, expected iters)
    "poisson2d_32.mtx": ([], 11),
    "poisson3d_10.mtx": (["--smoother", "chebyshev"], 12),
    "anisotropic2d_24.mtx": (["--coarsening", "aggregation",
                              "--krylov", "bicgstab", "--cycle", "W"], 20),
    "elasticity2d_12.mtx": (["--coarsening", "aggregation",
                             "--smoother", "chebyshev",
                             "--coarse-size", "100",
                             "--maxiter", "300"], 27),
    "convection2d_24.mtx": (["--smoother", "gs2",
                             "--krylov", "bicgstab"], 12),
}


@pytest.mark.parametrize("fixture", sorted(FIXTURE_EXPECT))
def test_cli_mtx_ingestion(fixture, capsys):
    """End-to-end: CLI reads a committed MatrixMarket fixture, solves to
    1e-8, reports converged with the pinned iteration count."""
    from sparsh_amg_tpu.cli import run
    extra, expected = FIXTURE_EXPECT[fixture]
    out = run(["--problem", os.path.join(FIX, fixture),
               "--coarse-size", "64", "--json"] + extra)
    capsys.readouterr()
    assert out["converged"], f"{fixture}: {out}"
    assert out["relres"] <= 1e-8
    assert abs(out["iterations"] - expected) <= 2, (
        f"{fixture}: iterations {out['iterations']} vs pinned {expected}")


def test_cli_rhs_file(tmp_path, capsys):
    """--rhs reads MatrixMarket-array and plain-text vectors."""
    from sparsh_amg_tpu.cli import run
    mtx = os.path.join(FIX, "poisson2d_32.mtx")
    for rhs in ("poisson2d_32_rhs.mtx", "poisson2d_32_rhs.txt"):
        out = run(["--problem", mtx, "--rhs", os.path.join(FIX, rhs),
                   "--json"])
        capsys.readouterr()
        assert out["converged"]
    # wrong length is rejected
    bad = str(tmp_path / "bad.txt")
    np.savetxt(bad, np.ones(7))
    with pytest.raises(ValueError, match="does not match"):
        run(["--problem", mtx, "--rhs", bad, "--json"])


def test_matrix_io_roundtrip(tmp_path):
    from sparsh_amg_tpu.utils.io import (read_matrix, write_matrix,
                                         read_rhs, write_rhs)
    A = anisotropic2d(10)
    p = str(tmp_path / "a.mtx")
    write_matrix(p, A)
    B = read_matrix(p)
    assert (abs(A - B)).max() < 1e-14
    b = np.random.default_rng(0).standard_normal(A.shape[0])
    for ext in ("b.mtx", "b.txt"):
        q = str(tmp_path / ext)
        write_rhs(q, b)
        np.testing.assert_allclose(read_rhs(q, n=len(b)), b, atol=1e-12)
