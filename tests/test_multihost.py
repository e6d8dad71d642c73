"""Multi-process multi-host correctness (SURVEY.md §4.4: "multi-host logic
testable via `jax.distributed` multi-process on one machine").

The reference validates its MPI path by running `mpirun -np N` at small
rank counts; the TPU-native equivalent spawns N federated CPU processes
(jax.distributed + gloo collectives, real process boundaries) and requires
the distributed solve to match the single-process run over a mesh of the
same total device count: identical iteration count and the same answer.
"""
import numpy as np
import pytest

import jax

from sparsh_amg_tpu.models.poisson import poisson3d
from sparsh_amg_tpu.params import AMGParams, KrylovParams
from sparsh_amg_tpu.parallel.multihost import launch_processes
from sparsh_amg_tpu.parallel.solver import DistAMGSolver, default_mesh

N = 24   # 24^3 = 13,824 unknowns (fast; the 64^3 artifact run is
         # scripts/run_multiproc.py -> MULTIPROC_r3.json)


def _worker_params() -> AMGParams:
    # must mirror multihost._worker_main exactly
    return AMGParams(smoother="chebyshev", coarsening="pmis",
                     interpolation="extpi", interp_max=4,
                     rap_drop_tol=0.01, agg_levels=1,
                     interp_max_composed=5, intermediate_drop_tol=0.02,
                     aggressive="pmis2", band_dtype="bfloat16",
                     dense_size=2048, cheby_degree_coarse=1,
                     cheby_coarse_from=1)


@pytest.fixture(scope="module")
def single_process_reference():
    A = poisson3d(N)
    solver = DistAMGSolver(A, mesh=default_mesh(4), params=_worker_params(),
                           krylov=KrylovParams(tol=1e-8, maxiter=60))
    rng = np.random.default_rng(0)
    b = rng.standard_normal(A.shape[0])
    res = solver.solve(b)
    assert res.converged
    return res


def test_two_processes_match_single_process(single_process_reference):
    ref = single_process_reference
    results = launch_processes(2, n=N, devices_per_process=2)
    assert len(results) == 2
    for r in results:
        assert r["process_count"] == 2
        assert r["n_devices"] == 4
        assert r["n_local_devices"] == 2
        assert r["converged"]
        assert r["true_relres"] <= 1e-8
        # same program over the same 4-way partition: identical iteration
        # count; the answer agrees to solver tolerance (gloo vs XLA
        # reduction orders differ in the last bits)
        assert r["iterations"] == ref.iterations
        assert np.allclose(r["x_head"], ref.x[:8], rtol=1e-6, atol=1e-8)
        assert np.isclose(r["x_norm"], np.linalg.norm(ref.x), rtol=1e-8)
    # and the two processes agree with each other exactly
    assert results[0]["x_head"] == results[1]["x_head"]
    assert results[0]["iterations"] == results[1]["iterations"]


def test_four_processes_single_device_each(single_process_reference):
    ref = single_process_reference
    results = launch_processes(4, n=N, devices_per_process=1)
    for r in results:
        assert r["process_count"] == 4
        assert r["n_devices"] == 4
        assert r["converged"]
        assert r["true_relres"] <= 1e-8
        assert r["iterations"] == ref.iterations
        assert np.isclose(r["x_norm"], np.linalg.norm(ref.x), rtol=1e-8)
