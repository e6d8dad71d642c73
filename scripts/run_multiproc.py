#!/usr/bin/env python
"""64^3 multi-process artifact run (VERDICT r2 'next' #1).

Runs the full distributed AMG-PCG solve across 2 federated CPU processes
(2 virtual devices each — jax.distributed + gloo, real process boundaries)
and the identical program single-process over a 4-device mesh, asserts
matching iteration counts and answers, and writes MULTIPROC_r3.json.

Usage: python scripts/run_multiproc.py [--n 64] [--procs 2]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

import numpy as np

from sparsh_amg_tpu.models.poisson import poisson3d
from sparsh_amg_tpu.params import AMGParams, KrylovParams
from sparsh_amg_tpu.parallel.multihost import launch_processes
from sparsh_amg_tpu.parallel.solver import DistAMGSolver, default_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "MULTIPROC_r3.json"))
    args = ap.parse_args()

    params = AMGParams(smoother="chebyshev", coarsening="pmis",
                       interpolation="extpi", interp_max=4,
                       rap_drop_tol=0.01, agg_levels=1,
                       interp_max_composed=5, intermediate_drop_tol=0.02,
                       aggressive="pmis2", band_dtype="bfloat16",
                       dense_size=2048, cheby_degree_coarse=1,
                       cheby_coarse_from=1)

    # single-process reference over the same total device count
    A = poisson3d(args.n)
    solver = DistAMGSolver(A, mesh=default_mesh(4), params=params,
                           krylov=KrylovParams(tol=1e-8, maxiter=60))
    rng = np.random.default_rng(0)
    b = rng.standard_normal(A.shape[0])
    t0 = time.perf_counter()
    ref = solver.solve(b)
    t_ref = time.perf_counter() - t0
    print(f"single-process (4 devices): iters={ref.iterations} "
          f"relres={ref.relres:.2e} solve={t_ref:.1f}s", flush=True)

    t0 = time.perf_counter()
    results = launch_processes(args.procs, n=args.n,
                               devices_per_process=4 // args.procs)
    t_mp = time.perf_counter() - t0

    ok = all(r["converged"] and r["iterations"] == ref.iterations
             and np.isclose(r["x_norm"], np.linalg.norm(ref.x), rtol=1e-8)
             for r in results)
    out = {
        "n": A.shape[0],
        "grid": args.n,
        "num_processes": args.procs,
        "devices_per_process": 4 // args.procs,
        "single_process": {"iterations": ref.iterations,
                           "relres": ref.relres,
                           "converged": bool(ref.converged),
                           "x_norm": float(np.linalg.norm(ref.x))},
        "multi_process": results,
        "iterations_match": ok,
        "wall_s_multiprocess": t_mp,
        "ok": ok,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("n", "num_processes", "iterations_match", "ok")}))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
