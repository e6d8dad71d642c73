#!/usr/bin/env python
"""Same-day A/B: device while_loop vs host-chunked unrolled solve.

VERDICT r2 weak #2: at 192^3 the measured solve (4.10 s / 12 iters =
342 ms/iter) is ~4x the kernel-composed bound (~68 ms/iter) because
`loop_mode="device"` runs the Krylov loop as a lax.while_loop whose body
the axon relay dispatches per-op, paying ~1.5 ms RPC per kernel.  The
host-chunked mode trace-time-unrolls `chunk` PCG iterations (each with a
full V-cycle) into ONE dispatch, amortizing the relay exactly like
kernel_bench.py's chained harness.  This script times both modes
same-day on the same hierarchy/device arrays and prints one JSON line
per mode; the winner becomes bench.py's default (VERDICT next #3).

Usage: python scripts/ab_solve.py [--n 192] [--chunks 12 16]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARSH_NO_PALLAS_DIA", "1")  # bench.py tunnel rule

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=192)
    ap.add_argument("--chunks", type=int, nargs="*", default=[12, 16])
    ap.add_argument("--tol", type=float, default=1e-8)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_sparsh_amg")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from sparsh_amg_tpu.models.poisson import poisson3d
    from sparsh_amg_tpu.params import AMGParams, KrylovParams
    from sparsh_amg_tpu.setup.hierarchy import amg_setup
    from sparsh_amg_tpu.solve.solver import AMGSolver

    # bench.py flagship config, verbatim
    params = AMGParams(smoother="chebyshev", cycle="V",
                       band_dtype="bfloat16", coarsening="pmis",
                       interpolation="extpi", interp_max=4,
                       rap_drop_tol=0.01, agg_levels=1,
                       interp_max_composed=5, intermediate_drop_tol=0.02,
                       aggressive="pmis2", dense_size=2048,
                       cheby_degree_coarse=1, cheby_coarse_from=1)
    n = args.n ** 3
    t0 = time.perf_counter()
    A = poisson3d(args.n)
    hier = amg_setup(A, params)
    print(json.dumps({"phase": "setup", "n": n,
                      "setup_s": time.perf_counter() - t0}), flush=True)
    t0 = time.perf_counter()
    solver = AMGSolver(A, params,
                       KrylovParams(method="cg", tol=args.tol,
                                    loop_mode="device"),
                       hierarchy=hier)
    print(json.dumps({"phase": "to_device",
                      "to_device_s": time.perf_counter() - t0}), flush=True)

    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)
    rhs = solver.prepare_rhs(b)            # device-resident rhs: the r3
                                           # headline convention (the 2x57MB
                                           # vector uploads stay out of
                                           # solve_s)

    def run(tag):
        tw = time.perf_counter()
        solver.warm()                      # compile every dispatched program
        solver.solve(rhs, tol=1e-2)        # prime the rho contraction estimate
        warm_s = time.perf_counter() - tw
        runs = [solver.solve(rhs) for _ in range(2)]
        r = runs[0]
        print(json.dumps({
            "mode": tag, "solve_s": min(x.solve_time for x in runs),
            "solve_s_all": [x.solve_time for x in runs],
            "warmup_s": warm_s, "iterations": r.iterations,
            "refine_passes": r.refine_passes,
            "converged": bool(r.converged), "relres": r.relres,
        }), flush=True)

    run("device")
    for c in args.chunks:
        solver.krylov = dataclasses.replace(
            solver.krylov, loop_mode="host", chunk=c)
        solver._build_jitted()
        run(f"host_chunk{c}")


if __name__ == "__main__":
    main()
