#!/usr/bin/env python
"""Probe: fixed vs per-iteration cost of one chunked PCG dispatch at
192^3, and the Pallas-vs-XLA GELL share. Times _kr_chunk at k=1/3/12,
a trivial scalar readback (RTT floor), and repeats with
SPARSH_NO_PALLAS=1 when --xla is set (separate process run)."""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARSH_NO_PALLAS_DIA", "1")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=192)
    ap.add_argument("--xla", action="store_true",
                    help="disable ALL Pallas (XLA gather for GELL)")
    args = ap.parse_args()
    if args.xla:
        os.environ["SPARSH_NO_PALLAS"] = "1"

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_sparsh_amg")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from sparsh_amg_tpu.models.poisson import poisson3d
    from sparsh_amg_tpu.params import AMGParams, KrylovParams
    from sparsh_amg_tpu.setup.hierarchy import amg_setup
    from sparsh_amg_tpu.solve.solver import AMGSolver

    params = AMGParams(smoother="chebyshev", cycle="V",
                       band_dtype="bfloat16", coarsening="pmis",
                       interpolation="extpi", interp_max=4,
                       rap_drop_tol=0.01, agg_levels=1,
                       interp_max_composed=5, intermediate_drop_tol=0.02,
                       aggressive="pmis2", dense_size=8192,
                       cheby_degree_coarse=1, cheby_coarse_from=1)
    n = args.n ** 3
    A = poisson3d(args.n)
    hier = amg_setup(A, params)
    solver = AMGSolver(A, params,
                       KrylovParams(method="cg", tol=1e-8, loop_mode="host",
                                    chunk=12),
                       hierarchy=hier)
    levels = solver.device.levels
    Afine = solver.A_df.A_hi
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(solver.n_pad), dtype=jnp.float32)
    tag = "xla" if args.xla else "pallas_gell"

    # RTT floor: trivial jitted op + scalar readback
    f_triv = jax.jit(lambda v: jnp.sum(v) * 1.0000001)
    float(f_triv(b))
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(f_triv(b * (1.0 + 1e-6 * i)))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"probe": "rtt_floor", "mode": tag,
                      "ms": float(np.median(ts)) * 1e3}), flush=True)

    st0 = solver._kr_init(levels, Afine, b)
    jax.block_until_ready(st0[0])
    for k in (1, 3, 12):
        st = solver._kr_chunk(levels, Afine, b, st0, k=k)   # compile
        jax.block_until_ready(st[0])
        ts = []
        for i in range(3):
            bi = b * (1.0 + 1e-6 * (i + 1))
            sti = solver._kr_init(levels, Afine, bi)
            jax.block_until_ready(sti[0])
            t0 = time.perf_counter()
            sti = solver._kr_chunk(levels, Afine, bi, sti, k=k)
            _ = float(sti[5])                     # rr readback, forces sync
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        print(json.dumps({"probe": f"chunk_k{k}", "mode": tag,
                          "total_ms": dt * 1e3,
                          "per_iter_ms": dt * 1e3 / k}), flush=True)


if __name__ == "__main__":
    main()
