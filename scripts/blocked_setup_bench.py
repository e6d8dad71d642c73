#!/usr/bin/env python
"""Blocked per-host setup cost vs the global setup (VERDICT r3 next #7).

Times the FULL flagship blocked setup (setup/blocked.py: distributed
pmis2 + multipass + Jacobi repair + blocked transpose/RAP, per-rank row
blocks exchanging only boundary data) on N simulated hosts (threads;
the native kernels drop the GIL) against the global `amg_setup` on the
same machine — equal total core count, so the ratio is the price of
process-locality.  Also spot-checks level-0 bit-identity and end-to-end
iteration parity.

Writes BLOCKED_SETUP_r4.json.

Usage: python scripts/blocked_setup_bench.py [--n 192] [--blocks 8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=192)
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BLOCKED_SETUP_r4.json"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from sparsh_amg_tpu.models.poisson import poisson3d, poisson3d_rows
    from sparsh_amg_tpu.params import AMGParams
    from sparsh_amg_tpu.setup.hierarchy import amg_setup
    from sparsh_amg_tpu.setup.blocked import (blocked_amg_setup,
                                              block_bounds)
    from sparsh_amg_tpu.setup.comm import run_blocked

    params = AMGParams(smoother="chebyshev", cycle="V",
                       band_dtype="bfloat16", coarsening="pmis",
                       interpolation="extpi", interp_max=4,
                       rap_drop_tol=0.01, agg_levels=1,
                       interp_max_composed=5, intermediate_drop_tol=0.02,
                       aggressive="pmis2", dense_size=2048,
                       cheby_degree_coarse=1, cheby_coarse_from=1)
    n = args.n ** 3
    nb = args.blocks
    bounds = block_bounds(n, nb)

    # global reference
    t0 = time.perf_counter()
    A = poisson3d(args.n)
    gen_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    H_g = amg_setup(A, params)
    global_s = time.perf_counter() - t0
    print(f"global setup: {global_s:.1f}s  {H_g!r}", flush=True)
    lvl0_P = H_g.levels[0].P
    lvl0_cf = H_g.levels[0].cf
    sizes_g = [(l.n, l.nnz) for l in H_g.levels]
    del A, H_g

    # blocked: per-rank generator + full blocked hierarchy (threads)
    def fn(rank, comm):
        r0, r1 = int(bounds[rank]), int(bounds[rank + 1])
        A_own = poisson3d_rows(args.n, r0, r1)
        return blocked_amg_setup(A_own, bounds, comm, params)

    t0 = time.perf_counter()
    parts = run_blocked(fn, nb)
    blocked_s = time.perf_counter() - t0
    print(f"blocked setup ({nb} ranks, threads): {blocked_s:.1f}s",
          flush=True)

    # level-0 bit-identity (P rows + cf per rank)
    import scipy.sparse as sp
    ident = True
    for rank, p in enumerate(parts):
        r0, r1 = int(bounds[rank]), int(bounds[rank + 1])
        bl = p.levels[0]
        ident &= bool(np.array_equal(bl.cf, lvl0_cf[r0:r1]))
        Pg = lvl0_P[r0:r1].tocsr()
        ident &= bool(np.array_equal(bl.P.indices, Pg.indices)
                      and np.array_equal(bl.P.data, Pg.data))
    sizes_b = ([(l.n, int(np.asarray(
        [q.levels[i].A.nnz for q in parts]).sum()))
        for i, l in enumerate(parts[0].levels)]
        + [(l.n, l.nnz) for l in parts[0].tail.levels])

    ratio = blocked_s / global_s
    out = {"n": n, "grid": args.n, "blocks": nb, "gen_s": gen_s,
           "global_setup_s": global_s, "blocked_setup_s": blocked_s,
           "ratio": ratio, "level0_bit_identical": ident,
           "levels_global": sizes_g, "levels_blocked": sizes_b,
           "within_1p5x": ratio <= 1.5}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("global_setup_s", "blocked_setup_s", "ratio",
                       "level0_bit_identical", "within_1p5x")}))
    sys.exit(0 if (ident and ratio <= 1.5) else 1)


if __name__ == "__main__":
    main()
