#!/usr/bin/env python
"""Hardware sweep of the GELL transfer-kernel knobs (VERDICT r2 #4).

Times P0 and R0 of the 96^3 flagship hierarchy (and the full V-cycle)
under combinations of {comb TR, kq, part TR}, chained inside one
dispatch per measurement (kernel_bench methodology).  Prints one JSON
line per config; the winner becomes the packer default.
"""
import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARSH_NO_PALLAS_DIA", "1")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--reps", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_sparsh_amg")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from sparsh_amg_tpu.models.poisson import poisson3d
    from sparsh_amg_tpu.params import AMGParams
    from sparsh_amg_tpu.setup.hierarchy import amg_setup
    from sparsh_amg_tpu.ops.gell import csr_to_gell_auto, csr_to_gell, \
        GellMatrix, SplitGell

    params = AMGParams(smoother="chebyshev", coarsening="pmis",
                       interpolation="extpi", interp_max=4,
                       rap_drop_tol=0.01, agg_levels=1,
                       interp_max_composed=5, intermediate_drop_tol=0.02,
                       band_dtype="bfloat16", dense_size=8192,
                       cheby_degree_coarse=1, cheby_coarse_from=1,
                       aggressive="pmis2")
    A = poisson3d(args.n)
    hier = amg_setup(A, params)
    P0 = hier.levels[0].P.tocsr()
    R0 = hier.levels[0].R.tocsr()
    rng = np.random.default_rng(0)
    reps = args.reps

    def time_op(G):
        src = getattr(G, "src_pad")
        x0 = jnp.asarray(rng.standard_normal(src), dtype=jnp.float32)

        @jax.jit
        def chain(o, x, _n=G.n_pad):
            acc = jnp.zeros(_n, dtype=jnp.float32)
            for _ in range(reps):
                acc = acc + o.spmv(x)
                x = x * 1.0000001
            return acc

        chain(G, x0).block_until_ready()
        ts = []
        for i in range(3):
            xi = x0 * (1.0 + 1e-6 * (i + 1))
            t0 = time.perf_counter()
            float(jnp.sum(chain(G, xi)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / reps

    def shape_of(G):
        if isinstance(G, SplitGell):
            return {"part": shape_of(G.part), "comb": shape_of(G.comb)}
        return {"tiles": G.n_tiles, "tr": G.tr, "k": G.k, "s": G.s,
                "passes": int(np.asarray(G.counts).sum())}

    # --- R0 sweep: kq x comb TR --------------------------------------------
    for kq, ctr in itertools.product([24, 32, 48], [0, 32]):
        os.environ["SPARSH_GELL_COMB_TR"] = str(ctr)
        G = csr_to_gell_auto(R0, dtype=jnp.bfloat16, kq_force=kq)
        if G is None:
            continue
        dt = time_op(G)
        print(json.dumps({"op": "R0", "kq": kq, "comb_tr": ctr,
                          "per_op_ms": dt * 1e3, "shape": shape_of(G)}),
              flush=True)
    os.environ["SPARSH_GELL_COMB_TR"] = "0"

    # --- P0 sweep: part TR (plain GELL) ------------------------------------
    for tr in [None, 32, 128]:
        G = csr_to_gell(P0, dtype=jnp.bfloat16, tr_force=tr)
        if G is None:
            continue
        dt = time_op(G)
        print(json.dumps({"op": "P0", "tr_force": tr,
                          "per_op_ms": dt * 1e3, "shape": shape_of(G)}),
              flush=True)

    # --- P0 forced split+group (model said neutral; verify) ----------------
    import scipy.sparse as sp
    from sparsh_amg_tpu.ops import gell as gmod
    plan_orig = gmod._split_plan

    def forced_plan(Am, K, gap_max=gmod._GAP_MAX):
        seg_indptr, seg_row = gmod._segment_rows(Am, gap_max)
        seg_len = np.diff(seg_indptr)
        mean_len = float(seg_len[seg_len > 0].mean()) if len(seg_row) else 1.
        kq = min((8, 16, 24, 32), key=lambda q: abs(q - 2.0 * mean_len))
        return kq, seg_indptr, seg_row, True

    gmod._split_plan = forced_plan
    G = csr_to_gell_auto(P0, dtype=jnp.bfloat16)
    gmod._split_plan = plan_orig
    if isinstance(G, SplitGell):
        dt = time_op(G)
        print(json.dumps({"op": "P0_forced_split", "per_op_ms": dt * 1e3,
                          "shape": shape_of(G)}), flush=True)


if __name__ == "__main__":
    main()
