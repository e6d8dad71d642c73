#!/usr/bin/env python
"""Hardware validation of the 192^3 R0/P0 GELL packing candidates picked
by the CPU model sweep (VERDICT r2 #4): comb TR=32, kq=16, part TR=64
(over-SMEM, chunked).  Chained timing, one JSON line per config."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARSH_NO_PALLAS_DIA", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_sparsh_amg")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from sparsh_amg_tpu.models.poisson import poisson3d
    from sparsh_amg_tpu.params import AMGParams
    from sparsh_amg_tpu.setup.hierarchy import amg_setup
    from sparsh_amg_tpu.ops.gell import csr_to_gell_auto, csr_to_gell, \
        SplitGell

    params = AMGParams(smoother="chebyshev", cycle="V",
                       band_dtype="bfloat16", coarsening="pmis",
                       interpolation="extpi", interp_max=4,
                       rap_drop_tol=0.01, agg_levels=1,
                       interp_max_composed=5, intermediate_drop_tol=0.02,
                       aggressive="pmis2", dense_size=8192,
                       cheby_degree_coarse=1, cheby_coarse_from=1)
    A = poisson3d(192)
    hier = amg_setup(A, params)
    P0 = hier.levels[0].P.tocsr()
    R0 = hier.levels[0].R.tocsr()
    A1 = hier.levels[1].A.tocsr()
    rng = np.random.default_rng(0)
    reps = 30

    def time_op(G):
        x0 = jnp.asarray(rng.standard_normal(G.src_pad), dtype=jnp.float32)

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
                "passes": int(np.asarray(G.counts).sum()),
                "MB": round((G.packed.nbytes + G.vals.nbytes) / 1e6, 1)}

    def run(name, build):
        try:
            G = build()
        except Exception as e:
            print(json.dumps({"op": name, "error": f"{type(e).__name__}: {e}"}),
                  flush=True)
            return
        if G is None:
            print(json.dumps({"op": name, "error": "packer returned None"}),
                  flush=True)
            return
        try:
            dt = time_op(G)
        except Exception as e:
            print(json.dumps({"op": name, "shape": shape_of(G),
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            return
        print(json.dumps({"op": name, "per_op_ms": dt * 1e3,
                          "shape": shape_of(G)}), flush=True)

    def env(gs=0, ctr=0):
        os.environ["SPARSH_GELL_GROUP_SLOTS"] = str(gs)
        os.environ["SPARSH_GELL_COMB_TR"] = str(ctr)

    env()
    run("R0_auto", lambda: csr_to_gell_auto(R0, dtype=jnp.bfloat16))
    env(ctr=32)
    run("R0_kq16_ctr32",
        lambda: csr_to_gell_auto(R0, dtype=jnp.bfloat16, kq_force=16))
    run("R0_kq16_ctr32_ptr64",
        lambda: csr_to_gell_auto(R0, dtype=jnp.bfloat16, kq_force=16,
                                 tr_force=64))
    env()
    run("P0_tr128", lambda: csr_to_gell(P0, dtype=jnp.bfloat16))
    run("P0_tr64", lambda: csr_to_gell(P0, dtype=jnp.bfloat16, tr_force=64))
    run("A1_auto", lambda: csr_to_gell_auto(A1, dtype=jnp.bfloat16))


if __name__ == "__main__":
    main()
